"""Pallas TPU kernels + device-side preprocessing.

1. Greedy-NMS suppression kernel: the sequential suppression loop runs entirely
   in VMEM inside one kernel (vs a K-step lax.scan in HLO), one grid program per
   image. Exact greedy semantics (torchvision order).
2. Device letterbox: bilinear resize expressed as two MXU matmuls (sparse
   interpolation matrices as trace-time constants) + pad + normalize, replacing
   the host cv2 path for same-shape batches (reference augment.py:612-700; the
   "fused letterbox" north star in BASELINE.json).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import is TPU/CPU-interpret safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


# ---------------- greedy NMS suppression kernel ----------------


def _nms_kernel_with_valid(iou_ref, valid_ref, keep_ref, *, k: int, iou_thres: float):
    """Greedy suppression with the keep mask as a loop-carried VPU vector.

    iou block (k, k); valid/keep blocks (1, k). Row i is fetched with a dynamic
    sublane slice; keep[i] is extracted with a masked max (no scalar VMEM reads,
    which Mosaic rejects inside fori_loop bodies).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep_vec):
        keep_i = jnp.max(jnp.where(col == i, keep_vec, 0.0))  # scalar via vector reduce
        row = iou_ref[pl.ds(i, 1), :]  # (1, k)
        suppress = (row > iou_thres) & (keep_i > 0) & (col > i)
        return jnp.where(suppress, 0.0, keep_vec)

    keep_ref[:, :] = jax.lax.fori_loop(0, k, body, valid_ref[:, :])


def greedy_nms_keep_pallas(iou: jnp.ndarray, valid: jnp.ndarray, iou_thres: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Exact greedy keep mask: (B,K,K) iou (score-sorted), (B,K) valid -> (B,K) f32."""
    b, k, _ = iou.shape
    kernel = functools.partial(_nms_kernel_with_valid, k=k, iou_thres=float(iou_thres))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(iou.astype(jnp.float32), valid.astype(jnp.float32).reshape(b, 1, k))
    return out[:, 0, :]


# ---------------- device letterbox (matmul bilinear resize) ----------------


def _interp_matrix(dst: int, src: int) -> np.ndarray:
    """cv2.INTER_LINEAR (half-pixel centers) row-interp matrix (dst, src)."""
    m = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        c = (i + 0.5) * scale - 0.5
        lo = int(np.floor(c))
        w_hi = c - lo
        lo_c = min(max(lo, 0), src - 1)
        hi_c = min(max(lo + 1, 0), src - 1)
        m[i, lo_c] += 1.0 - w_hi
        m[i, hi_c] += w_hi
    return m


@functools.partial(jax.jit, static_argnames=("imgsz", "out_dtype_name"))
def device_letterbox(images: jnp.ndarray, imgsz: int = 640, out_dtype_name: str = "float32") -> jnp.ndarray:
    """Batched letterbox fully on device for same-shape inputs.

    images: (B, H0, W0, 3) uint8 RGB. Returns (B, imgsz, imgsz, 3) in [0, 1] with
    exact reference geometry: r = min(S/H0, S/W0), round() new size, centered
    round(d-0.1)/round(d+0.1) padding, 114-gray fill.
    The resize runs as two dense matmuls on the MXU (interpolation matrices are
    trace-time constants); pad + /255 fuse into the same kernels under XLA.
    """
    out_dtype = jnp.dtype(out_dtype_name)
    b, h0, w0, c = images.shape
    r = min(imgsz / h0, imgsz / w0)
    new_w, new_h = int(round(w0 * r)), int(round(h0 * r))
    dw, dh = (imgsz - new_w) / 2, (imgsz - new_h) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    bottom, right = imgsz - new_h - top, imgsz - new_w - left

    x = images.astype(jnp.float32)
    if (new_h, new_w) != (h0, w0):
        ry = jnp.asarray(_interp_matrix(new_h, h0))  # (new_h, h0)
        rx = jnp.asarray(_interp_matrix(new_w, w0))  # (new_w, w0)
        x = jnp.einsum("yh,bhwc->bywc", ry, x, preferred_element_type=jnp.float32)
        x = jnp.einsum("xw,bywc->byxc", rx, x, preferred_element_type=jnp.float32)
    x = jnp.pad(x, [(0, 0), (top, bottom), (left, right), (0, 0)], constant_values=114.0)
    return (x / 255.0).astype(out_dtype)


# ---------------- VMEM row gather (candidate-logit fetch) ----------------


def _row_gather_kernel(idx_ref, x_ref, o_ref, *, k: int, c: int):
    """Per-image row gather with the whole (A, C) slab resident in VMEM.

    idx_ref: (B, K) int32 in SMEM (scalar-prefetched); x block (1, A, C);
    o block (1, K, C), K a multiple of 8. Mosaic requires dynamic sublane
    indices to be provably 8-aligned (the naive one-row dynamic copy fails
    with "cannot statically prove that index in dimension 1 is a multiple of
    8"), so each gathered row is fetched as an ALIGNED 8-sublane window at
    (i//8)*8 and selected with a one-hot compare-sum; output rows are built in
    registers 8 at a time and stored as one aligned (8, C) write at j = 8*g.
    All VMEM-local — no HBM latency per row, no one-hot operand traffic.
    """
    b = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, c), 0)  # sublane ids 0..7

    def group(g, carry):
        acc = jnp.zeros((8, c), x_ref.dtype)
        for r in range(8):  # unrolled: r static
            i = idx_ref[b, g * 8 + r]
            base = (i // 8) * 8
            win = x_ref[0, pl.ds(base, 8), :]  # aligned (8, C) window
            row = jnp.sum(jnp.where(lane == (i - base), win, 0), axis=0)  # (C,)
            acc = acc + jnp.where(lane == r, row[None, :], 0)
        o_ref[0, pl.ds(g * 8, 8), :] = acc
        return carry

    jax.lax.fori_loop(0, k // 8, group, 0)


def take_rows_pallas(x: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x (B, A, C) x idx (B, K) int -> (B, K, C), == take_along_axis row gather.

    r5 candidate for the decode-stage gather (GATHER_MODE="pallas"): the
    select→decode delta measured +2.68 ms/batch at bs=128 K=300
    (docs/r5_queue1_results.log) against a ~0.3 ms traffic bound; the blocked
    one-hot form pays two extra MXU/HBM passes over (K, A/block) operands,
    while this kernel streams each image's (A, C) slab into VMEM once (the
    pipelined BlockSpec DMA) and gathers rows VMEM-locally.
    """
    B, A, C = x.shape
    K = idx.shape[1]
    Kp = -(-K // 8) * 8  # Mosaic: 8-aligned output groups
    pad_a = 0
    if A % 8:
        pad_a = 8 - A % 8  # aligned 8-row windows may read past A
        x = jnp.pad(x, [(0, 0), (0, pad_a), (0, 0)])
    idx_p = idx.astype(jnp.int32)
    if Kp != K:
        idx_p = jnp.pad(idx_p, [(0, 0), (0, Kp - K)])
    # interpret mode off-TPU so CPU tests (and the virtual-device mesh) run
    # the same code path bit-identically
    interpret = interpret or jax.devices()[0].platform != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, A + pad_a, C), lambda b, idx_ref: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, Kp, C), lambda b, idx_ref: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_row_gather_kernel, k=Kp, c=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kp, C), x.dtype),
        interpret=interpret,
    )(idx_p, x)
    return out[:, :K]


# NOTE: three kernel families were removed after measured losses on v5e
# (flip-or-delete, docs/PERF.md round 4 + docs/r4_queue1_results.log):
#   - device_letterbox_s2d/_s4d: space-to-depth letterbox variants feeding the
#     folded k2s1 stems (s2d 0.90x / s4d 0.92x of the default e2e).
#   - decode_select_pallas: fused DFL-decode + per-anchor class select
#     (VPU-pass-bound; slower than XLA's own fused reductions).
#   - fused_stem_s4d_pallas: both stem convs in one kernel, intermediate in
#     VMEM (im2col-concat variant: Mosaic rejects the lane concat of 48-lane
#     -padded vregs; sum-of-taps variant: compiles with a 96 MiB scoped-vmem
#     grant but runs 13.7 vs 2.7 ms/batch -- the 48/64-wide contractions waste
#     ~2/3 of each 128-lane MXU pass, and 4 taps double the passes).
