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
# And one in round 5 (docs/PERF.md round 5):
#   - take_rows_pallas: VMEM row-gather for the NMS candidate-logit fetch
#     (per-image (A, 4R) slab in VMEM, aligned 8-sublane windows + arithmetic
#     one-hot selects). Compiled and bit-matched on-chip after two Mosaic
#     workarounds (8-aligned dynamic sublane indices; no i1 relayouts), but
#     measured 18.41 vs 16.68 ms/batch e2e against the blocked one-hot gather
#     at bs=128/K=300 -- the serialized per-row VMEM loop loses to MXU-dense
#     contractions. Deleted by the flip rule.
