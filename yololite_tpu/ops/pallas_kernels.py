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
from typing import Optional, Tuple

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


@functools.partial(jax.jit, static_argnames=("imgsz", "out_dtype_name"))
def device_letterbox_s2d(images: jnp.ndarray, imgsz: int = 640,
                         out_dtype_name: str = "float32") -> jnp.ndarray:
    """Device letterbox emitting the 2x2 space-to-depth layout directly.

    images: (B, H0, W0, 3) uint8 RGB -> (B, imgsz/2, imgsz/2, 12) with channel
    layout c_out = (dy*2+dx)*3 + c, i.e.
        out[b, i, j, (dy*2+dx)*3+c] == device_letterbox(images)[b, 2i+dy, 2j+dx, c]
    bit-for-bit: each output element is the same interpolation dot product —
    the row/col interpolation matrices are sliced dy::2 / dx::2 instead of the
    output being reshuffled afterwards (no gathers; round-1 dead end #1).
    Padding and the 114 fill fold into the matrices (zero rows in the pad band
    plus an additive outside-mask), so the geometry is exactly the reference
    LetterBox (augment.py:612-700) at half spatial resolution x4 channels.

    Feeds the folded k2s1 stem (modules.fold_stem_s2d): the (S, S, 3) layout is
    the forward's worst tiling case, and this keeps it from ever existing.
    """
    out_dtype = jnp.dtype(out_dtype_name)
    b, h0, w0, c = images.shape
    if imgsz % 2:
        raise ValueError(f"s2d letterbox needs an even imgsz, got {imgsz}")
    r = min(imgsz / h0, imgsz / w0)
    new_w, new_h = int(round(w0 * r)), int(round(h0 * r))
    dw, dh = (imgsz - new_w) / 2, (imgsz - new_h) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))

    if (h0, w0) == (imgsz, imgsz):  # identity (no resize, no pad): relayout copy
        # beats running identity matmuls (~2 HBM-roundtrip matmul passes); the
        # round-1 "gather" dead end was strided SLICES -- this is one
        # reshape/transpose relayout XLA lowers as a copy
        x = images.astype(jnp.float32)
        h = imgsz // 2
        x = x.reshape(b, h, 2, h, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h, h, 4 * c)
        return (x / 255.0).astype(out_dtype)

    py = np.zeros((imgsz, h0), np.float32)
    py[top:top + new_h] = _interp_matrix(new_h, h0)
    px = np.zeros((imgsz, w0), np.float32)
    px[left:left + new_w] = _interp_matrix(new_w, w0)
    my = np.zeros(imgsz, np.float32)
    my[top:top + new_h] = 1.0
    mx = np.zeros(imgsz, np.float32)
    mx[left:left + new_w] = 1.0

    x = images.astype(jnp.float32)
    t = [jnp.einsum("yh,bhwc->bywc", jnp.asarray(py[dy::2]), x,
                    preferred_element_type=jnp.float32) for dy in (0, 1)]
    blocks = []
    for dy in (0, 1):
        for dx in (0, 1):
            blk = jnp.einsum("xw,bywc->byxc", jnp.asarray(px[dx::2]), t[dy],
                             preferred_element_type=jnp.float32)
            fill = 114.0 * (1.0 - np.outer(my[dy::2], mx[dx::2]))  # (S/2, S/2)
            blocks.append(blk + jnp.asarray(fill)[None, :, :, None])
    out = jnp.concatenate(blocks, axis=-1)
    return (out / 255.0).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("imgsz", "out_dtype_name"))
def device_letterbox_s4d(images: jnp.ndarray, imgsz: int = 640,
                         out_dtype_name: str = "float32") -> jnp.ndarray:
    """Device letterbox emitting the 4x4 space-to-depth layout (s2d of s2d).

    images: (B, H0, W0, 3) uint8 RGB -> (B, imgsz/4, imgsz/4, 48) with channel
    layout c_out = ((dy2*2+dx2)*4 + (dy1*2+dx1))*3 + c holding letterboxed
    pixel (4i + 2*dy2 + dy1, 4j + 2*dx2 + dx1) — i.e. exactly the 2x2 s2d of
    device_letterbox_s2d's output, the input layout of modules.fold_stem_s4d.
    Same construction as the s2d variant: interpolation matrices sliced r::4,
    pad + 114 fill folded in; identity case is one relayout reshape.
    """
    out_dtype = jnp.dtype(out_dtype_name)
    b, h0, w0, c = images.shape
    if imgsz % 4:
        raise ValueError(f"s4d letterbox needs imgsz % 4 == 0, got {imgsz}")
    r = min(imgsz / h0, imgsz / w0)
    new_w, new_h = int(round(w0 * r)), int(round(h0 * r))
    dw, dh = (imgsz - new_w) / 2, (imgsz - new_h) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    q = imgsz // 4

    # channel order: blocks iterate (dy2, dx2) major then (dy1, dx1); the row
    # offset within the 4x4 tile is ry = 2*dy2 + dy1, so the r::4 slice for
    # block position (dy2, dy1) starts at row 2*dy2 + dy1
    if (h0, w0) == (imgsz, imgsz):  # identity: relayout copy
        x = images.astype(jnp.float32)
        x = x.reshape(b, q, 2, 2, q, 2, 2, c)  # (b, i, dy2, dy1, j, dx2, dx1, c)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, q, q, 16 * c)
        return (x / 255.0).astype(out_dtype)

    py = np.zeros((imgsz, h0), np.float32)
    py[top:top + new_h] = _interp_matrix(new_h, h0)
    px = np.zeros((imgsz, w0), np.float32)
    px[left:left + new_w] = _interp_matrix(new_w, w0)
    my = np.zeros(imgsz, np.float32)
    my[top:top + new_h] = 1.0
    mx = np.zeros(imgsz, np.float32)
    mx[left:left + new_w] = 1.0

    x = images.astype(jnp.float32)
    t = {}
    for dy2 in (0, 1):
        for dy1 in (0, 1):
            ry = 2 * dy2 + dy1
            t[ry] = jnp.einsum("yh,bhwc->bywc", jnp.asarray(py[ry::4]), x,
                               preferred_element_type=jnp.float32)
    blocks = []
    for dy2 in (0, 1):
        for dx2 in (0, 1):
            for dy1 in (0, 1):
                for dx1 in (0, 1):
                    ry, rx = 2 * dy2 + dy1, 2 * dx2 + dx1
                    blk = jnp.einsum("xw,bywc->byxc", jnp.asarray(px[rx::4]), t[ry],
                                     preferred_element_type=jnp.float32)
                    fill = 114.0 * (1.0 - np.outer(my[ry::4], mx[rx::4]))
                    blocks.append(blk + jnp.asarray(fill)[None, :, :, None])
    out = jnp.concatenate(blocks, axis=-1)
    return (out / 255.0).astype(out_dtype)


# ---------------- fused decode + candidate-select kernel ----------------


def _decode_level_kernel(x_ref, sel_ref, out_ref, *, W, stride, nc, reg_max, conf_thres, rows):
    """One pass over a (rows, 4*reg_max+nc) slab of a flattened Detect level map.

    Computes, per anchor row: DFL softmax-expectation -> ltrb -> xyxy pixels
    (dist2bbox around the static anchor grid), sigmoid'ed class confidence
    (max over classes, gated at conf_thres -> -1 sentinel) and argmax class.

    Output is one component-major (8, rows) block -- rows x1,y1,x2,y2,cls,conf
    plus two zero pads so the sublane dim meets the 8-divisibility tiling rule;
    every write stays lane-major (no in-kernel transposes).

    All reductions are full-width with constant lane masks (no lane slicing,
    which Mosaic lowers poorly): lanes [0, 4*reg_max) are the DFL logits in four
    reg_max-wide segments, lanes [4*reg_max, 4*reg_max+nc) the class logits.
    """
    C = 4 * reg_max + nc
    x = x_ref[0]  # (rows, C) -- compute follows the input dtype (bf16 on the half path)
    ct = x.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, C), 1)
    neg = jnp.asarray(-1e30 if ct == jnp.float32 else -3e38, ct)

    # ---- DFL expectation over four reg_max-wide segments ----
    # All four (num, den) pairs come from ONE MXU matmul with a constant (C, 8)
    # selector: columns 2k / 2k+1 hold segment-k's {bin-index, one} masks. This
    # replaces eight full-width masked VPU reductions (the first kernel draft was
    # VPU-pass-bound at ~0.9 ms per (rows, C) f32 pass).
    is_box = lane < 4 * reg_max
    xm = jnp.where(is_box, x, neg)
    m = jnp.max(xm, axis=1, keepdims=True)  # global row max: cancels per-segment
    e = jnp.where(is_box, jnp.exp(x - m), jnp.asarray(0.0, ct))
    nd = jnp.dot(e, sel_ref[:].astype(ct), preferred_element_type=jnp.float32)  # (rows, 8)
    # eps guard: the global-row-max trick can underflow a whole segment to 0
    # (logit spread > ~88 in f32); 0/eps -> 0 instead of 0/0 -> NaN
    dist = [nd[:, 2 * k] / jnp.maximum(nd[:, 2 * k + 1], 1e-30) for k in range(4)]

    # ---- class confidence ----
    is_cls = (lane >= 4 * reg_max) & (lane < C)
    # f32 for the argmax compare: Mosaic rejects the bf16 broadcast-eq with an
    # "Invalid relayout" on the i1 mask; f32 compiles (and exactly matches
    # jnp.argmax on bf16 inputs, since the cast is monotone and injective)
    xc = jnp.where(is_cls, x, neg).astype(jnp.float32)
    cm2 = jnp.max(xc, axis=1, keepdims=True)  # (rows, 1)
    # first-max index, matching jnp.argmax tie-breaking
    ci = jnp.min(jnp.where(xc == cm2, lane - 4 * reg_max, jnp.int32(1 << 30)), axis=1)
    conf = jax.nn.sigmoid(cm2[:, 0])
    conf = jnp.where(conf > conf_thres, conf, -1.0)

    # ---- anchors (grid position = block offset + lane index) ----
    p = pl.program_id(1) * rows + jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)[0]
    ax = (p % W).astype(jnp.float32) + 0.5
    ay = (p // W).astype(jnp.float32) + 0.5
    s = jnp.float32(stride)
    zero = jnp.zeros((rows,), jnp.float32)
    out_ref[0] = jnp.stack(
        [(ax - dist[0]) * s, (ay - dist[1]) * s, (ax + dist[2]) * s, (ay + dist[3]) * s,
         ci.astype(jnp.float32), conf, zero, zero],
        axis=0,
    )


def decode_select_pallas(feats, strides, nc: int, reg_max: int = 16, conf_thres: float = 0.25,
                         interpret: bool = False):
    """Fused decode + per-anchor class selection over all Detect levels.

    feats: per-level (B, H, W, 4*reg_max+nc) raw maps (any float dtype).
    Returns boxes (B, A, 4) f32 xyxy pixels, gated conf (B, A) f32 (-1 below
    threshold), cls (B, A) f32 -- ready for top-k + NMS. One HBM pass per level
    (vs decode's separate DFL/sigmoid/max passes); measured ~2x on the
    decode+selection stage at bs=128 (docs/PERF.md).
    """
    if not interpret:
        interpret = jax.default_backend() == "cpu"  # no Mosaic on host: interpret
    B = feats[0].shape[0]
    outs = []
    for f, stride in zip(feats, strides):
        _, H, W, C = f.shape
        assert C == 4 * reg_max + nc, (C, reg_max, nc)
        hw = H * W
        # block rows: the output lane dim must be 128-divisible or the full hw.
        # 1280-row blocks keep the kernel's f32 temporaries well under the 16 MB
        # scoped-VMEM limit on the big P3 level; smaller levels go in whole.
        rows = 1280 if hw % 1280 == 0 else hw
        x = f.reshape(B, hw, C)
        # constant (C, 8) DFL segment selector: columns 2k / 2k+1 = segment-k's
        # {bin-index, one} masks (see kernel docstring)
        sel = np.zeros((C, 8), np.float32)
        for k in range(4):
            sel[k * reg_max:(k + 1) * reg_max, 2 * k] = np.arange(reg_max)
            sel[k * reg_max:(k + 1) * reg_max, 2 * k + 1] = 1.0
        kern = functools.partial(_decode_level_kernel, W=W, stride=int(stride), nc=nc,
                                 reg_max=reg_max, conf_thres=float(conf_thres), rows=rows)
        out = pl.pallas_call(
            kern,
            grid=(B, hw // rows),
            in_specs=[
                pl.BlockSpec((1, rows, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, rows), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, hw), jnp.float32),
            interpret=interpret,
        )(x, jnp.asarray(sel))
        outs.append(out)
    out = jnp.concatenate(outs, axis=2)  # (B, 8, A) component-major
    boxes = jnp.swapaxes(out[:, :4], 1, 2)  # (B, A, 4)
    cls = out[:, 4]
    conf = out[:, 5]
    return boxes, conf, cls


# ---------------- fused s4d stem kernel (conv0' + SiLU + conv1' in VMEM) ----------------


def _fused_stem_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, z_ref, *, th: int, w4: int,
                       wa: int, wb: int, sumtap: bool = False):
    """One row-band of the fused stem: two k2s1 convs with the intermediate in VMEM.

    x block: (1, H4+2, Wa+1, C0) zero-padded top/left by 2 and right-padded to
    the aligned tap width (revisited across bands -- index_map pins it per
    batch element). z block: (1, th, w4, C2). Both convs are expressed as
    4-tap im2col concats -> one matmul each, so the contraction widths are
    4*C0 / 4*C1 (192 / 256 at n-scale) and every access is contiguous (no
    stride-2 anywhere -- the round-1 strided-s2d dead end).

    Tap widths wa/wb are 16-multiples (wa = align16(w4)+16 >= w4+1+1,
    wb = align16(w4) >= w4): the (rows, cols, chan) -> (rows*cols, chan)
    collapse before each matmul is then physically layout-preserving for
    Mosaic's sublane tiling in every dtype. Columns past the valid range carry
    finite garbage that the final [:, :w4] store slice drops.

    Semantics note: conv1's zero padding applies to conv0's OUTPUT, so the
    y-halo entries at global row/col -1 are zeroed explicitly (computing them
    from the zero-padded x would give act(b0) != 0).

    sumtap=True replaces each im2col concat+matmul with a SUM of four
    tap-matmuls (tap_k @ w[k]): identical math (the concat contraction is block
    -diagonal-free, so splitting the contraction is exact in fp32 accumulation
    up to addition order), but no lane-dim `tpu.concatenate` — the op Mosaic
    rejected on 48-lane-padded vregs (docs/PERF.md round-3 recovery table).
    Costs ~2x MXU passes on the padded 48/64-wide contractions; the stem is
    HBM-bound, so that trade is measured, not assumed (tools/fusedstem_probe).
    """
    i = pl.program_id(1)
    xs = x_ref[0, pl.ds(i * th, th + 2), :, :]  # (th+2, Wa+1, C0)
    c0 = xs.shape[-1]

    # conv0': y[a, b] for band rows a in [0, th], cols b in [0, wa)
    #   global y row j = i*th - 1 + a, col c = b - 1 (valid through b = w4)
    t00 = xs[0:th + 1, 0:wa, :]
    t01 = xs[0:th + 1, 1:wa + 1, :]
    t10 = xs[1:th + 2, 0:wa, :]
    t11 = xs[1:th + 2, 1:wa + 1, :]
    if sumtap:
        y = sum(
            jnp.dot(t.reshape(-1, c0), w0_ref[k * c0:(k + 1) * c0, :],
                    preferred_element_type=jnp.float32)
            for k, t in enumerate((t00, t01, t10, t11)))
    else:
        x4 = jnp.concatenate([t00, t01, t10, t11], axis=-1)  # (th+1, Wa, 4*C0)
        c4 = x4.shape[-1]
        y = jnp.dot(x4.reshape(-1, c4), w0_ref[:, :], preferred_element_type=jnp.float32)
    y = y.reshape(th + 1, wa, -1) + b0_ref[0, :]
    y = y * jax.nn.sigmoid(y)  # SiLU
    # zero the conv1 padding: col b=0 is global col -1 (always); row a=0 is
    # global row -1 only in band 0
    rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    y = jnp.where((cols == 0) | ((rows == 0) & (i == 0)), 0.0, y)
    y = y.astype(xs.dtype)

    # conv1': z[zr, c] = act(b1 + sum taps y[zr+dy, c+dx]), valid c < w4
    u00 = y[0:th, 0:wb, :]
    u01 = y[0:th, 1:wb + 1, :]
    u10 = y[1:th + 1, 0:wb, :]
    u11 = y[1:th + 1, 1:wb + 1, :]
    cy = y.shape[-1]
    if sumtap:
        z = sum(
            jnp.dot(u.reshape(-1, cy), w1_ref[k * cy:(k + 1) * cy, :],
                    preferred_element_type=jnp.float32)
            for k, u in enumerate((u00, u01, u10, u11)))
    else:
        y4 = jnp.concatenate([u00, u01, u10, u11], axis=-1)  # (th, wb, 4*C1)
        c1 = y4.shape[-1]
        z = jnp.dot(y4.reshape(-1, c1), w1_ref[:, :], preferred_element_type=jnp.float32)
    z = z.reshape(th, wb, -1) + b1_ref[0, :]
    z = z * jax.nn.sigmoid(z)
    z_ref[0, :, :, :] = z[:, :w4, :].astype(z_ref.dtype)


def fused_stem_s4d_pallas(x_s4d: jnp.ndarray, w0: jnp.ndarray, b0: jnp.ndarray,
                          w1: jnp.ndarray, b1: jnp.ndarray, th: int = 40,
                          interpret: Optional[bool] = None,
                          sumtap: bool = False) -> jnp.ndarray:
    """Fused stem on the 4x4 space-to-depth layout: both k3s2 stem convs as one
    Pallas kernel, the conv0 output staying in VMEM (XLA never fuses two convs;
    the L0 output write+read is ~838 MB/batch at bs=128 -- docs/PERF.md round-3
    notes). SiLU activations are baked in (the reference stem is Conv+BN+SiLU,
    conv.py:35-53; BN must already be folded).

    x_s4d: (B, H4, W4, 16*C) from device_letterbox_s4d (H4 = S/4).
    w0/b0: fold_stem_s4d weights (2, 2, 16*C, 4*c1) + tiled bias (4*c1,).
    w1/b1: fold_stem_s2d weights (2, 2, 4*c1, c2) + bias (c2,).
    Returns (B, H4, W4, c2) == layer1 output in its natural NHWC layout.
    """
    B, H4, W4, C0 = x_s4d.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # no Mosaic on host
    th = min(th, H4)
    while H4 % th:
        th -= 1  # largest divisor of H4 <= requested (640px -> H4=160 -> th=40)
    nb = H4 // th
    co0, c2 = w0.shape[-1], w1.shape[-1]
    dt = x_s4d.dtype
    # aligned im2col tap widths (see kernel docstring): wb covers the conv1
    # taps, wa = wb + 16 covers the one-wider conv0 taps plus their +1 shift
    wb = -(-W4 // 16) * 16
    wa = wb + 16
    # im2col weight concat, tap order (dy,dx) = 00,01,10,11
    w0c = jnp.concatenate([w0[0, 0], w0[0, 1], w0[1, 0], w0[1, 1]], axis=0).astype(dt)
    w1c = jnp.concatenate([w1[0, 0], w1[0, 1], w1[1, 0], w1[1, 1]], axis=0).astype(dt)
    # top/left halo of 2 for the two convs; right slack out to the tap width
    xp = jnp.pad(x_s4d, ((0, 0), (2, 0), (2, wa + 1 - (W4 + 2)), (0, 0)))

    kernel = functools.partial(_fused_stem_kernel, th=th, w4=W4, wa=wa, wb=wb, sumtap=sumtap)
    return pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, H4 + 2, wa + 1, C0), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C0, co0), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co0), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * co0, c2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W4, c2), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H4, W4, c2), dt),
        interpret=interpret,
    )(xp, w0c, b0.reshape(1, -1).astype(jnp.float32), w1c, b1.reshape(1, -1).astype(jnp.float32))
