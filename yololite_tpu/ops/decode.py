"""Device-side decode: raw Detect maps -> (boxes, scores), fully inside jit.

Replaces the reference's Detect._inference (head.py:95-126): DFL softmax-projection,
dist2bbox around a statically-computed anchor grid, stride scaling, sigmoid scores.
Anchors are trace-time constants (static shapes), so there is no shape-keyed cache.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from yololite_tpu.ops.boxes import dist2bbox, make_anchors


def flatten_levels(feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B,H,W,C)...] -> (B, sum(H*W), C) preserving level order."""
    return jnp.concatenate([f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats], axis=1)


def dfl_expectation(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """(B, A, 4*reg_max) -> (B, A, 4) expected ltrb via softmax-weighted bins."""
    b, a, _ = box_logits.shape
    x = box_logits.reshape(b, a, 4, reg_max)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.einsum("bafr,r->baf", jax.nn.softmax(x, axis=-1), proj)


def _dfl_mm_parts(box_logits: jnp.ndarray, reg_max: int):
    """Shared fwd body: returns (E, m, Z) — expectation, per-side max, sumexp."""
    f = box_logits.astype(jnp.float32)
    m = jnp.max(f.reshape(*f.shape[:-1], 4, reg_max), axis=-1)  # (.., A, 4)
    c = jnp.repeat(m, reg_max, axis=-1)  # per-side shift, back in lane layout
    e = jnp.exp(f - c)
    seg = jnp.repeat(jnp.eye(4, dtype=jnp.float32), reg_max, axis=0)  # (4*reg_max, 4)
    proj = jnp.tile(jnp.arange(reg_max, dtype=jnp.float32), 4)[:, None] * seg
    z = e @ seg
    return (e @ proj) / z, m, z


def take_rows_blocked(x: jnp.ndarray, idx: jnp.ndarray, block: int = 16) -> jnp.ndarray:
    """Exact row gather x[..., idx, :] as two one-hot contractions (TPU form).

    x: (..., A, W), idx: (..., K) int32 -> (..., K, W), bit-identical to
    jnp.take_along_axis on the row axis. TPU lowers row gathers to ~K serial
    dynamic slices (per-dispatch latency bound) and the flat one-hot matmul
    alternative moves a (K, A) operand through HBM; decomposing
    idx = hi*block + lo keeps the one-hot operand at (K, A/block) and the
    intermediate at (K, block, W) — both MXU/VPU-dense, no serialization.
    Each output element is the sum of exactly one nonzero product, so the
    result reproduces the input rows exactly in any dtype (f32 MXU
    accumulation passes the single value through unrounded).
    """
    a, w = x.shape[-2], x.shape[-1]
    pad = (-a) % block
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)])
    nhi = (a + pad) // block
    oh_hi = jax.nn.one_hot(idx // block, nhi, dtype=x.dtype)  # (..., K, nhi)
    xb = x.reshape(*x.shape[:-2], nhi, block * w)
    y = (oh_hi @ xb).reshape(*idx.shape, block, w)  # (..., K, block, W)
    oh_lo = jax.nn.one_hot(idx % block, block, dtype=x.dtype)  # (..., K, block)
    return jnp.einsum("...kbw,...kb->...kw", y, oh_lo)


def dfl_expectation_mm_ad(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Autodiff-backward variant of dfl_expectation_mm (A/B reference for the
    custom-vjp form; same forward bits)."""
    return _dfl_mm_parts(box_logits, reg_max)[0]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def dfl_expectation_mm(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """(.., A, 4*reg_max) -> (.., A, 4): same expectation, MXU-friendly form.

    Keeps the native 4*reg_max-wide lane layout for the heavy elementwise work
    (the (...,4,reg_max) reshape of the softmax form breaks TPU's 128-lane
    tiling) and computes the per-bin softmax expectation as two
    (4*reg_max -> 4) segment matmuls: exp(x-c) @ S and exp(x-c) @ (S*proj).
    The shift c is each SIDE's own max (a small reshape-reduce broadcast back
    across its 16 bins): it cancels in the ratio, and — unlike a shared
    per-row max — guarantees every side keeps exp(0)=1 in its denominator, so
    a side sitting far below another side's logits can never underflow to
    0/0 = NaN. Mathematically identical to dfl_expectation (float rounding
    ~1e-6 relative); measured ~2x faster than the softmax-einsum on v5e in
    the decode tail (docs/PERF.md round 3).

    Backward is a custom vjp (the train-step loss-tail lever, docs/PERF.md
    round 4): dE/dx_j = softmax_j * (proj_j - E) per side, so the cotangent is
    ONE fused elementwise pass over the (B, A, 4*reg_max) logits emitted in
    the logits' dtype — autodiff instead transposes the two segment matmuls
    into f32 (B, A, 4*reg_max) intermediates.
    """
    return _dfl_mm_parts(box_logits, reg_max)[0]


def _dfl_mm_fwd(box_logits, reg_max):
    out, m, z = _dfl_mm_parts(box_logits, reg_max)
    return out, (box_logits, m, z, out)


def _dfl_mm_bwd(reg_max, res, g):
    x, m, z, out = res
    rep = lambda t: jnp.repeat(t, reg_max, axis=-1)  # (.., 4) -> (.., 4R)
    sm = jnp.exp(x.astype(jnp.float32) - rep(m)) / rep(z)
    proj = jnp.tile(jnp.arange(reg_max, dtype=jnp.float32), 4)
    dx = (sm * (proj - rep(out)) * rep(g)).astype(x.dtype)
    return (dx,)


dfl_expectation_mm.defvjp(_dfl_mm_fwd, _dfl_mm_bwd)


def decode_detections(
    feats: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
    xywh: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode per-level Detect maps.

    Returns:
        boxes: (B, A, 4) in input-image pixels (xyxy by default).
        scores: (B, A, nc) sigmoid class probabilities.
    """
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)  # (A,2), (A,1)
    x = flatten_levels(feats)  # (B, A, 4*reg_max + nc)
    box_logits, cls_logits = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    # segment-matmul DFL (lane-layout friendly; ~1e-6 relative of the softmax
    # form, docs/PERF.md round 3) — the validator/TTA decode path shares the
    # same expectation kernel as the fused predict pipeline
    dist = dfl_expectation_mm(box_logits, reg_max).astype(jnp.float32)  # (B, A, 4)
    boxes = dist2bbox(dist, anchors[None], xywh=xywh) * stride_t[None]
    scores = jax.nn.sigmoid(cls_logits)
    return boxes, scores


def postprocess_end2end(
    feats: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
    max_det: int = 300,
    conf_thres: float = 0.0,
) -> jnp.ndarray:
    """NMS-free top-k select over one2one maps (reference head.py:145-167).

    Two-stage selection, exactly the reference's semantics: (1) keep the
    max_det anchors with the highest per-anchor max class score, (2) flat
    top-k over the surviving (anchor x class) scores. Returns (B, max_det, 6)
    [x1, y1, x2, y2, conf, cls] rows sorted by confidence; rows under
    conf_thres are zeroed (same padded-output convention as ops.nms).
    """
    boxes, scores = decode_detections(feats, strides, nc, reg_max, xywh=False)
    scores = scores.astype(jnp.float32)
    k = min(max_det, scores.shape[1])
    # stage 1: per-anchor best class, top-k anchors (head.py:163)
    best = scores.max(axis=-1)  # (B, A)
    _, idx = jax.lax.top_k(best, k)  # (B, k)
    sel_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)  # (B, k, 4)
    sel_scores = jnp.take_along_axis(scores, idx[..., None], axis=1)  # (B, k, nc)
    # stage 2: flat top-k over (k * nc) scores (head.py:165)
    flat = sel_scores.reshape(sel_scores.shape[0], -1)  # (B, k*nc)
    conf, fidx = jax.lax.top_k(flat, k)  # (B, k)
    cls = (fidx % nc).astype(jnp.float32)
    out_boxes = jnp.take_along_axis(sel_boxes, (fidx // nc)[..., None], axis=1)
    rows = jnp.concatenate([out_boxes, conf[..., None], cls[..., None]], axis=-1)
    valid = conf > conf_thres
    return jnp.where(valid[..., None], rows, 0.0)
