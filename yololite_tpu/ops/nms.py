"""On-device batched non-max suppression (fixed shapes, jit/vmap-friendly).

Replaces the reference's host round-trip through torchvision.ops.nms
(utils/ops.py:138-273): candidate gating, class-offset trick, greedy suppression
and max_det capping all run on device and return a padded (B, max_det, 6) tensor
[x1, y1, x2, y2, conf, cls] with conf==0 marking empty slots.

Greedy order matches torchvision (score-descending, suppress IoU > threshold), so
mAP parity holds; a fast matrix variant ("fast" mode) trades exactness for a
single pass when throughput matters more than tie-level parity.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from yololite_tpu.ops.boxes import box_iou

MAX_WH = 7680  # class-offset magnitude (reference ops.py:151)


def _greedy_keep(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float, chunk: int = 32) -> jnp.ndarray:
    """Sequential greedy suppression over score-sorted candidates (exact).

    shifted: (K, 4) class-offset boxes, valid: (K,) initial mask.
    keep[j] survives unless some earlier kept i has iou(i, j) > threshold.

    Chunked to amortize lax.scan's per-step cost: the scan walks K/chunk blocks,
    computing a (chunk, K) IoU slab on the fly (the full (K, K) matrix never
    touches HBM) and unrolling the chunk's sequential updates as trace-time
    vector ops (measured 3.3x faster than a K-step scan at K=512; the on-the-fly
    slab is bit-identical to the materialized matrix and saves its r+w traffic).
    """
    k = shifted.shape[0]
    chunk = min(chunk, k)
    while k % chunk:  # K not divisible: fall back to the largest divisor
        chunk //= 2
    idx = jnp.arange(k)

    def body(keep, ci):
        base = ci * chunk
        rows = box_iou(jax.lax.dynamic_slice(shifted, (base, 0), (chunk, 4)), shifted)  # (chunk, K)
        for j in range(chunk):
            i = base + j
            kv = jax.lax.dynamic_index_in_dim(keep, i, keepdims=False)
            suppress = (rows[j] > iou_thres) & kv & (idx > i)
            keep = keep & ~suppress
        return keep, None

    keep, _ = jax.lax.scan(body, valid, jnp.arange(k // chunk))
    return keep


def _fast_keep(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float, chunk: int = 64) -> jnp.ndarray:
    """One-shot matrix NMS (Fast-NMS): suppressed boxes still suppress others.

    Slab-wise column-max accumulation: IoU rows are computed on the fly per
    chunk, so the (K, K) matrix is never materialized in HBM.
    """
    k = shifted.shape[0]
    chunk = min(chunk, k)
    while k % chunk:
        chunk //= 2
    idx = jnp.arange(k)

    def body(max_iou, ci):
        base = ci * chunk
        rows = box_iou(jax.lax.dynamic_slice(shifted, (base, 0), (chunk, 4)), shifted)  # (chunk, K)
        vmask = jax.lax.dynamic_slice(valid, (base,), (chunk,))
        row_ids = base + jnp.arange(chunk)
        triu = (row_ids[:, None] < idx[None, :]) & vmask[:, None]
        return jnp.maximum(max_iou, jnp.max(jnp.where(triu, rows, 0.0), axis=0)), None

    max_iou, _ = jax.lax.scan(body, jnp.zeros((k,), shifted.dtype), jnp.arange(k // chunk))
    return valid & (max_iou <= iou_thres)


def _select_candidates(boxes, scores, conf_thres, max_cand, multi_label, class_mask, approx=False):
    """Per-image: gate + top-K candidate selection -> (vals, boxes_k, cls, valid).

    approx=True uses jax.lax.approx_max_k (TPU-optimized, ~recall 0.95 of the
    exact top-K) -- serving mode only, never for parity-critical validation.
    """
    a, nc = scores.shape
    if class_mask is not None:
        scores = jnp.where(class_mask[None, :], scores, 0.0)
    if multi_label and nc > 1:
        k = min(max_cand, a * nc)
        flat = scores.reshape(-1)
        gated = jnp.where(flat > conf_thres, flat, -1.0)
        vals, fidx = jax.lax.top_k(gated, k)
        bidx = fidx // nc
        cls = (fidx % nc).astype(jnp.float32)
    else:
        k = min(max_cand, a)
        conf = jnp.max(scores, axis=-1)
        cls_i = jnp.argmax(scores, axis=-1)
        gated = jnp.where(conf > conf_thres, conf, -1.0)
        if approx:
            vals, bidx = jax.lax.approx_max_k(gated, k)
        else:
            vals, bidx = jax.lax.top_k(gated, k)
        # note: argmax over all anchors beats a per-candidate row gather on TPU
        # (XLA row-gather of (K, nc) from (A, nc) lowers worse than the dense reduce)
        cls = cls_i[bidx].astype(jnp.float32)
    cand_boxes = boxes[bidx]
    valid = vals > jnp.maximum(conf_thres, 0.0)
    return vals, cand_boxes, cls, valid


def _finalize(cand_boxes, vals, cls, keep, max_det):
    """Per-image: rank kept candidates, emit padded (max_det, 6)."""
    k = vals.shape[0]
    final_scores = jnp.where(keep, vals, -1.0)
    out_vals, oidx = jax.lax.top_k(final_scores, min(max_det, k))
    ok = out_vals > 0
    dt = cand_boxes.dtype
    out = jnp.concatenate(
        [cand_boxes[oidx], jnp.where(ok, out_vals, 0.0).astype(dt)[:, None], cls[oidx].astype(dt)[:, None]],
        axis=-1,
    )
    out = jnp.where(ok[:, None], out, 0.0)
    if out.shape[0] < max_det:
        out = jnp.pad(out, ((0, max_det - out.shape[0]), (0, 0)))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_cand", "multi_label", "agnostic", "mode"),
)
def non_max_suppression(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy, input-image pixels
    scores: jnp.ndarray,  # (B, A, nc) sigmoid probabilities
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = False,
    agnostic: bool = False,
    class_mask: Optional[jnp.ndarray] = None,
    mode: str = "greedy",
) -> jnp.ndarray:
    """Batched class-aware NMS -> (B, max_det, 6) padded detections.

    mode: 'greedy' (lax.scan, exact torchvision semantics), 'pallas' (VMEM kernel,
    exact), 'fast' (one-shot matrix NMS, slightly over-suppresses), 'serve'
    (approx top-k + fast suppression: fastest, measured +18% end-to-end on v5e).
    """
    vals, cand_boxes, cls, valid = jax.vmap(
        functools.partial(
            _select_candidates,
            conf_thres=conf_thres,
            max_cand=max_cand,
            multi_label=multi_label,
            class_mask=class_mask,
            approx=mode == "serve",
        )
    )(boxes, scores)

    offset = jnp.zeros_like(cls) if agnostic else cls * MAX_WH
    shifted = cand_boxes + offset[..., None]

    if mode == "pallas":
        from yololite_tpu.ops.pallas_kernels import greedy_nms_keep_pallas

        iou = jax.vmap(box_iou)(shifted, shifted)
        keep = greedy_nms_keep_pallas(iou, valid, iou_thres) > 0
    elif mode in ("fast", "serve"):
        keep = jax.vmap(functools.partial(_fast_keep, iou_thres=iou_thres))(shifted, valid)
    else:
        keep = jax.vmap(functools.partial(_greedy_keep, iou_thres=iou_thres))(shifted, valid)

    return jax.vmap(functools.partial(_finalize, max_det=max_det))(cand_boxes, vals, cls, keep)


def fused_decode_nms(
    feats,
    strides,
    nc: int,
    reg_max: int = 16,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_cand: int = 512,
    agnostic: bool = False,
    mode: str = "greedy",
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-label predict path: raw Detect maps -> padded (B, max_det, 6).

    The decode (DFL expectation, dist2bbox, sigmoid) and per-anchor class
    selection run as ONE Pallas pass over the level maps
    (ops/pallas_kernels.decode_select_pallas) instead of decode's separate
    softmax/sigmoid/max reductions; top-k, suppression and finalize reuse the
    standard NMS pieces. Equivalent to decode_detections +
    non_max_suppression(multi_label=False) within float rounding.
    """
    from yololite_tpu.ops.pallas_kernels import decode_select_pallas

    boxes, conf, cls = decode_select_pallas(
        feats, strides, nc, reg_max, conf_thres=conf_thres, interpret=interpret
    )

    def sel(conf_i, boxes_i, cls_i):
        k = min(max_cand, conf_i.shape[0])
        vals, bidx = jax.lax.top_k(conf_i, k)  # conf pre-gated to -1 below threshold
        return vals, boxes_i[bidx], cls_i[bidx], vals > 0
    vals, cand_boxes, cls_k, valid = jax.vmap(sel)(conf, boxes, cls)

    offset = jnp.zeros_like(cls_k) if agnostic else cls_k * MAX_WH
    shifted = cand_boxes + offset[..., None]
    if mode in ("fast", "serve"):
        keep = jax.vmap(functools.partial(_fast_keep, iou_thres=iou_thres))(shifted, valid)
    else:
        keep = jax.vmap(functools.partial(_greedy_keep, iou_thres=iou_thres))(shifted, valid)
    return jax.vmap(functools.partial(_finalize, max_det=max_det))(cand_boxes, vals, cls_k, keep)
