"""Task-Aligned Assigner in pure fixed-shape JAX.

Re-implementation of the reference TaskAlignedAssigner (utils/tal.py:14-288) with
every boolean fancy-indexing / scatter replaced by masked dense ops so the whole
assignment jits into the training step:
  - candidate-in-gt mask via ltrb deltas
  - align metric score^alpha * CIoU^beta on the full (B, M, A) grid, masked
  - top-k selection with duplicate suppression via scatter-add counting
  - multi-GT conflict resolution by highest overlap (applied unconditionally;
    identical result when no conflicts exist)
  - target score normalization by per-GT max metric/overlap
GT boxes arrive padded to a static M = max_boxes with mask_gt flags.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from yololite_tpu.ops.boxes import bbox_iou

# Top-k implementation for the per-GT candidate selection (measured r4 queue9,
# docs/PERF.md):
#   "hier"        -> topk_hierarchical: variadic (value, index) top-k of every
#                    ~84-wide block, then k-of-winners (r2 default, 2.4x over
#                    the full lax.top_k sort)
#   "blockgather" -> topk_blockmax_gather: cheap block-max reduce, top-k of the
#                    66 block maxes, one-hot-matmul gather of just those k
#                    blocks, variadic sort over k*block instead of A elements.
#                    Bit-identical to hier (test_tal); measured 4.03 vs 5.30 ms
#                    over floor at bs=64 -> default.
TOPK_MODE = "blockgather"


def _pow_const(x: jnp.ndarray, p: float) -> jnp.ndarray:
    """x**p for the assigner's static exponents without lax.pow.

    The shipped exponents (alpha=0.5, beta=6.0, utils/loss.py:83) expand to
    sqrt / multiply chains instead of exp(p*log(x)). Measured cost-neutral on
    this chip (r4 queue9: metrics stage 2.98 vs 2.97 ms — XLA specializes
    const-exponent pow equally well); kept for lowering explicitness.
    """
    if p == 1.0:
        return x
    if p == 0.5:
        return jnp.sqrt(x)
    if float(p).is_integer() and 1 < p <= 8:
        n, out, base = int(p), None, x
        while n:  # square-and-multiply
            if n & 1:
                out = base if out is None else out * base
            n >>= 1
            if n:
                base = base * base
        return out
    return x**p


def topk_blockmax_gather(m: jnp.ndarray, k: int, block: int = 128):
    """Exact top-k along the last axis (float inputs, any sign).

    Any block containing a global top-k element has block-max >= the k-th
    value, and on max ties the earlier block's element is chosen first by the
    global first-occurrence rule — so the k blocks picked by lax.top_k over
    block maxes (value desc, index asc) are a superset of the blocks holding
    the answer. Re-sorting the selected block ids ascending restores global
    position order, so the final top-k over the k*block gathered columns is
    bit-identical to lax.top_k(m, k), tie semantics included. The full-width
    pass drops from a variadic sort to a max-reduce; only k*block elements
    (~1.7k vs A=8400) see the sort.

    Tail padding uses the dtype's finite min (not -inf: the one-hot-matmul
    gather would turn 0 * -inf into NaN), so a pad element never outranks a
    real one even for signed inputs — a real element equal to dtype-min still
    wins its tie by first-occurrence order.
    """
    A = m.shape[-1]
    nblk = -(-A // block)
    if nblk <= k or k >= A:
        return jax.lax.top_k(m, min(k, A))
    pad = nblk * block - A
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)],
                    constant_values=jnp.finfo(m.dtype).min)
    mb = m.reshape(*m.shape[:-1], nblk, block)
    _, bidx = jax.lax.top_k(mb.max(axis=-1), k)  # (..., k) candidate blocks
    bidx = jnp.sort(bidx, axis=-1)  # ascending -> global position order
    oh = jax.nn.one_hot(bidx, nblk, dtype=m.dtype)  # (..., k, nblk)
    g = jnp.einsum("...kn,...nb->...kb", oh, mb)  # gathered blocks (..., k, block)
    v, i = jax.lax.top_k(g.reshape(*m.shape[:-1], k * block), k)
    gblk = jnp.take_along_axis(bidx, i // block, axis=-1)
    return v, gblk * block + i % block


def topk_hierarchical(m: jnp.ndarray, k: int, block: int = 84):
    """Exact top-k along the last axis via per-block top-k then top-k of winners.

    XLA's top_k lowers to a full sort of the 8400-anchor axis; splitting into
    ~`block`-wide chunks (each sorted independently, then k-of-winners) returns
    bit-identical (values, indices) 2.4x faster on TPU (12.2ms -> 5.1ms at
    (16,64,8400), k=10). Exact because every global top-k element is a top-k
    element of its own block. Index order for tied values matches lax.top_k
    (first occurrence wins) since blocks preserve position order.
    """
    A = m.shape[-1]
    nblk = max(1, A // block)
    if nblk <= 1 or k >= A:
        return jax.lax.top_k(m, min(k, A))
    pad = (-A) % nblk
    if pad:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)], constant_values=-jnp.inf)
    blk = m.shape[-1] // nblk
    mb = m.reshape(*m.shape[:-1], nblk, blk)
    v1, i1 = jax.lax.top_k(mb, min(k, blk))  # (..., nblk, k)
    gi = i1 + (jnp.arange(nblk) * blk).reshape((1,) * (m.ndim - 1) + (nblk, 1))
    v2, i2 = jax.lax.top_k(v1.reshape(*m.shape[:-1], -1), k)
    idx = jnp.take_along_axis(gi.reshape(*m.shape[:-1], -1), i2, axis=-1)
    return v2, idx


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """(A,2) centers x (B,M,4) xyxy -> (B,M,A) bool: center strictly inside box."""
    lt = gt_bboxes[..., None, :2]  # (B,M,1,2)
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate([xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1)
    return deltas.min(axis=-1) > eps


def select_highest_overlaps(mask_pos: jnp.ndarray, overlaps: jnp.ndarray, n_max_boxes: int):
    """Resolve anchors assigned to multiple GTs by keeping the highest-IoU GT.

    mask_pos/overlaps: (B, M, A). Returns (target_gt_idx (B,A), fg_mask (B,A), mask_pos).
    """
    fg_mask = mask_pos.sum(axis=-2)  # (B,A)
    mask_multi = (fg_mask[:, None, :] > 1)  # (B,1,A) -> broadcast (B,M,A)
    max_overlaps_idx = overlaps.argmax(axis=1)  # (B,A)
    is_max = jax.nn.one_hot(max_overlaps_idx, n_max_boxes, dtype=mask_pos.dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2)
    target_gt_idx = mask_pos.argmax(axis=-2)  # (B,A)
    return target_gt_idx, fg_mask, mask_pos


class TaskAlignedAssigner:
    """Functional TAL assigner: __call__ is jit/vmap-safe with static M."""

    def __init__(self, topk: int = 13, num_classes: int = 80, alpha: float = 1.0, beta: float = 6.0,
                 eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.bg_idx = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps
        # metric/overlap grids are fp32, matching the reference bit-for-bit. A
        # bf16 metric_dtype knob existed in r4; its measured ceiling was ~0.4 ms
        # of a 110 ms step (11.93 vs 12.32 ms assigner at bs=128, docs/PERF.md
        # queue9) against an mAP-revalidation cost — deleted by the flip rule.

    def __call__(
        self,
        pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid scores
        pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy (image units)
        anc_points: jnp.ndarray,  # (A, 2)
        gt_labels: jnp.ndarray,  # (B, M, 1) int
        gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy
        mask_gt: jnp.ndarray,  # (B, M, 1) 0/1
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (target_labels (B,A), target_bboxes (B,A,4), target_scores (B,A,nc),
        fg_mask (B,A) bool, target_gt_idx (B,A))."""
        B, A, nc = pd_scores.shape
        M = gt_bboxes.shape[1]
        if M == 0:
            return (
                jnp.full((B, A), self.bg_idx, jnp.int32),
                jnp.zeros_like(pd_bboxes),
                jnp.zeros_like(pd_scores),
                jnp.zeros((B, A), bool),
                jnp.zeros((B, A), jnp.int32),
            )

        mask_pos, align_metric, overlaps = self._get_pos_mask(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes, anc_points, mask_gt
        )
        target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, M)
        target_labels, target_bboxes, target_scores = self._get_targets(gt_labels, gt_bboxes, target_gt_idx, fg_mask)

        # normalize target scores by per-GT peak metric scaled to peak overlap
        align_metric = align_metric * mask_pos
        pos_align_metrics = align_metric.max(axis=-1, keepdims=True)  # (B,M,1)
        pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)  # (B,M,1)
        norm_align_metric = (align_metric * pos_overlaps / (pos_align_metrics + self.eps)).max(axis=-2)[..., None]
        target_scores = target_scores * norm_align_metric

        return target_labels, target_bboxes, target_scores, fg_mask > 0, target_gt_idx

    def _get_pos_mask(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, anc_points, mask_gt):
        dt = jnp.float32
        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes).astype(dt)  # (B,M,A)
        valid = mask_in_gts * mask_gt.astype(dt)  # (B,M,A)
        align_metric, overlaps = self._get_box_metrics(pd_scores, pd_bboxes, gt_labels, gt_bboxes, valid)
        mask_topk = self._select_topk_candidates(align_metric, mask_gt)
        mask_pos = mask_topk * mask_in_gts * mask_gt
        return mask_pos, align_metric, overlaps

    def _get_box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask):
        """align = score[gt_cls]^alpha * CIoU^beta, zeroed outside the mask."""
        labels = gt_labels.squeeze(-1).astype(jnp.int32).clip(0)  # (B,M)
        # per-(gt, anchor) class score via one-hot matmul: exact gather semantics
        # (zeros add exactly) but runs on the MXU instead of TPU's slow row-gather,
        # and reads bf16 scores with fp32 accumulation on the amp path
        dt = jnp.float32
        one_hot = jax.nn.one_hot(labels, self.num_classes, dtype=pd_scores.dtype)  # (B,M,nc)
        bbox_scores = jnp.einsum(
            "bmc,bac->bma", one_hot, pd_scores, preferred_element_type=dt
        )
        bbox_scores = bbox_scores * mask.astype(dt)

        # IoU math is fp32: intersection widths are differences of near-equal
        # coordinates, and bf16 coords suffer catastrophic cancellation (x300
        # metric error after ^beta — docs/PERF.md r4 queue9).
        iou = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :].astype(jnp.float32),
                       xywh=False, CIoU=True)
        overlaps = jnp.where(mask > 0, iou.clip(0).astype(dt), jnp.zeros((), dt))

        align_metric = _pow_const(bbox_scores, self.alpha) * _pow_const(overlaps, self.beta)
        return align_metric, overlaps

    def _select_topk_candidates(self, metrics: jnp.ndarray, mask_gt: jnp.ndarray) -> jnp.ndarray:
        """Top-k per GT with the reference's duplicate-count suppression
        (reference tal.py:180-205).

        A value-threshold membership-mask variant (single-operand blocked sorts
        for the k-th value + tie cumsum) was built and measured SLOWER on-chip
        (9.0 vs 7.0 ms for the topk stage at bs=64 — docs/r4_queue5_results.log:
        the variadic sort the hierarchical form pays for is cheaper than the
        threshold form's extra full-width compare/cumsum passes), so the
        hierarchical (value, index) form stays.
        """
        B, M, A = metrics.shape
        topk_fn = topk_blockmax_gather if TOPK_MODE == "blockgather" else topk_hierarchical
        topk_metrics, topk_idxs = topk_fn(metrics, self.topk)  # (B,M,K)
        topk_mask = (mask_gt > 0)  # (B,M,1)
        topk_idxs = jnp.where(topk_mask, topk_idxs, 0)
        # occurrence count as a fused compare-reduce over the K axis (TPU scatter
        # lowers as badly as gather; the (B,M,K,A) compare never materializes)
        count = (topk_idxs[..., None] == jnp.arange(A, dtype=topk_idxs.dtype)).sum(-2, dtype=jnp.int32)
        count = jnp.where(count > 1, 0, count)  # kills the index-0 pileup of masked rows
        return count.astype(metrics.dtype)

    def _get_targets(self, gt_labels, gt_bboxes, target_gt_idx, fg_mask):
        """Per-anchor GT lookup as one-hot matmuls over the small M axis (exact
        gather semantics: one 1.0 per row, zeros add exactly; MXU instead of a
        (B,A)-wide gather)."""
        labels_flat = gt_labels.squeeze(-1).astype(jnp.int32).clip(0)  # (B,M)
        oh_gt = jax.nn.one_hot(target_gt_idx, labels_flat.shape[1], dtype=jnp.float32)  # (B,A,M)
        target_labels = jnp.einsum("bam,bm->ba", oh_gt, labels_flat.astype(jnp.float32)).astype(jnp.int32)
        target_bboxes = jnp.einsum("bam,bmf->baf", oh_gt, gt_bboxes.astype(jnp.float32))
        cls_oh = jax.nn.one_hot(labels_flat, self.num_classes, dtype=jnp.float32)  # (B,M,nc)
        target_scores = jnp.einsum("bam,bmc->bac", oh_gt, cls_oh)  # (B,A,nc)
        target_scores = jnp.where((fg_mask > 0)[..., None], target_scores, 0.0)
        return target_labels, target_bboxes.astype(gt_bboxes.dtype), target_scores.astype(gt_bboxes.dtype)
