"""Oriented bounding box (OBB) math: probiou, corner conversion, rotated NMS,
rotated distance decode, rotated TAL specialization.

Counterparts of reference utils/metrics.py:135-185 (probiou), utils/ops.py:117-135
(nms_rotated fast-NMS), utils/ops.py:440-470 (xywhr2xyxyxyxy), utils/tal.py:291-324
(RotatedTaskAlignedAssigner) and tal.py:359-381 (dist2rbox). All fixed-shape JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yololite_tpu.utils.tal import TaskAlignedAssigner


def _covariance(boxes):
    """Gaussian covariance terms (a, b, c) of xywhr boxes (metrics.py:129-149)."""
    w2 = boxes[..., 2] ** 2 / 12
    h2 = boxes[..., 3] ** 2 / 12
    r = boxes[..., 4]
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return w2 * cos2 + h2 * sin2, w2 * sin2 + h2 * cos2, (w2 - h2) * cos * sin


def probiou(obb1, obb2, CIoU=False, eps=1e-7):
    """Probabilistic IoU of broadcastable xywhr boxes (metrics.py:152-200)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _covariance(obb1)
    a2, b2, c2 = _covariance(obb2)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = (
        jnp.log(
            ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
            / (4 * jnp.sqrt((a1 * b1 - c1**2).clip(0) * (a2 * b2 - c2**2).clip(0)) + eps)
            + eps
        )
        * 0.5
    )
    bd = (t1 + t2 + t3).clip(eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        import math

        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def xywhr2xyxyxyxy(x):
    """xywhr -> 4 corner points (..., 4, 2) (reference ops.py:440-470)."""
    ctr = x[..., :2]
    w = x[..., 2:3]
    h = x[..., 3:4]
    angle = x[..., 4:5]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], -1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], -1)
    pt1 = ctr + vec1 + vec2
    pt2 = ctr + vec1 - vec2
    pt3 = ctr - vec1 - vec2
    pt4 = ctr - vec1 + vec2
    return jnp.stack([pt1, pt2, pt3, pt4], axis=-2)


def nms_rotated(boxes, scores, threshold=0.45, max_det=300):
    """Fast-NMS over rotated boxes, fixed-shape (reference ops.py:117-135).

    boxes: (N, 5) xywhr; scores: (N,). Returns (keep_idx (max_det,), valid (max_det,)).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    ious = probiou(b[:, None, :], b[None, :, :])
    idx = jnp.arange(n)
    triu = idx[:, None] < idx[None, :]
    max_iou = jnp.max(jnp.where(triu, ious, 0.0), axis=0)
    keep = max_iou < threshold
    ranked = jnp.where(keep, scores[order], -1.0)
    vals, pick = jax.lax.top_k(ranked, min(max_det, n))
    return order[pick], vals > 0


def dist2rbox(pred_dist, pred_angle, anchor_points):
    """Decode rotated boxes from distances + angle (reference tal.py:359-381)."""
    lt, rb = pred_dist[..., :2], pred_dist[..., 2:4]
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf = (rb - lt)[..., 0:1] / 2
    yf = (rb - lt)[..., 1:2] / 2
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], -1) + anchor_points
    return jnp.concatenate([xy, lt + rb], -1)


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """TAL with probiou overlaps and corner-projection candidate test (tal.py:291-324)."""

    def _get_box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask):
        labels = gt_labels.squeeze(-1).astype(jnp.int32).clip(0)
        scores_t = pd_scores.transpose(0, 2, 1)
        bbox_scores = jnp.take_along_axis(scores_t, labels[:, :, None], axis=1) * mask
        iou = probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :])
        overlaps = jnp.where(mask > 0, iou.clip(0), 0.0)
        return bbox_scores**self.alpha * overlaps**self.beta, overlaps

    def _get_pos_mask(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, anc_points, mask_gt):
        mask_in_gts = select_candidates_in_rotated_gts(anc_points, gt_bboxes).astype(pd_scores.dtype)
        valid = mask_in_gts * mask_gt
        align_metric, overlaps = self._get_box_metrics(pd_scores, pd_bboxes, gt_labels, gt_bboxes, valid)
        mask_topk = self._select_topk_candidates(align_metric, mask_gt)
        return mask_topk * mask_in_gts * mask_gt, align_metric, overlaps

    def _get_targets(self, gt_labels, gt_bboxes, target_gt_idx, fg_mask):
        # gt boxes are (B, M, 5) here; gather all 5 coords
        labels_flat = gt_labels.squeeze(-1).astype(jnp.int32).clip(0)
        target_labels = jnp.take_along_axis(labels_flat, target_gt_idx, axis=1)
        target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
        one_hot = jax.nn.one_hot(target_labels, self.num_classes, dtype=gt_bboxes.dtype)
        target_scores = jnp.where((fg_mask > 0)[..., None], one_hot, 0.0)
        return target_labels, target_bboxes, target_scores


def select_candidates_in_rotated_gts(xy_centers, gt_bboxes, eps=1e-9):
    """Point-in-rotated-rect test via corner projections (reference tal.py:300-324)."""
    corners = xywhr2xyxyxyxy(gt_bboxes)  # (B, M, 4, 2)
    a = corners[..., 0, :][..., None, :]  # (B, M, 1, 2)
    b = corners[..., 1, :][..., None, :]
    d = corners[..., 3, :][..., None, :]
    ab = b - a
    ad = d - a
    ap = xy_centers[None, None] - a  # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1)
    norm_ad = (ad * ad).sum(-1)
    ap_dot_ab = (ap * ab).sum(-1)
    ap_dot_ad = (ap * ad).sum(-1)
    return (ap_dot_ab >= 0) & (ap_dot_ab <= norm_ab) & (ap_dot_ad >= 0) & (ap_dot_ad <= norm_ad)


def batch_probiou(obb1, obb2, eps: float = 1e-7):
    """(N, 5) x (M, 5) xywhr -> (N, M) probabilistic IoU matrix
    (reference metrics.py:198-228; same math as probiou with cross broadcasting)."""
    obb1 = jnp.asarray(obb1)
    obb2 = jnp.asarray(obb2)
    return probiou(obb1[:, None, :], obb2[None, :, :], eps=eps)
