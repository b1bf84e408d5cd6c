"""v8 detection loss in pure JAX (BCE cls + CIoU box + DFL), fully jittable.

Counterpart of reference utils/loss.py:12-160. Differences are all shape-related:
targets arrive padded to a static (B, M, 5) block (the reference builds ragged
targets with a per-image Python loop, loss.py:85-101), and the fg_mask boolean
indexing becomes masked weighted sums.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.ops.boxes import bbox2dist, bbox_iou, dist2bbox, make_anchors, xywh2xyxy
from yololite_tpu.ops.decode import flatten_levels
from yololite_tpu.utils import LOGGER
from yololite_tpu.utils.tal import TaskAlignedAssigner

_TRUNC_WARNED = False  # warn once per process on GT truncation


def build_targets(batch: Dict, batch_size: int, imgsz: Tuple[int, int], max_gt: int) -> Dict[str, np.ndarray]:
    """Host-side: ragged (batch_idx, cls, bboxes-xywhn) -> padded static arrays.

    Returns gt_labels (B,M,1) int32, gt_bboxes (B,M,4) xyxy pixels, mask_gt (B,M,1).
    """
    bi = np.asarray(batch["batch_idx"]).reshape(-1).astype(int)
    cls = np.asarray(batch["cls"]).reshape(-1)
    boxes = np.asarray(batch["bboxes"]).reshape(-1, 4)
    h, w = imgsz
    gt_labels = np.zeros((batch_size, max_gt, 1), np.int32)
    gt_bboxes = np.zeros((batch_size, max_gt, 4), np.float32)
    mask_gt = np.zeros((batch_size, max_gt, 1), np.float32)
    counts = np.bincount(bi, minlength=batch_size) if len(bi) else np.zeros(batch_size, int)
    if counts.max(initial=0) > max_gt:
        global _TRUNC_WARNED
        if not _TRUNC_WARNED:
            _TRUNC_WARNED = True
            LOGGER.warning(
                f"build_targets: an image carries {int(counts.max())} GT boxes, exceeding the "
                f"static max_gt={max_gt} cap; overflow boxes are dropped for this batch "
                "(dense mosaics can exceed the dataset-derived headroom)."
            )
    for b in range(batch_size):
        sel = np.nonzero(bi == b)[0][:max_gt]
        n = len(sel)
        if n:
            gt_labels[b, :n, 0] = cls[sel]
            xyxy = xywh2xyxy(boxes[sel] * np.array([w, h, w, h], np.float32))
            gt_bboxes[b, :n] = xyxy
            # reference masks on bbox coordinate sum > 0 (loss.py:123)
            mask_gt[b, :n, 0] = (xyxy.sum(-1) > 0).astype(np.float32)
    return {"gt_labels": gt_labels, "gt_bboxes": gt_bboxes, "mask_gt": mask_gt}


# Differentiable box+DFL chain form (trace-time constant):
#   True  -> compact-K: gather the <= topk*M foreground candidates with a
#            one-hot MXU matmul and run decode/CIoU/bbox2dist/DFL-CE on
#            (B, K) rows instead of all (B, A=8400). Exact: the assigner's
#            dedup guarantees fg_count <= topk*M, and every dropped row has
#            weight 0 (contributes 0 to the masked sums and 0 gradient).
#   False -> dense masked form over all anchors.
# Measured on-chip before flipping (docs/r4_queue6_results.log): loss fwd+bwd
# over floor 7.57 vs 9.12 ms at bs=64, 15.28 vs 20.71 ms at bs=128 -> compact.
COMPACT_BOX_LOSS = True


class v8DetectionLoss:
    """Functional loss: __call__(feats, targets) -> (total_loss, loss_items)."""

    def __init__(self, nc: int, strides: Sequence[int], reg_max: int = 16, hyp=None, tal_topk: int = 10):
        self.nc = nc
        self.strides = list(strides)
        self.reg_max = reg_max
        self.no = nc + reg_max * 4
        self.use_dfl = reg_max > 1
        self.hyp_box = float(getattr(hyp, "box", 7.5))
        self.hyp_cls = float(getattr(hyp, "cls", 0.5))
        self.hyp_dfl = float(getattr(hyp, "dfl", 1.5))
        self.assigner = TaskAlignedAssigner(topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)

    def bbox_decode(self, anchor_points: jnp.ndarray, pred_dist: jnp.ndarray) -> jnp.ndarray:
        """DFL expectation -> xyxy boxes in anchor (stride) units.

        Uses the MXU segment-matmul expectation (decode.dfl_expectation_mm):
        the (B,A,4,reg_max) reshape of the softmax form breaks TPU's 128-lane
        tiling (measured on the inference tail, docs/PERF.md round 3). Runs in
        fp32 regardless of the input dtype (torch autocast lists softmax as an
        fp32 op); with bf16 inputs the upcast fuses into the read.
        """
        if self.use_dfl:
            from yololite_tpu.ops.decode import dfl_expectation_mm

            pred_dist = dfl_expectation_mm(pred_dist, self.reg_max)
        else:
            pred_dist = pred_dist.astype(jnp.float32)
        return dist2bbox(pred_dist, anchor_points, xywh=False)

    def _df_loss(self, pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Distribution focal loss (reference loss.py:21-36) — custom-vjp form."""
        return dfl_ce_mean(pred_dist, target)

    def _df_loss_autodiff(self, pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Autodiff-backward DFL CE (A/B reference for the custom vjp; same
        forward bits as dfl_ce_mean)."""
        ce, _ = _dfl_ce_parts(pred_dist, target)
        return ce

    def __call__(self, feats: List[jnp.ndarray], targets: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feats: per-level (B, H, W, no) NHWC maps; targets: padded gt dict."""
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        x = flatten_levels(feats)  # (B, A, no)
        pred_distri, pred_scores = x[..., : self.reg_max * 4], x[..., self.reg_max * 4 :]
        dtype = pred_scores.dtype
        batch_size, A = pred_scores.shape[:2]
        anchor_points, stride_tensor = make_anchors(shapes, self.strides, 0.5)

        gt_labels = targets["gt_labels"]
        gt_bboxes = targets["gt_bboxes"]  # xyxy pixels
        mask_gt = targets["mask_gt"]

        pred_bboxes = self.bbox_decode(anchor_points, pred_distri)  # (B, A, 4) anchor units, fp32

        # assigner outputs are non-differentiable by construction (its inputs
        # are stop_gradient'd); marking the OUTPUTS too lets XLA drop every
        # assignment op from the backward graph outright instead of carrying
        # them as residual producers (VERDICT r3 #4 loss-tail lever)
        _, target_bboxes, target_scores, fg_mask, _ = jax.lax.stop_gradient(self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor).astype(gt_bboxes.dtype),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        ))

        # All accumulations below are fp32 even with bf16 logits: the upcasts fuse
        # into the elementwise producers, so the big (B,A,nc) tensors stay bf16 in
        # HBM on the amp path while sums/ratios are computed exactly.
        amp = dtype == jnp.bfloat16
        # on the amp path the (B,A,nc) target tensor itself lives in HBM as
        # bf16 (targets are exact one-hot*score products; bf16 keeps ~3
        # significant digits of the normalized scores) — halves the HBM reads
        # of the largest loss tensors; every SUM below stays fp32
        target_scores = target_scores.astype(jnp.bfloat16 if amp else jnp.float32)
        target_scores_sum = jnp.maximum(target_scores.astype(jnp.float32).sum(), 1)

        # cls: BCE-with-logits, sum-normalized (loss.py:147). Fused-backward
        # form: fp32 forward accumulation, backward emits sigmoid(x)-y directly
        # in the logits' dtype (bf16 under amp — the (B,A,nc) cls gradient is
        # the single biggest backward tensor)
        loss_cls = bce_sum(pred_scores, target_scores) / target_scores_sum

        # box + dfl, masked on fg
        fg = fg_mask.astype(jnp.float32)  # (B, A)
        target_bboxes = target_bboxes.astype(jnp.float32) / stride_tensor
        weight = target_scores.astype(jnp.float32).sum(-1) * fg  # (B, A), fp32 accumulation
        M = gt_labels.shape[1]
        if COMPACT_BOX_LOSS and self.assigner.topk * M < A:
            # compact-K: every fg row (<= topk*M by the assigner's dedup) is
            # gathered front-compacted; dropped rows have weight 0, so the
            # masked sums and their gradients are bit-equal to the dense form
            K = self.assigner.topk * M
            idx = jax.lax.top_k(fg, K)[1]  # fg rows first, index order (stable ties)
            oh = jax.nn.one_hot(idx, A, dtype=pred_distri.dtype)  # (B, K, A)
            pred_distri_k = jnp.einsum("bka,bar->bkr", oh, pred_distri)
            anchor_k = jnp.take(anchor_points, idx, axis=0)  # (B, K, 2) from consts
            tb_k = jnp.take_along_axis(target_bboxes, idx[..., None], axis=1)
            w_k = jnp.take_along_axis(weight, idx, axis=1)
            pb_k = self.bbox_decode(anchor_k, pred_distri_k)
            iou = bbox_iou(pb_k, tb_k, xywh=False, CIoU=True)
            loss_box = ((1.0 - iou) * w_k).sum() / target_scores_sum
            if self.use_dfl:
                target_ltrb = bbox2dist(anchor_k, tb_k, self.reg_max - 1)
                df = self._df_loss(pred_distri_k, target_ltrb).squeeze(-1)
                loss_dfl = (df * w_k).sum() / target_scores_sum
            else:
                loss_dfl = jnp.zeros((), jnp.float32)
        else:
            iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)
            loss_box = ((1.0 - iou) * weight).sum() / target_scores_sum

            if self.use_dfl:
                target_ltrb = bbox2dist(anchor_points, target_bboxes, self.reg_max - 1)
                df = self._df_loss(pred_distri, target_ltrb).squeeze(-1)
                loss_dfl = (df * weight).sum() / target_scores_sum
            else:
                loss_dfl = jnp.zeros((), jnp.float32)

        loss_items = jnp.stack([loss_box * self.hyp_box, loss_cls * self.hyp_cls, loss_dfl * self.hyp_dfl])
        return loss_items.sum() * batch_size, jax.lax.stop_gradient(loss_items)


def _dfl_ce_parts(pred_dist: jnp.ndarray, target: jnp.ndarray):
    """Shared DFL-CE forward body.

    pred_dist: (B, A, 4*R) flat logits; target: (B, A, 4) continuous bins.
    Returns (ce, residuals) where ce is (B, A, 1) — mean over the 4 sides.

    Stays in the native 4*reg_max-wide lane layout for the heavy elementwise
    work: per-side logsumexp via a (4R -> 4) segment matmul shifted by each
    SIDE's own max (so e@seg >= exp(0) = 1 and the lse can never hit
    log(0) = -inf, unlike a shared per-row shift), and the target-bin logit
    extracted with a disjoint-block multi-hot — no (B,A,4,R) log_softmax
    materialization, no gather.
    """
    R = pred_dist.shape[-1] // 4
    x = pred_dist.astype(jnp.float32)  # (B, A, 4R)
    target = target.clip(0, R - 1 - 0.01)
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = (tr.astype(jnp.float32) - target.astype(jnp.float32))
    wr = 1 - wl

    m = jnp.max(x.reshape(*x.shape[:-1], 4, R), axis=-1)  # (B, A, 4)
    e = jnp.exp(x - jnp.repeat(m, R, axis=-1))
    seg = jnp.repeat(jnp.eye(4, dtype=jnp.float32), R, axis=0)  # (4R, 4)
    z = e @ seg  # (B, A, 4) per-side sumexp (of the shifted logits)
    lse = jnp.log(z) + m  # (B, A, 4) per-side logsumexp

    base = (jnp.arange(4, dtype=jnp.int32) * R)[None, None, :]
    bins = jnp.arange(4 * R, dtype=jnp.int32)
    # one 1 per side block; compare+sum fuses without materializing (B,A,4,4R)
    mh_l = (bins[None, None, None, :] == (tl + base)[..., None]).astype(jnp.float32).sum(-2)
    mh_r = (bins[None, None, None, :] == (tr.clip(max=R - 1) + base)[..., None]).astype(jnp.float32).sum(-2)
    x_l = (x * mh_l) @ seg  # (B, A, 4): the chosen bin's logit per side
    x_r = (x * mh_r) @ seg
    ce_l = lse - x_l
    ce_r = lse - x_r
    ce = (ce_l * wl + ce_r * wr).mean(-1, keepdims=True)
    return ce, (m, z, tl, tr, wl, wr)


@jax.custom_vjp
def dfl_ce_mean(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """DFL cross-entropy, mean over the 4 sides -> (B, A, 1), with a fused
    analytic backward (the train-step loss-tail lever, docs/PERF.md round 4).

    d ce / d x_j = (softmax_j - y_j) / 4 per side, where y is the two-hot
    interpolation weight vector (wl at tl, wr at tr) — the classic CE
    gradient. The cotangent is ONE fused elementwise pass over the
    (B, A, 4*reg_max) logits, emitted in the logits' dtype (bf16 under amp);
    autodiff instead carries the lse/multi-hot chain as several f32
    (B, A, 4*reg_max) intermediates through the transpose. Targets are
    expected non-differentiable (assignment outputs are stop_gradient'd).
    """
    ce, _ = _dfl_ce_parts(pred_dist, target)
    return ce


def _dfl_ce_fwd(pred_dist, target):
    ce, (m, z, tl, tr, wl, wr) = _dfl_ce_parts(pred_dist, target)
    return ce, (pred_dist, target, m, z, tl, tr, wl, wr)


def _dfl_ce_bwd(res, g):
    x, target, m, z, tl, tr, wl, wr = res
    R = x.shape[-1] // 4
    rep = lambda t: jnp.repeat(t, R, axis=-1)  # (B, A, 4) -> (B, A, 4R)
    sm = jnp.exp(x.astype(jnp.float32) - rep(m)) / rep(z)
    base = (jnp.arange(4, dtype=jnp.int32) * R)[None, None, :]
    bins = jnp.arange(4 * R, dtype=jnp.int32)
    # two-hot target distribution y, built by the same fused compare+sum trick
    y = ((bins[None, None, None, :] == (tl + base)[..., None]).astype(jnp.float32)
         * wl[..., None]).sum(-2)
    y = y + ((bins[None, None, None, :] == (tr.clip(max=R - 1) + base)[..., None])
             .astype(jnp.float32) * wr[..., None]).sum(-2)
    dx = ((sm - y) * (g * 0.25)).astype(x.dtype)  # g (B,A,1) broadcasts over 4R
    return dx, jnp.zeros_like(target)


dfl_ce_mean.defvjp(_dfl_ce_fwd, _dfl_ce_bwd)


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCEWithLogits (same math as torch's)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@jax.custom_vjp
def bce_sum(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """sum(BCEWithLogits(logits, labels)) with a fused analytic backward.

    Forward: fp32 math regardless of input dtype (torch autocast runs BCE in
    fp32; the upcast fuses into the elementwise read). Backward: the exact
    closed form d/dlogits = sigmoid(logits) - labels, emitted in the LOGITS'
    dtype — so on the amp path the (B, A, nc) cls gradient is written to HBM
    as bf16 instead of autodiff's fp32 (the biggest single backward tensor of
    the train step, docs/PERF.md round-3 decomposition). Labels are expected
    non-differentiable (assignment targets are stop_gradient'd)."""
    return optax_sigmoid_bce(logits.astype(jnp.float32), labels.astype(jnp.float32)).sum()


def _bce_sum_fwd(logits, labels):
    return bce_sum(logits, labels), (logits, labels)


def _bce_sum_bwd(res, g):
    logits, labels = res
    glog = (jax.nn.sigmoid(logits) - labels.astype(logits.dtype)) * g.astype(logits.dtype)
    # labels cotangent is never consumed (targets come through stop_gradient);
    # the zeros are DCE'd by XLA
    return glog, jnp.zeros_like(labels)


bce_sum.defvjp(_bce_sum_fwd, _bce_sum_bwd)


class E2EDetectLoss:
    """One-to-many + one-to-one loss pair for end2end heads (reference
    loss.py:162-177): the one2many branch trains with top-10 TAL assignment,
    the one2one branch with top-1 (each gt claims exactly one anchor, so
    inference needs only a top-k select — no NMS).

    __call__ takes the {"one2many": [maps], "one2one": [maps]} dict that
    Detect(end2end=True) returns and sums the two branch losses (totals and
    per-item vectors alike, loss.py:171-177)."""

    def __init__(self, nc: int, strides: Sequence[int], reg_max: int = 16, hyp=None):
        self.one2many = v8DetectionLoss(nc, strides, reg_max, hyp=hyp, tal_topk=10)
        self.one2one = v8DetectionLoss(nc, strides, reg_max, hyp=hyp, tal_topk=1)

    def __call__(self, preds, targets: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        total_m, items_m = self.one2many(preds["one2many"], targets)
        total_o, items_o = self.one2one(preds["one2one"], targets)
        return total_m + total_o, items_m + items_o
