"""Split the v8 loss fwd+bwd cost into its components, on-chip (bs=64, 640px).

The r3/r4 decompositions say loss+TAL fwd+bwd is ~19 ms of the 89 ms bs=64 amp
step while being ~3% of its flops, and the r4 levers (bce custom-vjp, bf16
targets, assigner stop_gradient) measured ~0 e2e. This names the actual costs.
All stages run on random Detect maps (no model forward), grad taken w.r.t. the
FEATS (the cotangent the model backward consumes):

  floor       sum(feats) — scan-salt + read floor, subtract from everything
  assigner    TAL assignment forward only (stop_gradient semantics)
  bce         grad of sum BCE(pred_scores, fixed targets)   (B,A,80)
  decode      grad of sum dfl_expectation_mm (dense)        (B,A,64)->(B,A,4)
  dfl_ce      grad of sum _df_loss (dense)                  (B,A,64)
  ciou        grad of sum CIoU(decoded, fixed)              incl. decode
  full        grad of the shipped v8DetectionLoss
  cJ_*        compact-K variants of decode+ciou+dfl_ce on K=256 fg rows:
              cJ_tal   = take_along_axis row-gather of (K, 4R) logits
              cJ_oh    = one-hot (B,K,A) matmul gather
              (both then decode+CIoU+DFL-CE on the compact rows)

Timing: scan-chained through a scalar salt added to ALL feats; stage `floor`
measures the salt+read cost so deltas are honest. Usage: loss_profile.py [bs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(bs=64, iters=20):
    bs, iters = int(bs), int(iters)
    import os

    import jax

    if os.environ.get("LOSSPROFILE_CPU"):  # local shape/crash validation only
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yololite_tpu.ops.boxes import bbox2dist, bbox_iou, dist2bbox, make_anchors
    from yololite_tpu.ops.decode import dfl_expectation_mm, flatten_levels
    from yololite_tpu.utils.loss import build_targets, bce_sum, v8DetectionLoss
    from yololite_tpu.utils.tal import TaskAlignedAssigner

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    S, MG, R, NC = 640, 16, 16, 80
    strides = [8, 16, 32]
    shapes = [(S // s, S // s) for s in strides]
    A = sum(h * w for h, w in shapes)
    NO = NC + 4 * R
    loss_fn = v8DetectionLoss(NC, strides, R)
    assigner = TaskAlignedAssigner(topk=10, num_classes=NC, alpha=0.5, beta=6.0)

    rng = np.random.default_rng(0)
    feats = [jax.device_put(jnp.asarray(rng.normal(0, 1, (bs, h, w, NO)), jnp.bfloat16))
             for h, w in shapes]
    n_gt = 4
    batch = {
        "batch_idx": np.repeat(np.arange(bs, dtype=np.float32), n_gt),
        "cls": rng.integers(0, NC, (bs * n_gt, 1)).astype(np.float32),
        "bboxes": np.clip(rng.random((bs * n_gt, 4)).astype(np.float32) * 0.5 + 0.25, 0.05, 0.95),
    }
    t = build_targets(batch, bs, (S, S), MG)
    gl = jax.device_put(jnp.asarray(t["gt_labels"]))
    gb = jax.device_put(jnp.asarray(t["gt_bboxes"]))
    mg = jax.device_put(jnp.asarray(t["mask_gt"]))
    targets = {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg}

    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)
    # fixed dense "assignment products" so component stages skip the assigner
    tsc = jax.device_put(jnp.asarray(
        (rng.random((bs, A, NC)) < 0.002) * rng.random((bs, A, NC)), jnp.bfloat16))
    tbb = jax.device_put(jnp.asarray(
        rng.uniform(0, S, (bs, A, 4)).astype(np.float32)))  # pixels, unsorted is fine for cost
    fgm = jax.device_put(jnp.asarray(rng.random((bs, A)) < 0.02, jnp.bool_))
    K = 256

    def split(fs):
        x = flatten_levels(list(fs))
        return x[..., : 4 * R], x[..., 4 * R:]

    # ---------------- stages ----------------
    def floor(fs):
        return sum(jnp.sum(f.astype(jnp.float32)) for f in fs)

    def assigner_fwd(fs):
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        _, tb, ts, fg, _ = assigner(
            jax.nn.sigmoid(ps), (pb * stride_tensor).astype(gb.dtype),
            anchor_points * stride_tensor, gl, gb, mg)
        return jnp.sum(ts.astype(jnp.float32)) + jnp.sum(tb) + jnp.sum(fg)

    def tal_metrics_obj(fs):
        # assigner sub-stage: candidate mask + align-metric/CIoU grid only
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        am, ov = assigner._get_box_metrics(
            jax.nn.sigmoid(ps).astype(jnp.float32),
            (pb * stride_tensor).astype(gb.dtype), gl, gb,
            (jnp.ones((bs, MG, A), jnp.float32) * mg))
        return jnp.sum(am) + jnp.sum(ov)

    def tal_m_prep_obj(fs):
        # metric-prep only: sigmoid over (B,A,nc) + DFL decode to (B,A,4) —
        # the shared prefix of every metrics stage; tal_metrics minus this is
        # the true (B,M,A) grid cost
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        return jnp.sum(jax.nn.sigmoid(ps).astype(jnp.float32)) + jnp.sum(pb * stride_tensor)

    def tal_m_scores_obj(fs):
        # prep + one-hot class-score einsum grid only (no IoU)
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        s = jax.nn.sigmoid(ps).astype(jnp.float32)
        labels = gl.squeeze(-1).astype(jnp.int32).clip(0)
        oh = jax.nn.one_hot(labels, NC, dtype=s.dtype)
        bsc = jnp.einsum("bmc,bac->bma", oh, s, preferred_element_type=jnp.float32)
        return jnp.sum(bsc) + jnp.sum(pb * stride_tensor)

    def tal_m_iou_obj(fs):
        # prep + plain-IoU (B,M,A) grid (no CIoU extras, no einsum, no pow)
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False) * stride_tensor
        iou = bbox_iou(gb[:, :, None, :], pb[:, None, :, :].astype(jnp.float32),
                      xywh=False, CIoU=False)
        return jnp.sum(iou.clip(0)) + jnp.sum(jax.nn.sigmoid(ps).astype(jnp.float32))

    def tal_m_ciou_obj(fs):
        # prep + CIoU (B,M,A) grid (no einsum, no pow): CIoU-extras cost =
        # this minus tal_m_iou; grid-total = this minus tal_m_prep
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False) * stride_tensor
        iou = bbox_iou(gb[:, :, None, :], pb[:, None, :, :].astype(jnp.float32),
                      xywh=False, CIoU=True)
        return jnp.sum(iou.clip(0)) + jnp.sum(jax.nn.sigmoid(ps).astype(jnp.float32))

    def tal_topk_old_obj(fs):
        # metrics + hierarchical (value,index) top-k count mask (pre-r4 path)
        from yololite_tpu.utils.tal import topk_hierarchical

        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        am, _ = assigner._get_box_metrics(
            jax.nn.sigmoid(ps).astype(jnp.float32),
            (pb * stride_tensor).astype(gb.dtype), gl, gb,
            (jnp.ones((bs, MG, A), jnp.float32) * mg))
        _, idx = topk_hierarchical(am, assigner.topk)
        idx = jnp.where(mg > 0, idx, 0)
        count = (idx[..., None] == jnp.arange(A, dtype=idx.dtype)).sum(-2, dtype=jnp.int32)
        count = jnp.where(count > 1, 0, count)
        return jnp.sum(count.astype(jnp.float32) * am)

    def tal_topk_bg_obj(fs):
        # metrics + blockmax-gather top-k count mask (r4 flip candidate: the
        # full-width variadic block sorts collapse to a max-reduce + k-block gather)
        from yololite_tpu.utils.tal import topk_blockmax_gather

        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        am, _ = assigner._get_box_metrics(
            jax.nn.sigmoid(ps).astype(jnp.float32),
            (pb * stride_tensor).astype(gb.dtype), gl, gb,
            (jnp.ones((bs, MG, A), jnp.float32) * mg))
        _, idx = topk_blockmax_gather(am, assigner.topk)
        idx = jnp.where(mg > 0, idx, 0)
        count = (idx[..., None] == jnp.arange(A, dtype=idx.dtype)).sum(-2, dtype=jnp.int32)
        count = jnp.where(count > 1, 0, count)
        return jnp.sum(count.astype(jnp.float32) * am)

    def tal_metrics_pow_obj(fs):
        # A/B reference for the _pow_const expansion: epsilon-perturbed exponents
        # force the generic lax.pow (exp/log) lowering at identical traffic
        from yololite_tpu.utils.tal import TaskAlignedAssigner as TA

        powref = TA(topk=assigner.topk, num_classes=NC, alpha=0.5000001, beta=6.0000001)
        pd, ps = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        am, ov = powref._get_box_metrics(
            jax.nn.sigmoid(ps).astype(jnp.float32),
            (pb * stride_tensor).astype(gb.dtype), gl, gb,
            (jnp.ones((bs, MG, A), jnp.float32) * mg))
        return jnp.sum(am) + jnp.sum(ov)

    def bce_obj(fs):
        _, ps = split(fs)
        return bce_sum(ps, tsc)

    def decode_obj(fs):
        pd, _ = split(fs)
        return jnp.sum(dfl_expectation_mm(pd, R))

    def decode_ad_obj(fs):  # autodiff-backward A/B reference
        from yololite_tpu.ops.decode import dfl_expectation_mm_ad

        pd, _ = split(fs)
        return jnp.sum(dfl_expectation_mm_ad(pd, R))

    def dflce_obj(fs):
        pd, _ = split(fs)
        tl = bbox2dist(anchor_points, tbb / stride_tensor, R - 1)
        return jnp.sum(loss_fn._df_loss(pd, tl))

    def dflce_ad_obj(fs):  # autodiff-backward A/B reference
        pd, _ = split(fs)
        tl = bbox2dist(anchor_points, tbb / stride_tensor, R - 1)
        return jnp.sum(loss_fn._df_loss_autodiff(pd, tl))

    def ciou_obj(fs):
        pd, _ = split(fs)
        pb = dist2bbox(dfl_expectation_mm(pd, R), anchor_points, xywh=False)
        iou = bbox_iou(pb, tbb / stride_tensor, xywh=False, CIoU=True)
        return jnp.sum((1.0 - iou) * fgm.astype(jnp.float32))

    def full_obj(fs):
        import yololite_tpu.utils.loss as loss_mod

        loss_mod.COMPACT_BOX_LOSS = False  # trace-time constant; stage re-traces
        total, _ = loss_fn(list(fs), targets)
        return total

    def full_compact_obj(fs):
        import yololite_tpu.utils.loss as loss_mod

        loss_mod.COMPACT_BOX_LOSS = True
        total, _ = loss_fn(list(fs), targets)
        return total

    def _compact(pd, idx):
        a_fg = anchor_points[idx]              # (B,K,2) narrow
        st_fg = stride_tensor[idx]             # (B,K,1) narrow
        tb_fg = jnp.take_along_axis(tbb, idx[..., None], axis=1) / st_fg
        pb = dist2bbox(dfl_expectation_mm(pd, R), a_fg, xywh=False)
        iou = bbox_iou(pb, tb_fg, xywh=False, CIoU=True)
        tl = bbox2dist(a_fg, tb_fg, R - 1)
        df = loss_fn._df_loss(pd, tl)
        return jnp.sum((1.0 - iou)) + jnp.sum(df)

    def cJ_tal_obj(fs):
        pd, _ = split(fs)
        idx = jax.lax.top_k(fgm.astype(jnp.float32), K)[1]  # (B,K)
        pd_fg = jnp.take_along_axis(pd, idx[..., None], axis=1)  # wide row-gather
        return _compact(pd_fg, idx)

    def cJ_oh_obj(fs):
        pd, _ = split(fs)
        idx = jax.lax.top_k(fgm.astype(jnp.float32), K)[1]
        oh = jax.nn.one_hot(idx, A, dtype=pd.dtype)  # (B,K,A)
        pd_fg = jnp.einsum("bka,bar->bkr", oh, pd)
        return _compact(pd_fg, idx)

    def cJ_blk_obj(fs):
        from yololite_tpu.ops.decode import take_rows_blocked

        pd, _ = split(fs)
        idx = jax.lax.top_k(fgm.astype(jnp.float32), K)[1]
        pd_fg = take_rows_blocked(pd, idx, 16)  # two-level one-hot gather
        return _compact(pd_fg, idx)

    # ---------------- timing ----------------
    def timed(name, obj, grad=True):
        @jax.jit
        def loop(f0, f1, f2, salt):
            def body(c, _):
                fs = tuple(f + c.astype(f.dtype) for f in (f0, f1, f2))
                if grad:
                    gs = jax.grad(lambda *g: obj(g).astype(jnp.float32), argnums=(0, 1, 2))(*fs)
                    r = sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) for g in gs)
                else:
                    r = obj(fs).astype(jnp.float32)
                return (r * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        try:
            t0 = time.perf_counter()
            float(loop(*feats, jnp.float32(0)))
            tc = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(*feats, jnp.float32(0)))
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            print(f"{name:>10}: {best:7.2f} ms  [compile+1 {tc:.0f}s]", flush=True)
            return best
        except Exception as e:
            print(f"{name:>10}: {type(e).__name__}: {str(e)[:250]}", flush=True)
            return None

    stages = {
        "floor": (floor, False),
        "assigner": (assigner_fwd, False),
        "tal_metrics": (tal_metrics_obj, False),
        "tal_m_prep": (tal_m_prep_obj, False),
        "tal_m_scores": (tal_m_scores_obj, False),
        "tal_m_iou": (tal_m_iou_obj, False),
        "tal_m_ciou": (tal_m_ciou_obj, False),
        "tal_topk_old": (tal_topk_old_obj, False),
        "tal_topk_bg": (tal_topk_bg_obj, False),
        "tal_metrics_pow": (tal_metrics_pow_obj, False),
        "bce": (bce_obj, True),
        "decode": (decode_obj, True),
        "decode_ad": (decode_ad_obj, True),
        "dfl_ce": (dflce_obj, True),
        "dfl_ce_ad": (dflce_ad_obj, True),
        "ciou": (ciou_obj, True),
        "full": (full_obj, True),
        "full_compact": (full_compact_obj, True),
        "cJ_tal": (cJ_tal_obj, True),
        "cJ_oh": (cJ_oh_obj, True),
        "cJ_blk": (cJ_blk_obj, True),
    }
    only = os.environ.get("LOSSPROFILE_STAGES")  # comma-separated subset
    pick = set(s.strip() for s in only.split(",")) if only else set(stages)
    pick.add("floor")  # deltas need the floor
    r = {}
    for name, (obj, grad) in stages.items():
        if name in pick:
            r[name] = timed(name, obj, grad=grad)
    fl = r.get("floor") or 0.0
    print("\ndeltas over floor (ms):", flush=True)
    for k, v in r.items():
        if v is not None and k != "floor":
            print(f"  {k:>10}: {v - fl:7.2f}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
