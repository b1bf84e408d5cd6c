"""Decompose the predict-path tail (select-first NMS) at the headline shape.

e2e at bs=128 is ~16.4 ms vs forward-only ~14.5 ms (docs/PERF.md round 3);
this splits the ~1.9 ms tail into its pipeline stages to direct the 0.45-SoL
push now that the stem program is closed (round-4 verdicts):

Round-4 queue5 form: A/B the full pipeline under each candidate-logit gather
mode (nms.GATHER_MODE) — dfl_all (decode-all + narrow gather), ohg (flat
one-hot matmul), blocked (two-level one-hot, block 8/16/32) — plus the fwd
and +select reference stages. All modes emit bit-identical detections
(tests/test_ops.py::test_nms_from_feats_gather_modes_identical); the fastest
one becomes the default. Queue3's stage decomposition (fwd/+select/+dfl_all/
+gather/full/alt_ohg) is preserved as unused stage fns for manual runs.

Scan-chained timing (docs/PERF.md). Usage: python tools/tail_profile.py [bs] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(bs=128, iters=20):
    bs, iters = int(bs), int(iters)
    import os

    import jax

    if os.environ.get("TAILPROFILE_CPU"):  # local shape/crash validation only
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.decode import dfl_expectation_mm

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params_h, state_h = jax.device_put(cast(params)), jax.device_put(cast(state))
    images = jax.device_put(jnp.asarray(
        np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))

    nc, reg_max, strides = model.nc, model.reg_max, model.strides
    conf_thres, iou_thres, K, max_det = 0.25, 0.7, 300, 300

    def select(feats):
        B = feats[0].shape[0]
        vs, ids, clss = [], [], []
        off = 0
        for f in feats:
            s_full = jax.nn.sigmoid(f[..., 4 * reg_max:])
            s = jnp.max(s_full, axis=-1).reshape(B, -1)
            clss.append(jnp.argmax(s_full, axis=-1).reshape(B, -1))
            v, i = jax.lax.top_k(jnp.where(s > conf_thres, s, -1.0), min(K, s.shape[1]))
            vs.append(v)
            ids.append(i + off)
            off += s.shape[1]
        vals, j = jax.lax.top_k(jnp.concatenate(vs, axis=1), K)
        bidx = jnp.take_along_axis(jnp.concatenate(ids, axis=1), j, axis=1)
        cls_all = jnp.concatenate(clss, axis=1).astype(jnp.float32)
        return vals, bidx, cls_all

    def stage_fwd(p, s, x):
        feats = model.apply(p, s, x, train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def stage_select(p, s, x):
        feats = model.apply(p, s, x, train=False)
        vals, bidx, _ = select(feats)
        return jnp.sum(vals.astype(jnp.float32)) + jnp.sum(bidx)

    def stage_dfl_all(p, s, x):
        feats = model.apply(p, s, x, train=False)
        vals, bidx, _ = select(feats)
        B = x.shape[0]
        box_logits = jnp.concatenate(
            [f[..., : 4 * reg_max].reshape(B, -1, 4 * reg_max) for f in feats], axis=1)
        dist_all = dfl_expectation_mm(box_logits, reg_max)
        return jnp.sum(vals.astype(jnp.float32)) + jnp.sum(dist_all)

    def stage_gather(p, s, x):
        feats = model.apply(p, s, x, train=False)
        vals, bidx, cls_all = select(feats)
        B = x.shape[0]
        box_logits = jnp.concatenate(
            [f[..., : 4 * reg_max].reshape(B, -1, 4 * reg_max) for f in feats], axis=1)
        dist_all = dfl_expectation_mm(box_logits, reg_max)
        dist = jax.vmap(lambda d, i: d[i])(dist_all, bidx)
        cls_k = jax.vmap(lambda c, i: c[i])(cls_all, bidx)
        return jnp.sum(dist) + jnp.sum(cls_k) + jnp.sum(vals.astype(jnp.float32))

    def _full_with_mode(gm, blk=16):
        def fn(p, s, x):
            from yololite_tpu.ops import nms as nms_mod
            from yololite_tpu.ops.nms import nms_from_feats

            nms_mod.GATHER_MODE = gm  # trace-time constant; each stage re-traces
            nms_mod.GATHER_BLOCK = blk
            feats = model.apply(p, s, x, train=False)
            return jnp.sum(nms_from_feats(
                feats, strides, nc, reg_max, conf_thres=conf_thres, iou_thres=iou_thres,
                max_det=max_det, max_cand=K, half=True))

        return fn

    stage_full = _full_with_mode("dfl_all")

    def _decode_no_suppress(p, s, x):
        # everything up to cand_boxes/valid (blocked@8 gather) — NO suppression
        # or finalize. full_blk8 minus this = the suppression+finalize cost.
        from yololite_tpu.ops.decode import take_rows_blocked

        feats = model.apply(p, s, x, train=False)
        vals, bidx, cls_all = select(feats)
        B = x.shape[0]
        box_logits = jnp.concatenate(
            [f[..., : 4 * reg_max].reshape(B, -1, 4 * reg_max) for f in feats], axis=1)
        cand_logits = take_rows_blocked(box_logits, bidx, 8)
        dist = dfl_expectation_mm(cand_logits, reg_max)
        cls_k = take_rows_blocked(cls_all[..., None], bidx, 8)[..., 0]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        offs, Ws, Ss, o = [], [], [], 0
        for (h, w), s_ in zip(shapes, strides):
            offs.append(o); Ws.append(w); Ss.append(int(s_)); o += h * w
        lvl = jnp.zeros_like(bidx)
        for i in range(1, len(offs)):
            lvl = jnp.where(bidx >= offs[i], i, lvl)
        off_l = sum(jnp.where(lvl == i, offs[i], 0) for i in range(len(offs)))
        W_l = sum(jnp.where(lvl == i, Ws[i], 0) for i in range(len(offs)))
        S_l = sum(jnp.where(lvl == i, Ss[i], 0) for i in range(len(offs))).astype(jnp.float32)
        local = bidx - off_l
        ax = (local % W_l).astype(jnp.float32) + 0.5
        ay = (local // W_l).astype(jnp.float32) + 0.5
        cand_boxes = jnp.stack(
            [(ax - dist[..., 0]) * S_l, (ay - dist[..., 1]) * S_l,
             (ax + dist[..., 2]) * S_l, (ay + dist[..., 3]) * S_l], axis=-1)
        return (jnp.sum(cand_boxes) + jnp.sum(cls_k)
                + jnp.sum(vals.astype(jnp.float32)))

    def _full_suppress_variant(keep_fn_name):
        # full blocked@8 pipeline with the suppression swapped (scan = per-image
        # chunked serial greedy; fast = one-sweep matrix NMS, the suppression
        # cost floor — NOT exact, measurement only)
        def fn(p, s, x):
            from yololite_tpu.ops import nms as nms_mod

            feats = model.apply(p, s, x, train=False)
            old = nms_mod._fixpoint_keep
            old_gather = (nms_mod.GATHER_MODE, nms_mod.GATHER_BLOCK)
            if keep_fn_name == "scan":
                import functools as ft

                nms_mod._fixpoint_keep = lambda sh, va, th: jax.vmap(
                    ft.partial(nms_mod._greedy_keep, iou_thres=th))(sh, va)
            try:
                nms_mod.GATHER_MODE, nms_mod.GATHER_BLOCK = "blocked", 8
                out = nms_mod.nms_from_feats(
                    feats, strides, nc, reg_max, conf_thres=conf_thres,
                    iou_thres=iou_thres, max_det=max_det, max_cand=K, half=True,
                    mode="fast" if keep_fn_name == "fast" else "greedy")
            finally:
                nms_mod._fixpoint_keep = old
                nms_mod.GATHER_MODE, nms_mod.GATHER_BLOCK = old_gather
            return jnp.sum(out)

        return fn

    def stage_alt_ohg(p, s, x):
        feats = model.apply(p, s, x, train=False)
        vals, bidx, cls_all = select(feats)
        B = x.shape[0]
        box_logits = jnp.concatenate(
            [f[..., : 4 * reg_max].reshape(B, -1, 4 * reg_max) for f in feats], axis=1)
        A = box_logits.shape[1]
        # one-hot (K, A) @ (A, 4R) on the MXU instead of DFL-all + narrow gather
        oh = jax.nn.one_hot(bidx, A, dtype=box_logits.dtype)  # (B, K, A)
        cand_logits = jnp.einsum("bka,bar->bkr", oh, box_logits)
        dist = dfl_expectation_mm(cand_logits, reg_max)  # (B, K, 4)
        cls_k = jax.vmap(lambda c, i: c[i])(cls_all, bidx)
        return jnp.sum(dist) + jnp.sum(cls_k) + jnp.sum(vals.astype(jnp.float32))

    def timed(name, fn):
        @jax.jit
        def loop(p, s, x, salt):
            def body(c, _):
                r = fn(p, s, x + c.astype(x.dtype))
                return (r * 1e-9).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        try:
            t0 = time.perf_counter()
            float(loop(params_h, state_h, images, jnp.float32(0)))
            print(f"{name}: compile+1 {time.perf_counter() - t0:.0f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(params_h, state_h, images, jnp.float32(0)))
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            print(f"{name}: {best:.2f} ms/batch ({bs / best * 1e3:.1f} img/s)", flush=True)
            return best
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
            return None

    all_stages = (("full_dflall", stage_full),
                  ("full_ohg", _full_with_mode("ohg")),
                  ("full_blk8", _full_with_mode("blocked", 8)),
                  ("full_blk16", _full_with_mode("blocked", 16)),
                  ("full_blk4", _full_with_mode("blocked", 4)),
                  ("full_blk2", _full_with_mode("blocked", 2)),
                  ("full_blk32", _full_with_mode("blocked", 32)),
                  ("fwd", stage_fwd), ("+select", stage_select),
                  ("+decode_blk8", _decode_no_suppress),
                  ("full_suppscan", _full_suppress_variant("scan")),
                  ("full_suppfast", _full_suppress_variant("fast")))
    only = os.environ.get("TAILPROFILE_STAGES")
    pick = set(s.strip() for s in only.split(",")) if only else None
    r = {}
    for name, fn in all_stages:
        if pick is None or name in pick:
            r[name] = timed(name, fn)
    fulls = [(v, k) for k, v in r.items() if v and k.startswith("full")]
    if fulls:
        best = min(fulls)
        print(f"fastest full pipeline: {best[1]} at {best[0]:.2f} ms/batch "
              f"({bs / best[0] * 1e3:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
