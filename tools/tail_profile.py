"""Decompose the predict-path tail (select-first NMS) at the headline shape.

e2e at bs=128 is ~16.4 ms vs forward-only ~14.5 ms (docs/PERF.md round 3);
this splits the ~1.9 ms tail into its pipeline stages to direct the 0.45-SoL
push now that the stem program is closed (round-4 verdicts):

  fwd          model.apply only
  +select      + per-level sigmoid/max/top-k + merge     (nms_from_feats 1+2)
  +dfl_all     + DFL expectation over ALL anchors        (step 3a)
  +gather      + narrow gathers + arithmetic anchors     (steps 3b+4)
  full         + fixpoint suppression + finalize         (step 5)
  alt_ohg      variant: one-hot-matmul gather of the (K, 4R) candidate box
               logits + DFL on K rows only (replaces dfl_all; the wide row
               gather is the known TPU pathology — the MXU form may not be)

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
    import jax
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

    def stage_full(p, s, x):
        from yololite_tpu.ops.nms import nms_from_feats

        feats = model.apply(p, s, x, train=False)
        return jnp.sum(nms_from_feats(
            feats, strides, nc, reg_max, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, max_cand=K, half=True))

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

    r = {}
    for name, fn in (("fwd", stage_fwd), ("+select", stage_select),
                     ("+dfl_all", stage_dfl_all), ("+gather", stage_gather),
                     ("full", stage_full), ("alt_ohg", stage_alt_ohg)):
        r[name] = timed(name, fn)
    if all(r.get(k) for k in ("fwd", "+select", "+dfl_all", "+gather", "full")):
        print(f"deltas: select {r['+select'] - r['fwd']:.2f} | dfl_all "
              f"{r['+dfl_all'] - r['+select']:.2f} | gather {r['+gather'] - r['+dfl_all']:.2f} | "
              f"suppress+finalize {r['full'] - r['+gather']:.2f}", flush=True)
    if r.get("alt_ohg") and r.get("+gather"):
        print(f"alt one-hot-gather vs dfl_all+gather: {r['alt_ohg']:.2f} vs {r['+gather']:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
