"""Measure the cost of the scan-chain salt in the benchmark apparatus itself.

Every scan-chained timing loop in this repo serializes iterations by adding the
scalar carry to the INPUT IMAGES (`images + c`). XLA cannot fuse an elementwise
producer into a convolution operand, so at bs=128/640px/bf16 that add is a
materialized 314 MB pass (~628 MB extra HBM traffic ~= 2.3 ms at the measured
273 GB/s) charged to the model on every iteration -- measurement apparatus, not
workload.

Alternative: salt ALL param leaves (`tree.map(lambda w: w + c, params)`).
Serialization guarantee is identical -- every layer's weights depend on the
previous iteration's output, so no layer is loop-invariant and nothing can be
hoisted out of the scan -- but the extra traffic is the ~5 MB param tree.
(Salting a single deep leaf would NOT be safe: layers upstream of it would
become loop-invariant and XLA would hoist them, un-measuring them.)

Numerics: c ~ sum(dets)*1e-12 ~ 3e-5 is absorbed by bf16 weight rounding, so
the computed outputs are bit-identical; the data dependence is structural and
cannot be constant-folded at compile time.

Prints fwd-only and e2e (forward+decode+fused NMS) under both salting schemes.
Usage: python tools/salt_probe.py [bs] [iters]
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
    from yololite_tpu.ops.nms import nms_from_feats

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params_h, state_h = jax.device_put(cast(params)), jax.device_put(cast(state))
    images = jax.device_put(jnp.asarray(
        np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))

    def tail(feats):
        return jnp.sum(nms_from_feats(
            feats, model.strides, model.nc, model.reg_max, conf_thres=0.25,
            iou_thres=0.7, max_det=300, max_cand=300, half=True))

    def fwd_sum(feats):
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def body_imgsalt(p, s, x, c, reducer):
        feats = model.apply(p, s, x + c.astype(x.dtype), train=False)
        return reducer(feats)

    def body_wsalt(p, s, x, c, reducer):
        ps = jax.tree.map(lambda w: w + c.astype(w.dtype), p)
        feats = model.apply(ps, s, x, train=False)
        return reducer(feats)

    def timed(name, body, reducer):
        @jax.jit
        def loop(p, s, x, salt):
            def step(c, _):
                r = body(p, s, x, c, reducer)
                return (r * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(step, salt, None, length=iters)
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
    r["fwd_imgsalt"] = timed("fwd imgsalt", body_imgsalt, fwd_sum)
    r["fwd_wsalt"] = timed("fwd wsalt  ", body_wsalt, fwd_sum)
    r["e2e_imgsalt"] = timed("e2e imgsalt", body_imgsalt, tail)
    r["e2e_wsalt"] = timed("e2e wsalt  ", body_wsalt, tail)
    if r["e2e_imgsalt"] and r["e2e_wsalt"]:
        print(f"salt overhead: fwd {((r['fwd_imgsalt'] or 0) - (r['fwd_wsalt'] or 0)):.2f} ms, "
              f"e2e {r['e2e_imgsalt'] - r['e2e_wsalt']:.2f} ms "
              f"({(r['e2e_imgsalt'] / r['e2e_wsalt'] - 1) * 100:.1f}% of e2e)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
