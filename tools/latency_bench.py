"""Per-batch device latency of the shipped serving graph at small batch.

DECIDED (docs/r4_latency_results.log, Aug 19): serve mode (approx_max_k +
Fast-NMS) won <=2% at bs=1 and was within noise at bs>=4 while losing at
bs=128 throughput — deleted per the flip rule. This tool now reports the
per-batch latency of the one shipped pipeline (exact greedy select-first),
covering BASELINE.json's "sustained stream inference: fixed p50 latency".

Measurement: the sandbox TPU sits behind a TCP relay with ~34 ms round-trip
latency, so a naive dispatch-and-fetch measures the tunnel, not the chip. Each
configuration chains N iterations through a scalar data dependency inside one
jit (docs/PERF.md) and reports wall/N as the per-batch device latency.

Usage: python tools/latency_bench.py [scale]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(scale: str = "n"):
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.nms import nms_from_feats

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    model = DetectionModel(f"yolo11{scale}.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params_h, state_h = jax.device_put(cast(params)), jax.device_put(cast(state))

    def timed(bs: int, mode: str, iters: int = 50):
        images = jax.device_put(
            jnp.asarray(np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))

        @jax.jit
        def loop(p, s, im, salt):
            def body(c, _):
                feats = model.apply(p, s, im + c.astype(im.dtype), train=False)
                d = nms_from_feats(feats, model.strides, model.nc, model.reg_max,
                                   conf_thres=0.25, iou_thres=0.7, max_det=300,
                                   max_cand=300, mode=mode, half=True)
                return (jnp.sum(d) * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        float(loop(params_h, state_h, images, jnp.float32(0)))  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(params_h, state_h, images, jnp.float32(0)))
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    print(f"{'bs':>4} {'ms/batch':>10} {'ms/img':>10}", flush=True)
    for bs in (1, 4, 8, 16):
        g = timed(bs, "greedy")
        print(f"{bs:>4} {g:>10.3f} {g / bs:>10.3f}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
