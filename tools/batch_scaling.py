"""Batch-scaling anomaly probe (r5): the folded serving forward measured
19.64 ms at bs=64 vs 14.87 ms at bs=128 (train_profile vs tail_profile,
docs/r5_queue1_results.log) — 2.6x worse per image at the smaller batch, when
per-op rooflines scale ~linearly. This tool times the SAME folded bf16 forward
at a sweep of batch sizes with the chained-salt method, then (optionally) runs
the eager per-layer profiler at two batch sizes to localize which rows blow up.

Usage: python tools/batch_scaling.py [scale] [bs,bs,...] [--layers bs1,bs2]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(scale: str = "n", batches=(32, 64, 96, 128), layer_pair=None, iters: int = 30):
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform}) scale={scale}", flush=True)

    model = DetectionModel(f"yolo11{scale}.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    p_h, s_h = jax.device_put(cast(params)), jax.device_put(cast(state))

    def make_loop(bs):
        @jax.jit
        def loop(p, s, im, salt):
            def body(c, _):
                feats = model.apply(p, s, im + c.astype(im.dtype), train=False)
                return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12
                        ).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out
        return loop

    for bs in batches:
        images = jax.device_put(jnp.asarray(
            np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))
        loop = make_loop(bs)
        try:
            t0 = time.perf_counter()
            float(loop(p_h, s_h, images, jnp.float32(0)))
            tc = time.perf_counter() - t0
        except Exception as e:
            print(f"bs={bs}: {type(e).__name__}: {e}", flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(p_h, s_h, images, jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"fwd bs={bs:>4}: {ms:8.3f} ms/batch  {ms / bs * 1e3:7.1f} us/img "
              f"({bs / ms * 1e3:8.1f} img/s)  [compile+1 {tc:.0f}s]", flush=True)

    if layer_pair:
        for bs in layer_pair:
            print(f"--- per-layer profile bs={bs} ---", flush=True)
            images = jax.device_put(jnp.asarray(
                np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))
            # n_iter high: dispatches pipeline, so the ~34 ms relay RTT amortizes
            # to ~1.7 ms/layer — constant across batch sizes, cancels in the diff
            model.profile_layers(p_h, s_h, images, n_warmup=1, n_iter=20)


if __name__ == "__main__":
    a = sys.argv[1:]
    scale = a[0] if a else "n"
    batches = tuple(int(x) for x in a[1].split(",")) if len(a) > 1 else (32, 64, 96, 128)
    lp = None
    if "--layers" in a:
        lp = tuple(int(x) for x in a[a.index("--layers") + 1].split(","))
    main(scale, batches, lp)
