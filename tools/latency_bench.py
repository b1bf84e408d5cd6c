"""Per-batch device latency for the serving graph (forward + decode + NMS).

BASELINE.json names "sustained stream inference: fixed p50 latency" as a target;
this tool records the device-side per-batch latency at small batch sizes.

Measurement: the sandbox TPU sits behind a TCP relay with ~34 ms round-trip
latency, so a naive dispatch-and-fetch measures the tunnel, not the chip. Each
configuration therefore chains N iterations through a scalar data dependency
inside one jit (docs/PERF.md) and reports wall/N as the per-batch device
latency; host->device upload and the relay RTT are excluded by construction.

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
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import non_max_suppression

    model = DetectionModel(f"yolo11{scale}.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params_h, state_h = jax.device_put(cast(params)), jax.device_put(cast(state))

    for bs in (1, 4, 8, 16):
        images = jax.device_put(jnp.asarray(np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))
        iters = 50

        @jax.jit
        def loop(p, s, im, salt):
            def body(c, _):
                feats = model.apply(p, s, im + c.astype(im.dtype), train=False)
                b, sc = decode_detections(feats, model.strides, model.nc, model.reg_max, xywh=False)
                d = non_max_suppression(b.astype(jnp.float32), sc, conf_thres=0.25, iou_thres=0.7,
                                        max_det=300, max_cand=512)
                return (jnp.sum(d) * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        float(loop(params_h, state_h, images, jnp.float32(0)))  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(params_h, state_h, images, jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"yolo11{scale} bs={bs:>2}: {ms:6.2f} ms/batch device latency "
              f"({ms / bs:5.2f} ms/img, {bs / best * iters:7.1f} img/s)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
