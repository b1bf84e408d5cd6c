"""Benchmark: batched 640px yolo11n inference (forward + decode + NMS) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The reference
publishes no throughput numbers (BASELINE.md), so vs_baseline reports the
achieved fraction of the bf16 compute-bound speed-of-light for this chip
(yolo11n = 6.6 GFLOPs/img -> ~29.8k img/s at 197 bf16 TFLOP/s, BASELINE.md:27).

Measurement notes: the sandbox TPU sits behind a TCP relay where
block_until_ready can return before execution completes, so each iteration is
data-chained through a scalar salt and the chain is forced by one scalar fetch
-- every kernel must actually run on-chip before the timer stops.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import non_max_suppression

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    from yololite_tpu.models.modules import fuse_tree

    params, state = fuse_tree(params, state)  # fold BN (inference path)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params_h = jax.device_put(cast(params))
    state_h = jax.device_put(cast(state))

    ITERS = 20

    def make_loop(images):
        @jax.jit
        def loop(images, salt):
            def body(c, _):
                feats = model.apply(params_h, state_h, images + c.astype(images.dtype), train=False)
                # bf16 scores through decode+NMS (boxes fp32 for IoU accuracy)
                boxes, scores = decode_detections(feats, model.strides, model.nc, model.reg_max, xywh=False)
                dets = non_max_suppression(boxes.astype(jnp.float32), scores, conf_thres=0.25, iou_thres=0.7,
                                           max_det=300, max_cand=512)
                return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=ITERS)
            return out

        return loop

    best, best_bs = 0.0, 0
    for bs in (64, 128):
        images = jax.device_put(jnp.asarray(np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))
        loop = make_loop(images)
        try:
            float(loop(images, jnp.float32(0)))  # compile + 1 real run of the whole chain
        except Exception as e:
            print(f"bs={bs}: {type(e).__name__}: {e}", file=sys.stderr)
            break
        rate = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(loop(images, jnp.float32(0)))  # scan forces ITERS real executions
            dt = time.perf_counter() - t0
            rate = max(rate, bs * ITERS / dt)
        print(f"bs={bs}: {rate:.1f} img/s", file=sys.stderr)
        if rate > best:
            best, best_bs = rate, bs

    sol = 197e12 / 6.6e9  # ~29.8k img/s compute-bound upper bound
    print(
        json.dumps(
            {
                "metric": f"yolo11n 640px batched inference images/sec/chip (bs={best_bs}, incl. on-device NMS)",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / sol, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
