"""Benchmark: batched 640px yolo11n/m inference (forward + decode + NMS) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}. The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline reports the
achieved fraction of the bf16 compute-bound speed-of-light for the NOMINAL v5e spec
(yolo11n = 6.6 GFLOPs/img -> ~29.8k img/s at 197 bf16 TFLOP/s, BASELINE.md:27).

Device reality check (measured on this tunnel chip, see docs/PERF.md): peak dense
matmul = ~124.5 bf16 TFLOP/s (not 197), HBM ~273 GB/s (not ~820). The model is
HBM-bandwidth-bound; extra JSON keys report the fraction of the MEASURED device
ceiling so progress is separable from the nominal-spec gap.

Measurement notes: the sandbox TPU sits behind a TCP relay where block_until_ready
can return before execution completes, so each iteration is data-chained through a
scalar salt and the chain is forced by one scalar fetch -- every kernel must
actually run on-chip before the timer stops.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NOMINAL_TFLOPS = 197e12
MEASURED_TFLOPS = 124.5e12  # 8192^3 bf16 matmul on this chip (docs/PERF.md)
GFLOPS = {"n": 6.6e9, "m": 68.5e9}  # model spec, reference cfg/yolo11.yaml:8-10


def bench_scale(scale: str, batches, iters: int = 20, int8: bool = False):
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import non_max_suppression

    model = DetectionModel(f"yolo11{scale}.yaml")
    params, state = model.init(0)
    if int8:  # quantized serving path (per-channel weights + calibrated activations)
        from yololite_tpu.models.quant import quantize_model

        calib = [np.random.default_rng(1).random((2, 640, 640, 3), np.float32)]
        params, state, _ = quantize_model(model, params, state, calib)
        params_h = jax.device_put(params)
        state_h = jax.device_put(state)
    else:
        params, state = fuse_tree(params, state)  # fold BN (inference path)
        cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        params_h = jax.device_put(cast(params))
        state_h = jax.device_put(cast(state))

    @jax.jit
    def loop(params, state, images, salt):
        def body(c, _):
            feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
            # bf16 scores through decode+NMS (boxes fp32 for IoU accuracy)
            boxes, scores = decode_detections(feats, model.strides, model.nc, model.reg_max, xywh=False)
            dets = non_max_suppression(boxes.astype(jnp.float32), scores, conf_thres=0.25, iou_thres=0.7,
                                       max_det=300, max_cand=512)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    best, best_bs = 0.0, 0
    for bs in batches:
        images = jax.device_put(jnp.asarray(np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))
        try:
            float(loop(params_h, state_h, images, jnp.float32(0)))  # compile + 1 run of the chain
        except Exception as e:
            print(f"yolo11{scale} bs={bs}: {type(e).__name__}: {e}", file=sys.stderr)
            break
        rate = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            _ = float(loop(params_h, state_h, images, jnp.float32(0)))  # scan forces iters executions
            dt = time.perf_counter() - t0
            rate = max(rate, bs * iters / dt)
        print(f"yolo11{scale} bs={bs}: {rate:.1f} img/s", file=sys.stderr)
        if rate > best:
            best, best_bs = rate, bs
    return best, best_bs


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)

    rate_n, bs_n = bench_scale("n", (64, 128))
    rate_m, bs_m = bench_scale("m", (32, 64))
    rate_m8, _ = bench_scale("m", (64,), int8=True)
    print(f"yolo11m int8 serve: {rate_m8:.1f} img/s", file=sys.stderr)

    sol_n = NOMINAL_TFLOPS / GFLOPS["n"]  # ~29.8k img/s nominal-spec bound
    dev_sol_n = MEASURED_TFLOPS / GFLOPS["n"]
    dev_sol_m = MEASURED_TFLOPS / GFLOPS["m"]
    mfu_m = rate_m * GFLOPS["m"] / MEASURED_TFLOPS
    print(
        f"measured-device SoL fractions: n={rate_n / dev_sol_n:.3f} m={rate_m / dev_sol_m:.3f} "
        f"(m-scale MFU {mfu_m * 100:.1f}% of measured peak)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"yolo11n 640px batched inference images/sec/chip (bs={bs_n}, incl. on-device NMS)",
                "value": round(rate_n, 1),
                "unit": "img/s",
                "vs_baseline": round(rate_n / sol_n, 4),
                "vs_measured_device_sol": round(rate_n / dev_sol_n, 4),
                "yolo11m_img_s": round(rate_m, 1),
                "yolo11m_bs": bs_m,
                "yolo11m_vs_measured_device_sol": round(rate_m / dev_sol_m, 4),
                "yolo11m_int8_img_s": round(rate_m8, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
