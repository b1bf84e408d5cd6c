"""Bisect the m-scale int8 serving speedup (VERDICT r4 weak #2 / next #4).

BENCH_r04: yolo11m bf16 1,342.6 img/s vs int8 1,940.6 img/s = 1.45x, when the
int8 MXU rate is ~2x and the model is claimed bandwidth-bound. This tool splits
the gap into: the NMS/decode tail (identical in both paths, dilutes the ratio),
the bf16 attention island (SPPF+C2PSA, layers 9-10, never quantized), the pure
conv backbone (layers 0-8, fully int8), and a conv microbenchmark establishing
the achievable int8/bf16 conv ratio on this chip through XLA.

Stages (each a salt-chained in-jit loop, wall/iters; relay constant ~30 ms is
<2% at iters=40):
  conv_micro_{bf16,int8}  one 3x3 conv (64,80,80,128)x(3,3,128,256), the
                          dominant conv shape class at m
  prefix9_{bf16,int8}     rows 0-8: the pure quantized conv backbone
  prefix11_{bf16,int8}    rows 0-10: + SPPF + C2PSA (the bf16 island)
  fwd_{bf16,int8}         full forward, no decode/NMS
  e2e_{bf16,int8}         forward + nms_from_feats (the BENCH graph)

Usage: python tools/int8_profile.py [scale] [bs]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(scale: str = "m", bs: int = 64, iters: int = 40):
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models import modules as M
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.models.quant import quantize_model
    from yololite_tpu.ops.nms import nms_from_feats

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform}) scale={scale} bs={bs}", flush=True)

    model = DetectionModel(f"yolo11{scale}.yaml")
    params, state = model.init(0)

    calib = [np.random.default_rng(1).random((2, 640, 640, 3), np.float32)]
    qparams, qstate, _ = quantize_model(model, params, state, calib)
    qparams, qstate = jax.device_put(qparams), jax.device_put(qstate)

    fparams, fstate = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    bparams, bstate = jax.device_put(cast(fparams)), jax.device_put(cast(fstate))

    images = jax.device_put(jnp.asarray(
        np.random.default_rng(0).random((bs, 640, 640, 3)), jnp.bfloat16))

    def run_prefix(p, s, x, n):
        """model.apply over rows[:n] (mirrors DetectionModel.apply)."""
        ctx = M.Ctx(train=False)
        saved, y = {}, x
        for row in model.rows[:n]:
            inp = (y if row.f == -1 else saved[row.f]) if isinstance(row.f, int) \
                else [y if j == -1 else saved[j] for j in row.f]
            k = str(row.i)
            y = row.mod(p.get(k, {}), s.get(k, {}), inp, ctx, (k,))
            if row.i in model.save:
                saved[row.i] = y
        if isinstance(y, (list, tuple)):
            return sum(jnp.sum(t.astype(jnp.float32)) for t in y)
        return jnp.sum(y.astype(jnp.float32))

    def timed(label, make_body):
        @jax.jit
        def loop(p, s, im, salt):
            def body(c, _):
                out = make_body(p, s, im + c.astype(im.dtype))
                return (out * 1e-12).astype(jnp.float32), None
            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        # stage params picked up lexically; p/s passed per-stage via closure
        return loop

    def run_stage(label, body, p, s):
        loop = timed(label, body)
        try:
            float(loop(p, s, images, jnp.float32(0)))  # compile + warm
        except Exception as e:
            print(f"{label}: {type(e).__name__}: {e}", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(p, s, images, jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"{label:<16} {ms:8.3f} ms/batch  ({bs / ms * 1e3:9.1f} img/s)", flush=True)
        return ms

    results = {}

    # conv microbenchmark: int8/bf16 achievable ratio through XLA on this chip
    w_b = jax.device_put(jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 3, 128, 256)) * 0.05, jnp.bfloat16))
    w_q = jax.device_put(jnp.clip(
        jnp.round(w_b.astype(jnp.float32) / 4e-3), -127, 127).astype(jnp.int8))
    xin = jax.device_put(jnp.asarray(
        np.random.default_rng(3).random((bs, 80, 80, 128)), jnp.bfloat16))

    @jax.jit
    def conv_bf16_loop(w, x, salt):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                x + c.astype(x.dtype), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    @jax.jit
    def conv_int8_loop(w, x, salt):
        def body(c, _):
            xi = jnp.clip(jnp.round((x + c.astype(x.dtype)).astype(jnp.float32) / 8e-3),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xi, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(jnp.float32), None
        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    for label, loop, w, x in (("conv_micro_bf16", conv_bf16_loop, w_b, xin),
                              ("conv_micro_int8", conv_int8_loop, w_q, xin)):
        try:
            float(loop(w, x, jnp.float32(0)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(w, x, jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            ms = best / iters * 1e3
            gflop = 2 * bs * 80 * 80 * 128 * 256 * 9 / 1e9
            print(f"{label:<16} {ms:8.3f} ms  ({gflop / ms:8.1f} TFLOP/s-equivalent)", flush=True)
            results[label] = ms
        except Exception as e:
            print(f"{label}: {type(e).__name__}: {e}", flush=True)

    n_pre = 9   # rows 0-8: conv backbone before SPPF(9)/C2PSA(10)
    n_isl = 11  # + SPPF + C2PSA bf16 island
    stages = [
        ("prefix9_bf16", lambda p, s, x: run_prefix(p, s, x, n_pre), bparams, bstate),
        ("prefix9_int8", lambda p, s, x: run_prefix(p, s, x, n_pre), qparams, qstate),
        ("prefix11_bf16", lambda p, s, x: run_prefix(p, s, x, n_isl), bparams, bstate),
        ("prefix11_int8", lambda p, s, x: run_prefix(p, s, x, n_isl), qparams, qstate),
        ("fwd_bf16", lambda p, s, x: run_prefix(p, s, x, len(model.rows)), bparams, bstate),
        ("fwd_int8", lambda p, s, x: run_prefix(p, s, x, len(model.rows)), qparams, qstate),
    ]

    def e2e_body(p, s, x):
        feats = model.apply(p, s, x, train=False)
        dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max,
                              conf_thres=0.25, iou_thres=0.7, max_det=300,
                              max_cand=300, mode="greedy", half=True)
        return jnp.sum(dets)

    stages += [("e2e_bf16", e2e_body, bparams, bstate),
               ("e2e_int8", e2e_body, qparams, qstate)]

    for label, body, p, s in stages:
        ms = run_stage(label, body, p, s)
        if ms is not None:
            results[label] = ms

    def ratio(a, b):
        return results[a] / results[b] if a in results and b in results else float("nan")

    print("--- analysis ---", flush=True)
    print(f"conv micro int8 speedup:      {ratio('conv_micro_bf16', 'conv_micro_int8'):.3f}x", flush=True)
    print(f"backbone (rows 0-8) speedup:  {ratio('prefix9_bf16', 'prefix9_int8'):.3f}x", flush=True)
    if all(k in results for k in ("prefix11_bf16", "prefix9_bf16", "prefix11_int8", "prefix9_int8")):
        isl_b = results["prefix11_bf16"] - results["prefix9_bf16"]
        isl_q = results["prefix11_int8"] - results["prefix9_int8"]
        print(f"SPPF+C2PSA island: bf16 {isl_b:.3f} ms vs int8-path {isl_q:.3f} ms "
              f"(quant boundaries cost {isl_q - isl_b:+.3f} ms)", flush=True)
    print(f"forward speedup:              {ratio('fwd_bf16', 'fwd_int8'):.3f}x", flush=True)
    if all(k in results for k in ("e2e_bf16", "fwd_bf16", "e2e_int8", "fwd_int8")):
        tail_b = results["e2e_bf16"] - results["fwd_bf16"]
        tail_q = results["e2e_int8"] - results["fwd_int8"]
        print(f"decode+NMS tail: bf16 {tail_b:.3f} ms, int8 {tail_q:.3f} ms (unquantized, dilutes e2e)", flush=True)
    print(f"e2e speedup:                  {ratio('e2e_bf16', 'e2e_int8'):.3f}x", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "m", int(a[1]) if len(a) > 1 else 64)
