"""E2E predict-graph benchmark: default device letterbox vs space-to-depth stem.

Compares, at bs=128 640px (the shipping bench config):
  default: device_letterbox -> model.apply -> nms_from_feats
  s2d:     device_letterbox_s2d -> folded k2s1 stem -> model.apply(start=1) -> nms

over two input shapes: (640, 640) uint8 (identity letterbox: s2d = relayout
copy) and (480, 640) uint8 (real resize: the split interpolation matmuls cost
the same FLOPs as the default path's). Scan-chained timing (inference graphs
are scan-safe on this tunnel; docs/PERF.md).
Usage: python tools/s2d_bench.py [bs] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(bs=128, iters=16):
    bs, iters = int(bs), int(iters)
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import (fuse_tree, stem_s2d_apply, stem_s4d_apply,
                                             stem_s4d_apply_pallas)
    from yololite_tpu.ops.nms import nms_from_feats
    from yololite_tpu.ops.pallas_kernels import (
        device_letterbox, device_letterbox_s2d, device_letterbox_s4d)

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params = jax.device_put(cast(params))
    state = jax.device_put(cast(state))
    nms_kw = dict(conf_thres=0.25, iou_thres=0.7, max_det=300, max_cand=300, half=True)

    @jax.jit
    def run_default(params, state, raw, salt):
        def body(c, _):
            x = device_letterbox(raw + c.astype(raw.dtype), imgsz=640, out_dtype_name="bfloat16")
            feats = model.apply(params, state, x, train=False)
            dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max, **nms_kw)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    @jax.jit
    def run_s2d(params, state, raw, salt):
        def body(c, _):
            xs = device_letterbox_s2d(raw + c.astype(raw.dtype), imgsz=640, out_dtype_name="bfloat16")
            y0 = stem_s2d_apply(model.rows[0].mod, params["0"], xs)
            feats = model.apply(params, state, y0, train=False, start=1)
            dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max, **nms_kw)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    @jax.jit
    def run_s4d(params, state, raw, salt):
        def body(c, _):
            xs = device_letterbox_s4d(raw + c.astype(raw.dtype), imgsz=640, out_dtype_name="bfloat16")
            y1 = stem_s4d_apply(model.rows[0].mod, model.rows[1].mod, params["0"], params["1"], xs)
            feats = model.apply(params, state, y1, train=False, start=2)
            dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max, **nms_kw)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    def make_run_fused(sumtap):
        @jax.jit
        def run(params, state, raw, salt):
            def body(c, _):
                xs = device_letterbox_s4d(raw + c.astype(raw.dtype), imgsz=640, out_dtype_name="bfloat16")
                y1 = stem_s4d_apply_pallas(model.rows[0].mod, model.rows[1].mod,
                                           params["0"], params["1"], xs, sumtap=sumtap)
                feats = model.apply(params, state, y1, train=False, start=2)
                dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max, **nms_kw)
                return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        return run

    run_s4d_fused = make_run_fused(False)
    run_s4d_fused_sumtap = make_run_fused(True)

    rng = np.random.default_rng(0)
    for shape in ((640, 640), (480, 640)):
        raw = jax.device_put(jnp.asarray(rng.integers(0, 255, (bs, *shape, 3)), jnp.uint8))
        rates = {}
        for name, fn in (("default", run_default), ("s2d", run_s2d), ("s4d", run_s4d),
                         ("s4d_fused", run_s4d_fused),
                         ("s4d_fused_sumtap", run_s4d_fused_sumtap)):
            try:
                t0 = time.perf_counter()
                float(fn(params, state, raw, jnp.float32(0)))
                print(f"{shape} {name}: compile+1 {time.perf_counter() - t0:.0f}s", flush=True)
                best = 0.0
                for _ in range(2):
                    t0 = time.perf_counter()
                    float(fn(params, state, raw, jnp.float32(0)))
                    best = max(best, bs * iters / (time.perf_counter() - t0))
                rates[name] = best
                print(f"{shape} {name}: {best:.1f} img/s", flush=True)
            except Exception as e:
                print(f"{shape} {name}: {type(e).__name__}: {e}", flush=True)
        for k in ("s2d", "s4d", "s4d_fused", "s4d_fused_sumtap"):
            if k in rates and "default" in rates:
                print(f"{shape}: {k}/default = {rates[k] / rates['default']:.3f}x", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
