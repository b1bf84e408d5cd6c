"""E2E predict-graph benchmark: default Detect head vs fused-input Detect.

Compares, at bs=128 640px (the shipping bench config), the full predict graph
(device letterbox -> forward -> nms_from_feats) with the Detect head reading
each level's input once (Detect.fold_input_convs: cv2[i][0] weight-concat with
the densified cv3[i][0][0] depthwise) vs the default two-branch reads. The
fold trades ~312 MB/batch of HBM reads against the densified dw's extra MACs
(docs/PERF.md round-4 note) — this measures which side wins on this chip.
Scan-chained timing. Usage: python tools/detect_fused_bench.py [bs] [iters]
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
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.nms import nms_from_feats
    from yololite_tpu.ops.pallas_kernels import device_letterbox

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    det = model.rows[-1].mod
    det_key = str(len(model.rows) - 1)
    folded = {**params, det_key: det.fold_input_convs(params[det_key])}
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params = jax.device_put(cast(params))
    folded = jax.device_put(cast(folded))
    state = jax.device_put(cast(state))
    nms_kw = dict(conf_thres=0.25, iou_thres=0.7, max_det=300, max_cand=300, half=True)

    @jax.jit
    def run(params, state, raw, salt):
        def body(c, _):
            x = device_letterbox(raw + c.astype(raw.dtype), imgsz=640, out_dtype_name="bfloat16")
            feats = model.apply(params, state, x, train=False)
            dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max, **nms_kw)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    rng = np.random.default_rng(0)
    raw = jax.device_put(jnp.asarray(rng.integers(0, 255, (bs, 640, 640, 3)), jnp.uint8))
    rates = {}
    for name, p in (("default", params), ("fused_detect", folded)):
        try:
            t0 = time.perf_counter()
            float(run(p, state, raw, jnp.float32(0)))
            print(f"{name}: compile+1 {time.perf_counter() - t0:.0f}s", flush=True)
            best = 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                float(run(p, state, raw, jnp.float32(0)))
                best = max(best, bs * iters / (time.perf_counter() - t0))
            rates[name] = best
            print(f"{name}: {best:.1f} img/s", flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
    if len(rates) == 2:
        print(f"fused_detect/default = {rates['fused_detect'] / rates['default']:.3f}x", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
