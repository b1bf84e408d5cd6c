"""Isolated on-chip probe for the fused s4d stem Pallas kernel.

Times JUST the stem (not the full model) in three forms at bs=128/640px:
  xla2   — stem_s4d_apply (two XLA convs, the current s4d baseline)
  fusedN — fused_stem_s4d_pallas at several band heights th (Mosaic tiling
           and the per-grid-step latency floor move with th; docs/PERF.md
           round-4 note)

Each variant compiles independently and failures are caught per variant, so a
Mosaic rejection of one th doesn't kill the sweep. Scan-chained timing.
Usage: python tools/fusedstem_probe.py [bs] [iters]
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
    from yololite_tpu.models.modules import fuse_tree, stem_s4d_apply, stem_s4d_apply_pallas

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, _ = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params = jax.device_put(cast(params))
    conv0, conv1 = model.rows[0].mod, model.rows[1].mod

    rng = np.random.default_rng(0)
    xs4 = jax.device_put(jnp.asarray(rng.random((bs, 160, 160, 48)), jnp.bfloat16))

    def timed(name, fn):
        @jax.jit
        def loop(params, x, salt):
            def body(c, _):
                y = fn(params, x + c.astype(x.dtype))
                return (jnp.sum(y.astype(jnp.float32)) * 1e-9).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=iters)
            return out

        try:
            t0 = time.perf_counter()
            float(loop(params, xs4, jnp.float32(0)))
            print(f"{name}: compile+1 {time.perf_counter() - t0:.0f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(params, xs4, jnp.float32(0)))
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            print(f"{name}: {best:.2f} ms/batch", flush=True)
            return best
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: {type(e).__name__}: {msg}", flush=True)
            return None

    timed("xla2", lambda p, x: stem_s4d_apply(conv0, conv1, p["0"], p["1"], x))
    for th in (20, 32, 40, 80):
        timed(f"fused_th{th}", lambda p, x, th=th: stem_s4d_apply_pallas(
            conv0, conv1, p["0"], p["1"], x, th=th, interpret=False))
    # sumtap variant: no lane-dim concatenate (the op Mosaic rejected) — four
    # tap matmuls summed instead of one im2col matmul per conv
    for th in (20, 40, 80):
        timed(f"sumtap_th{th}", lambda p, x, th=th: stem_s4d_apply_pallas(
            conv0, conv1, p["0"], p["1"], x, th=th, interpret=False, sumtap=True))


if __name__ == "__main__":
    main(*sys.argv[1:])
