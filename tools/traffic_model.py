"""Analytic HBM/MXU roofline of the yolo11 forward on THIS chip's measured ceilings.

Walks the inference jaxpr (the same walker as DetectionModel.gflops) and charges
every conv / dot_general its operand + result HBM traffic at its dtype and its
MAC FLOPs; everything elementwise is assumed perfectly fused into a producer
(XLA does this for the BN/SiLU epilogues — the optimistic bound). Per-op time =
max(bytes / HBM_BW, flops / MXU_TFLOPS); the sum is the speed-of-light for the
forward AS A SEQUENCE OF CONV/DOT KERNELS, i.e. the ceiling any schedule of
XLA/Pallas kernels can reach without cross-layer fusion that keeps activations
in VMEM. Compare with the measured forward to see how much of the remaining gap
is reachable at all.

CPU-only (jax.make_jaxpr; no device). Usage:
  JAX_PLATFORMS=cpu python tools/traffic_model.py [scale] [bs] [imgsz]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# Ceilings (overridable): r4 queue8 ceiling_probe corrected both constants —
# the r2 124.5 TFLOP/s / 273 GB/s pair was a relay-latency artifact. Opaque-
# operand multi-length fits: matmul 189.4 bf16 TFLOP/s; conv-shaped effective
# r+w up to 1086 GB/s (conv1), read-stream ~740 GB/s (docs/r4_queue8_results.log).
HBM_GBS = float(os.environ.get("TRAFFIC_HBM_GBS", 1000e9))
MXU_TFLOPS = float(os.environ.get("TRAFFIC_MXU_TFLOPS", 189.4e12))


def main(scale: str = "n", bs: int = 128, imgsz: int = 640):
    bs, imgsz = int(bs), int(imgsz)
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree

    model = DetectionModel(f"yolo11{scale}.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    params, state = cast(params), cast(state)

    x = jnp.zeros((bs, imgsz, imgsz, 3), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(lambda p, s, v: model.apply(p, s, v, train=False))(params, state, x)

    rows = []

    def nbytes(aval):
        return int(np.prod(aval.shape)) * aval.dtype.itemsize

    def walk(jp):
        for eqn in jp.eqns:
            nm = eqn.primitive.name
            if nm == "conv_general_dilated":
                out = eqn.outvars[0].aval
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                kh, kw, cin_g, _ = rhs.shape
                fl = 2.0 * np.prod(out.shape) * cin_g * kh * kw
                by = nbytes(lhs) + nbytes(rhs) + nbytes(out)
                rows.append((f"conv {rhs.shape[:2]} {lhs.shape[-1]}->{out.shape[-1]} @{out.shape[1]}",
                             fl, by))
            elif nm == "dot_general":
                lhs, out = eqn.invars[0].aval, eqn.outvars[0].aval
                (lc, _), _ = eqn.params["dimension_numbers"]
                k = np.prod([lhs.shape[i] for i in lc])
                fl = 2.0 * np.prod(out.shape) * k
                by = nbytes(lhs) + nbytes(eqn.invars[1].aval) + nbytes(out)
                rows.append((f"dot {lhs.shape}x{eqn.invars[1].aval.shape}", fl, by))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)

    walk(jaxpr.jaxpr)

    tot_t = tot_fl = tot_by = 0.0
    print(f"yolo11{scale} bs={bs} {imgsz}px — per conv/dot roofline "
          f"(HBM {HBM_GBS/1e9:.0f} GB/s, MXU {MXU_TFLOPS/1e12:.1f} TFLOP/s):")
    agg = {}
    for name, fl, by in rows:
        t = max(by / HBM_GBS, fl / MXU_TFLOPS)
        tot_t += t
        tot_fl += fl
        tot_by += by
        a = agg.setdefault(name, [0, 0.0, 0.0])
        a[0] += 1
        a[1] += fl
        a[2] += by
    for name, (n, fl, by) in sorted(agg.items(), key=lambda kv: -max(kv[1][2] / HBM_GBS, kv[1][1] / MXU_TFLOPS)):
        t = max(by / HBM_GBS, fl / MXU_TFLOPS)
        bound = "HBM" if by / HBM_GBS > fl / MXU_TFLOPS else "MXU"
        print(f"  {t*1e3:7.3f} ms  x{n:<3d} {bound}  {by/1e6:8.1f} MB {fl/1e9:8.1f} GF  {name}")
    print(f"forward roofline (sum of per-op maxima): {tot_t*1e3:.2f} ms "
          f"= {bs / tot_t:.0f} img/s   [{tot_by/1e9:.2f} GB, {tot_fl/1e9:.0f} GFLOP]")
    print(f"pure-HBM bound {tot_by/HBM_GBS*1e3:.2f} ms; pure-MXU bound {tot_fl/MXU_TFLOPS*1e3:.2f} ms")


if __name__ == "__main__":
    main(*sys.argv[1:])
