"""Definitive device-ceiling probe: multi-length scans + nonlinear carries.

Two confounds have now corrupted THREE generations of ceiling constants on this
tunnel chip (docs/PERF.md):
  1. dividing one scan-loop's wall time by its length folds the ~20-35 ms
     relay round trip into the per-iteration time (124.5 TFLOP/s, 273 GB/s);
  2. the slope fix (time at N and 5N, subtract) exposed the opposite failure:
     with a LINEAR carry, sum(f(x + c)) factors algebraically
     (sum(x) + N*c terms), so XLA hoists the big read/matmul out of the scan
     and the "slope" prices an O(1) loop (queue7: axpy "2119 GB/s", matmul4k
     "251 TFLOP/s" — both above hardware spec).

This probe makes the body non-factorable twice over:
  - the salt enters the OPERAND as jnp.maximum(x, c - 1e9) — numerically the
    identity (x is standard normal), but c is a runtime scalar so XLA cannot
    prove it and must run the big op every iteration (no loop-invariant
    hoisting, no dot-distributivity rewrite);
  - the reduce goes through jnp.abs(), so the carry chain has no sum
    decomposition either.
It times the SAME graph at lengths {8, 16, 40, 80}, printing every raw wall
time so linearity is visible, then the least-squares slope. If t(N) is linear,
the slope is the true per-iteration cost with the call constant removed.

Usage: python tools/ceiling_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

LENGTHS = (8, 16, 40, 80)


def probe(fn, x, label, reps=2):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(x, salt):
            def body(c, _):
                # maximum(x, c - 1e9) == x numerically, but opaque to XLA:
                # the big op's operand depends on the carry, so it cannot be
                # hoisted out of the scan (the queue7 failure: (x+c)@(x+c)
                # decomposes to a loop-invariant x@x plus rank-1 terms)
                xx = jnp.maximum(x, (c - 1e9).astype(x.dtype))
                y = fn(xx)
                # abs() before the reduce: no algebraic factoring of the salt
                return (jnp.sum(jnp.abs(y).astype(jnp.float32)) * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=n)
            return out

        return loop

    loops = {n: make(n) for n in LENGTHS}
    try:
        for n in LENGTHS:  # compile + warm
            float(loops[n](x, jnp.float32(0)))
        times = {}
        for n in LENGTHS:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(loops[n](x, jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        ns = np.array(LENGTHS, float)
        ts = np.array([times[n] for n in LENGTHS])
        slope, intercept = np.polyfit(ns, ts, 1)
        raw = " ".join(f"t({n})={times[n]*1e3:.1f}ms" for n in LENGTHS)
        print(f"{label}: {raw} -> slope {slope*1e3:.3f} ms/iter, call-constant {intercept*1e3:.1f} ms",
              flush=True)
        return slope
    except Exception as e:
        print(f"{label}: {type(e).__name__}: {e}", flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)

    n = 8192
    a = jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16))
    dt = probe(lambda x: (x @ x).astype(jnp.bfloat16), a, f"matmul{n}")
    if dt:
        print(f"  => {2 * n**3 / dt / 1e12:.1f} bf16 TFLOP/s", flush=True)

    for mb in (256, 1024):
        el = mb * 1024 * 1024 // 2
        x = jax.device_put(jnp.asarray(rng.standard_normal(el), jnp.bfloat16))
        nb = x.size * 2
        dt = probe(lambda v: v * 1.0001 + 0.5, x, f"axpy{mb}MB")
        if dt:
            print(f"  => {2 * nb / dt / 1e9:.0f} GB/s (r+w)", flush=True)

    # stem conv0 reality check with the same methodology
    from yololite_tpu.models.modules import Conv, Ctx, KeyGen, fuse_tree

    for (cin, cout, hw, name) in ((3, 16, 640, "conv0"), (16, 32, 320, "conv1")):
        conv = Conv(cin, cout, k=3, s=2)
        p, s = conv.init(KeyGen(0))
        p, s = fuse_tree(p, s)
        p = jax.tree.map(lambda t: t.astype(jnp.bfloat16), p)
        xin = jax.device_put(jnp.asarray(rng.standard_normal((128, hw, hw, cin)), jnp.bfloat16))
        dt = probe(lambda v: conv(p, {}, v, Ctx(train=False)), xin, name)
        if dt:
            traffic = 128 * (hw * hw * cin + (hw // 2) ** 2 * cout) * 2
            flops = 128 * (hw // 2) ** 2 * cout * cin * 9 * 2
            print(f"  => {dt * 1e3:.2f} ms, {traffic / dt / 1e9:.0f} GB/s eff, "
                  f"{flops / dt / 1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
