"""Re-measure device ceilings: MXU TFLOP/s, HBM bandwidth, and stem-conv reality.

The round-2 microbenchmark pegged this tunnel chip at ~124.5 bf16 TFLOP/s and
~273 GB/s HBM (docs/PERF.md) — the latter is 1/3 of the v5e spec (819 GB/s)
and every roofline conclusion (the forward is "at the measured roofline")
hangs on it. This sweeps transfer sizes and op shapes to separate a genuinely
throttled part from a measurement artifact (too-small arrays, relay effects).

Scan-chained timing throughout (pure compute graphs; scan-safe).
Usage: python tools/roofline.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def chain_time(fn, x, iters, label):
    """Per-iteration time of fn with the dispatch/fetch constant removed.

    A single scan-loop measurement divides the relay round-trip (~20-35 ms)
    across iters — at 8 iters that is a ~3 ms/iter additive error, which made
    the r2/r3 axpy sweep report 273 GB/s on a part whose big-array transfers
    sustain 500+ (docs/r4_queue6_results.log: the "bandwidth" rose with array
    size exactly as a constant-plus-linear model predicts). Measure the same
    chain at iters and 5*iters and take the slope: the constant cancels.
    """
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(x, salt):
            def body(c, _):
                y = fn(x + c.astype(x.dtype))
                # FULL-output reduce: a [:1] slice here lets XLA slice through
                # the dot/elementwise and compute one element (measured: "299
                # TFLOP/s" on a 197-peak part).
                return (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, salt, None, length=n)
            return out

        return loop

    try:
        lo, hi = make(iters), make(5 * iters)
        float(lo(x, jnp.float32(0)))
        float(hi(x, jnp.float32(0)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(lo(x, jnp.float32(0)))
            t1 = time.perf_counter()
            float(hi(x, jnp.float32(0)))
            t2 = time.perf_counter()
            # degenerate-timing guard (mirrors bench.py): jitter can make the
            # slope near-zero/negative, which would feed absurd ceiling
            # constants — fall back to the conservative single-loop estimate
            slope = ((t2 - t1) - (t1 - t0)) / (4 * iters)
            single = (t1 - t0) / iters
            if slope <= 0 or slope < single / 1.5:
                slope = single
            best = min(best, slope)
        return best
    except Exception as e:
        print(f"{label}: {type(e).__name__}: {e}", flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)

    # --- MXU: dense matmul at several sizes ---
    for n in (4096, 8192):
        a = jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16))
        dt = chain_time(lambda x: (x @ x).astype(jnp.bfloat16), a, 8, f"matmul{n}")
        if dt:
            print(f"matmul {n}^3 bf16: {2 * n**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    # --- HBM: fused axpy (read x + write y: 2 passes) over a size sweep ---
    for mb in (64, 256, 1024):
        n = mb * 1024 * 1024 // 2  # bf16 elements
        x = jax.device_put(jnp.asarray(rng.standard_normal(min(n, 1 << 29)), jnp.bfloat16))
        nb = x.size * 2
        dt = chain_time(lambda v: v * 1.0001 + 0.5, x, 8, f"axpy{mb}MB")
        if dt:
            print(f"axpy {nb / 1e6:.0f} MB (r+w {2 * nb / 1e6:.0f} MB): "
                  f"{2 * nb / dt / 1e9:.0f} GB/s", flush=True)

    # --- copy (pure relayout-free move) ---
    x = jax.device_put(jnp.asarray(rng.standard_normal(1 << 28), jnp.bfloat16))  # 512 MB
    dt = chain_time(lambda v: v + jnp.bfloat16(1), x, 8, "copy")
    if dt:
        print(f"add-const 512MB: {2 * x.size * 2 / dt / 1e9:.0f} GB/s", flush=True)

    # --- stem convs standalone (bs=128): achieved bandwidth vs their traffic ---
    from yololite_tpu.models.modules import Conv, KeyGen, Ctx

    for (cin, cout, hw, name) in ((3, 16, 640, "conv0"), (16, 32, 320, "conv1")):
        conv = Conv(cin, cout, k=3, s=2)
        p, s = conv.init(KeyGen(0))
        from yololite_tpu.models.modules import fuse_tree

        p, s = fuse_tree(p, s)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        xin = jax.device_put(jnp.asarray(rng.standard_normal((128, hw, hw, cin)), jnp.bfloat16))
        dt = chain_time(lambda v: conv(p, {}, v, Ctx(train=False)), xin, 8, name)
        if dt:
            traffic = 128 * (hw * hw * cin + (hw // 2) ** 2 * cout) * 2
            flops = 128 * (hw // 2) ** 2 * cout * cin * 9 * 2
            print(f"{name} ({cin}->{cout} @{hw}, bs=128): {dt * 1e3:.2f} ms = "
                  f"{traffic / dt / 1e9:.0f} GB/s eff, {flops / dt / 1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
