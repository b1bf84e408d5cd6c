"""Validator-path NMS benchmark: large-K exact greedy, chunked scan vs chunked fixpoint.

Times non_max_suppression on the validator's workload shape (conf=0.001,
multi_label=True, max_cand=8192 over (B, 8400, 80) scores) for both
LARGE_K_MODE settings on synthetic crowded scenes (objects spawning jittered
candidate clusters — the structure that drives greedy chain depth).

Timing: iterations chained through a scalar salt, forced by one scalar fetch
(inference graphs scan-chain safely on this tunnel; docs/PERF.md).
Usage: python tools/valnms_bench.py [B] [iters]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_scene(rng, a=8400, nc=80, n_obj=24, jitter=40):
    """Clustered candidate boxes + scores shaped like post-decode val input."""
    boxes = np.zeros((a, 4), np.float32)
    scores = rng.random((a, nc)).astype(np.float32) ** 8 * 0.01  # background
    centers = rng.uniform(60, 580, (n_obj, 2))
    wh = rng.uniform(30, 160, (n_obj, 2))
    cls = rng.integers(0, nc, n_obj)
    per = a // (n_obj * 2)
    k = 0
    for o in range(n_obj):
        for _ in range(per):
            c = centers[o] + rng.normal(0, 6, 2)
            s = wh[o] * np.exp(rng.normal(0, 0.1, 2))
            boxes[k] = [c[0] - s[0] / 2, c[1] - s[1] / 2, c[0] + s[0] / 2, c[1] + s[1] / 2]
            scores[k, cls[o]] = rng.uniform(0.05, 0.95)
            k += 1
    rest = a - k
    c = rng.uniform(0, 640, (rest, 2))
    s = rng.uniform(8, 80, (rest, 2))
    boxes[k:] = np.concatenate([c - s / 2, c + s / 2], -1)
    return boxes, scores


def main(B=8, iters=8):
    B, iters = int(B), int(iters)
    import jax
    import jax.numpy as jnp

    from yololite_tpu.ops import nms as nms_mod

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    rng = np.random.default_rng(0)
    scenes = [make_scene(rng) for _ in range(B)]
    boxes = jax.device_put(jnp.asarray(np.stack([s[0] for s in scenes])))
    scores = jax.device_put(jnp.asarray(np.stack([s[1] for s in scenes])))
    kw = dict(conf_thres=0.001, iou_thres=0.7, max_det=300, max_cand=8192, multi_label=True)

    results = {}
    for mode in ("scan", "fixpoint"):
        nms_mod.LARGE_K_MODE = mode
        nms_mod.non_max_suppression.clear_cache()
        try:
            t0 = time.perf_counter()
            out = nms_mod.non_max_suppression(boxes, scores, **kw)
            first = float(jnp.sum(out))
            print(f"{mode}: compile+1 {time.perf_counter() - t0:.0f}s (sum {first:.1f})", flush=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                c = jnp.float32(0)
                for _ in range(iters):
                    out = nms_mod.non_max_suppression(boxes + c * 0, scores, **kw)
                    c = (jnp.sum(out) * 1e-12).astype(jnp.float32)
                float(c)
                best = min(best, time.perf_counter() - t0)
            ms = best / iters * 1e3
            results[mode] = (ms, first)
            print(f"{mode}: {ms:.2f} ms/batch (B={B}, K=8192)", flush=True)
        except Exception as e:
            print(f"{mode}: {type(e).__name__}: {e}", flush=True)
    if len(results) == 2:
        assert results["scan"][1] == results["fixpoint"][1], "modes disagree!"
        print(f"speedup fixpoint vs scan: {results['scan'][0] / results['fixpoint'][0]:.2f}x", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
