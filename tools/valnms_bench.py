"""Validator-tail benchmark: old decode-all + serial-scan NMS vs the round-4
fused multi-label select-first pipeline with blocked suppression.

Two stages:
  1. suppression kernels alone on clustered candidate scenes (the structure
     that drives greedy chain depth): LARGE_K_MODE scan / fixpoint / blocked
     through non_max_suppression at the validator shape (conf=0.001,
     multi_label=True, max_cand=8192, (B, 8400, 80) scores);
  2. the full val inference tail from raw Detect maps with a trained-like
     score distribution (sparse boosted logits over a low background):
     decode_detections + non_max_suppression  vs  nms_from_feats(multi_label).

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


def make_feats(rng, B, nc=80, reg_max=16, hw=((80, 80), (40, 40), (20, 20)), n_hot=2000):
    """Raw Detect maps with a trained-like score tail: background cls logits
    ~N(-12, 2.5) (sigmoid mostly << 1e-3) plus n_hot boosted (anchor, class)
    entries at logit U(-6, 3)."""
    feats = []
    a_tot = sum(h * w for h, w in hw)
    for (h, w) in hw:
        box = rng.standard_normal((B, h, w, 4 * reg_max)).astype(np.float32)
        cls = (rng.standard_normal((B, h, w, nc)) * 2.5 - 12.0).astype(np.float32)
        feats.append(np.concatenate([box, cls], -1))
    for b in range(B):
        hot = rng.integers(0, a_tot * nc, n_hot)
        for fid in hot:
            a, c = divmod(int(fid), nc)
            for (h, w), f in zip(hw, feats):
                if a < h * w:
                    f[b, a // w, a % w, 4 * reg_max + c] = rng.uniform(-6, 3)
                    break
                a -= h * w
    return feats


def main(B=8, iters=8):
    B, iters = int(B), int(iters)
    import jax
    import jax.numpy as jnp

    from yololite_tpu.ops import nms as nms_mod
    from yololite_tpu.ops.decode import decode_detections

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    rng = np.random.default_rng(0)
    kw = dict(conf_thres=0.001, iou_thres=0.7, max_det=300, max_cand=8192, multi_label=True)

    # ---- stage 1: suppression kernels on candidate scenes ----
    scenes = [make_scene(rng) for _ in range(B)]
    boxes = jax.device_put(jnp.asarray(np.stack([s[0] for s in scenes])))
    scores = jax.device_put(jnp.asarray(np.stack([s[1] for s in scenes])))

    results = {}
    for mode in ("scan", "fixpoint", "blocked"):
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
            print(f"{mode}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    sums = {v[1] for v in results.values()}
    if len(results) > 1:
        assert len(sums) == 1, f"modes disagree! {results}"
        for m_ in results:
            if m_ != "scan" and "scan" in results:
                print(f"speedup {m_} vs scan: {results['scan'][0] / results[m_][0]:.2f}x", flush=True)

    # ---- stage 2: full val tail from raw maps ----
    nms_mod.LARGE_K_MODE = "blocked"
    nms_mod.non_max_suppression.clear_cache()
    feats_np = make_feats(rng, B)
    feats = [jax.device_put(jnp.asarray(f)) for f in feats_np]

    @jax.jit
    def old_tail(feats, salt):
        def body(c, _):
            fs = [f + c.astype(f.dtype) for f in feats]
            bx, sc = decode_detections(fs, [8, 16, 32], 80, 16, xywh=False)
            d = nms_mod.non_max_suppression(bx, sc, **kw)
            return (jnp.sum(d) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    @jax.jit
    def new_tail(feats, salt):
        def body(c, _):
            fs = [f + c.astype(f.dtype) for f in feats]
            d = nms_mod.nms_from_feats(fs, [8, 16, 32], 80, 16, **kw)
            return (jnp.sum(d) * 1e-12).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, salt, None, length=iters)
        return out

    for name, fn in (("old decode+nms", old_tail), ("fused multilabel", new_tail)):
        try:
            t0 = time.perf_counter()
            float(fn(feats, jnp.float32(0)))
            print(f"{name}: compile+1 {time.perf_counter() - t0:.0f}s", flush=True)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(fn(feats, jnp.float32(0)))
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            print(f"{name}: {best:.2f} ms/batch (B={B})", flush=True)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
