"""Decompose the yolo11n train-step BACKWARD on the real chip (bs=64, 640px, amp).

train_profile.py established (r3, clean host): fwd 22.9 ms, fwd+loss 31.8 ms,
grad(fwd+loss) 86.9 ms, full step 87.5 ms. The backward is ~55 ms — 2.4x the
forward where ~2x is the flop ratio. This script splits that 55 ms:

  grad_model   — grad of a fixed random projection of the raw feature maps
                 (no loss, no TAL): the model's own fwd+bwd cost.
  fwd_infer    — train=False forward (running BN stats, no batch-stat
                 reduction): BN-stat overhead by difference with fwd_train.

Derived: loss backward ≈ grad(fwd+loss) − grad_model − loss_fwd. Directs the
≥1000 img/s push (VERDICT r2 next #3): if grad_model ≈ 3x fwd the lever is conv
backward tiling / batch size; if the residual is big the lever is the loss.

Timing method identical to train_profile.py (chained scalar carry, one fetch).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models import modules as M
    from yololite_tpu.utils.loss import build_targets, v8DetectionLoss

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    BS, S, MG, ITERS = 64, 640, 16, 10
    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    loss_fn = v8DetectionLoss(model.nc, model.strides, model.reg_max)

    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(rng.random((BS, S, S, 3)), jnp.bfloat16))
    n_gt = 4
    batch = {
        "batch_idx": np.repeat(np.arange(BS, dtype=np.float32), n_gt),
        "cls": rng.integers(0, 80, (BS * n_gt, 1)).astype(np.float32),
        "bboxes": np.clip(rng.random((BS * n_gt, 4)).astype(np.float32) * 0.5 + 0.25, 0.05, 0.95),
    }
    t = build_targets(batch, BS, (S, S), MG)
    gl = jax.device_put(jnp.asarray(t["gt_labels"]))
    gb = jax.device_put(jnp.asarray(t["gt_bboxes"]))
    mg = jax.device_put(jnp.asarray(t["mask_gt"]))
    params = jax.device_put(params)
    state = jax.device_put(state)

    def timed(name, step):
        try:
            t0 = time.perf_counter()
            float(step(jnp.float32(0)))
            tc = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                c = jnp.float32(0)
                for _ in range(ITERS):
                    c = step(c)
                float(c)
                best = min(best, time.perf_counter() - t0)
            ms = best / ITERS * 1e3
            print(f"{name}: {ms:.2f} ms/step  ({BS / ms * 1e3:.1f} img/s)  [compile+1 {tc:.0f}s]",
                  flush=True)
            return ms
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
            return None

    @jax.jit
    def fwd_train(c):
        ctx = M.Ctx(train=True)
        feats = model.apply(params, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12).astype(jnp.float32)

    @jax.jit
    def fwd_infer(c):
        feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
        return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12).astype(jnp.float32)

    # fixed random projections so every feature element carries gradient
    # (a plain sum would let XLA drop the within-channel structure of the bwd)
    proj_keys = jax.random.split(jax.random.PRNGKey(0), 3)

    def _model_obj(p, c):
        ctx = M.Ctx(train=True)
        feats = model.apply(p, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        tot = jnp.float32(0)
        for f, k in zip(feats, proj_keys):
            w = jax.random.normal(k, (f.shape[-1],), jnp.bfloat16)
            tot = tot + jnp.sum((f * w).astype(jnp.float32))
        return tot

    @jax.jit
    def grad_model(c):
        g = jax.grad(_model_obj)(params, c)
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)) * 1e-12).astype(jnp.float32)

    def _lossf(p, c):
        ctx = M.Ctx(train=True)
        feats = model.apply(p, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        total, _ = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
        return total

    @jax.jit
    def grad_full(c):
        g = jax.grad(_lossf)(params, c)
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)) * 1e-12).astype(jnp.float32)

    r = {}
    r["fwd_train"] = timed("fwd_train (bs=64 amp)", fwd_train)
    r["fwd_infer"] = timed("fwd_infer (train=False)", fwd_infer)
    r["grad_model"] = timed("grad(model only, no loss)", grad_model)
    r["grad_full"] = timed("grad(fwd+loss+TAL)", grad_full)
    if r.get("fwd_train") and r.get("fwd_infer"):
        print(f"BN batch-stat overhead (fwd): {r['fwd_train'] - r['fwd_infer']:.2f} ms", flush=True)
    if r.get("grad_model") and r.get("fwd_train"):
        print(f"model bwd/fwd ratio: {(r['grad_model'] - r['fwd_train']) / r['fwd_train']:.2f}x", flush=True)
    if r.get("grad_full") and r.get("grad_model"):
        print(f"loss fwd+bwd share of grad step: {r['grad_full'] - r['grad_model']:.2f} ms", flush=True)
    print("RESULTS", {k: (round(v, 2) if v else None) for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
