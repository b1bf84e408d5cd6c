"""Profile the yolo11n train step stages on the real chip (bs=64, 640px, amp).

Splits the step into forward / forward+loss(TAL) / grad / grad+optimizer+EMA so
PERF.md can carry a measured post-bucketing breakdown (round-2 verdict weak #3).

Timing method: each stage is ONE jitted function called ITERS times with a
data dependency chained through a scalar carry (output feeds the next call's
salt), then a single scalar fetch forces the chain. This hides the ~34 ms
relay RTT behind dispatch pipelining without wrapping the whole step in a
lax.scan — a scan of the full training graph previously wedged the remote
compiler (round 3 journal).
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

    from yololite_tpu.engine import optim
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models import modules as M
    from yololite_tpu.utils.ema import ema_update
    from yololite_tpu.utils.loss import build_targets, v8DetectionLoss

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    BS, S, MG, ITERS = 64, 640, 16, 10
    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    loss_fn = v8DetectionLoss(model.nc, model.strides, model.reg_max)
    labels_tree = optim.build_group_labels(params)
    opt_state = optim.init_state(params)

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
    ema = jax.device_put(jax.tree.map(lambda x: x + 0, params))
    opt_state = jax.device_put(opt_state)

    def timed(name, step):
        """step: jitted fn(salt scalar) -> scalar; chained ITERS times."""
        try:
            t0 = time.perf_counter()
            float(step(jnp.float32(0)))  # compile + one run
            tc = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                c = jnp.float32(0)
                for _ in range(ITERS):
                    c = step(c)  # dispatches pipeline; data-dependent chain
                float(c)  # one sync forces the whole chain
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
    def fwd_loss(c):
        ctx = M.Ctx(train=True)
        feats = model.apply(params, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        total, _ = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
        return (total * 1e-12).astype(jnp.float32)

    def _lossf(p, c):
        ctx = M.Ctx(train=True)
        feats = model.apply(p, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        total, _ = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
        return total

    @jax.jit
    def grad_only(c):
        g = jax.grad(_lossf)(params, c)
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)) * 1e-12).astype(jnp.float32)

    @jax.jit
    def full_step(c):
        g = jax.grad(_lossf)(params, c)
        g, _ = optim.clip_by_global_norm(g, 10.0)
        p2, _ = optim.sgd_update(params, g, opt_state, labels_tree,
                                 jnp.asarray([0.01, 0.01, 0.01]), 0.9, 5e-4)
        e2 = ema_update(ema, p2, jnp.asarray(1))
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(e2)[:3]) * 1e-12).astype(jnp.float32)

    # ---- forward-gap bisect (r5): the r3 split showed the train-graph forward
    # at 19.5-22.9 ms while the serving graph does ~7.4 ms for the same images
    # (14.73 ms at bs=128 halved). These stages name the gap: running-stat BN
    # (fwd_eval), fp32->bf16 per-step weight casts (fwd_bf16p), BN folded into
    # conv weights i.e. the serving graph shape (fwd_folded = the floor).
    @jax.jit
    def fwd_eval(c):
        feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
        return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12).astype(jnp.float32)

    params16 = jax.device_put(jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))
    state16 = jax.device_put(jax.tree.map(lambda x: x.astype(jnp.bfloat16), state))

    @jax.jit
    def fwd_bf16p(c):
        feats = model.apply(params16, state16, images + c.astype(images.dtype), train=False)
        return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12).astype(jnp.float32)

    from yololite_tpu.models.modules import fuse_tree

    fp, fstate = fuse_tree(params, state)
    fp = jax.device_put(jax.tree.map(lambda x: x.astype(jnp.bfloat16), fp))
    fstate = jax.device_put(jax.tree.map(lambda x: x.astype(jnp.bfloat16), fstate))

    @jax.jit
    def fwd_folded(c):
        feats = model.apply(fp, fstate, images + c.astype(images.dtype), train=False)
        return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12).astype(jnp.float32)

    # remat A/B: checkpoint the whole loss fn (save nothing / save dots). If the
    # forward's residual saves dominate its cost, recompute beats materialize.
    @jax.jit
    def grad_remat(c):
        g = jax.grad(jax.checkpoint(_lossf))(params, c)
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)) * 1e-12).astype(jnp.float32)

    r = {}
    r["fwd_train"] = timed("fwd_train (bs=64 amp)", fwd_train)
    r["fwd_eval"] = timed("fwd_eval (running stats)", fwd_eval)
    r["fwd_bf16p"] = timed("fwd_eval bf16 params", fwd_bf16p)
    r["fwd_folded"] = timed("fwd folded-BN bf16 (serving shape)", fwd_folded)
    r["fwd_loss"] = timed("fwd+loss+TAL", fwd_loss)
    r["grad"] = timed("fwd+bwd (grad)", grad_only)
    r["grad_remat"] = timed("fwd+bwd remat-all", grad_remat)
    r["full"] = timed("full step (grad+clip+SGD+EMA)", full_step)
    if r.get("fwd_loss") and r.get("fwd_train"):
        print(f"loss+TAL forward-side cost: {r['fwd_loss'] - r['fwd_train']:.2f} ms", flush=True)
    if r.get("grad") and r.get("full"):
        print(f"optimizer+EMA cost: {r['full'] - r['grad']:.2f} ms", flush=True)
    if r.get("fwd_eval") and r.get("fwd_folded"):
        print(f"BN-unfolded+fp32-cast forward overhead: {r['fwd_eval'] - r['fwd_folded']:.2f} ms "
              f"(batch-stat extra: {(r.get('fwd_train') or 0) - r['fwd_eval']:.2f})", flush=True)
    print("RESULTS", {k: (round(v, 2) if v else None) for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
