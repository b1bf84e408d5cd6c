"""Profile the yolo11n train step stages on the real chip (bs=64, 640px, amp).

Splits the step into forward / forward+loss(TAL) / grad / grad+optimizer+EMA so
PERF.md can carry a measured post-bucketing breakdown (round-2 verdict weak #3:
the 31.4 ms loss+TAL figure predates GT bucketing). Scan-chained timing like
bench.py (docs/PERF.md relay rules).
"""

from __future__ import annotations

import time

import numpy as np


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
    n_gt = 4  # per image
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

    def timed(name, loop):
        try:
            t0 = time.perf_counter()
            float(loop())
            tc = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(loop())
                best = min(best, time.perf_counter() - t0)
            ms = best / ITERS * 1e3
            print(f"{name}: {ms:.2f} ms/step  ({BS / ms * 1e3:.1f} img/s)  [compile+1 {tc:.0f}s]",
                  flush=True)
            return ms
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
            return None

    def chain(step):
        @jax.jit
        def loop():
            def body(c, _):
                return step(c), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return out

        return loop

    def fwd_train(c):
        ctx = M.Ctx(train=True)
        feats = model.apply(params, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        return (sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-12).astype(jnp.float32)

    def fwd_loss(c):
        ctx = M.Ctx(train=True)
        feats = model.apply(params, state, images + c.astype(images.dtype), train=True, ctx=ctx)
        total, items = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
        return (total * 1e-12).astype(jnp.float32)

    def grad_only(c):
        def lossf(p):
            ctx = M.Ctx(train=True)
            feats = model.apply(p, state, images + c.astype(images.dtype), train=True, ctx=ctx)
            total, items = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
            return total

        g = jax.grad(lossf)(params)
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)) * 1e-12).astype(jnp.float32)

    def full_step(c):
        def lossf(p):
            ctx = M.Ctx(train=True)
            feats = model.apply(p, state, images + c.astype(images.dtype), train=True, ctx=ctx)
            total, items = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
            return total

        g = jax.grad(lossf)(params)
        g, _ = optim.clip_by_global_norm(g, 10.0)
        p2, _ = optim.sgd_update(params, g, opt_state, labels_tree,
                                 jnp.asarray([0.01, 0.01, 0.01]), 0.9, 5e-4)
        e2 = ema_update(ema, p2, jnp.asarray(1))
        return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(e2)[:3]) * 1e-12).astype(jnp.float32)

    r = {}
    r["fwd_train"] = timed("fwd_train (bs=64 amp)", chain(fwd_train))
    r["fwd_loss"] = timed("fwd+loss+TAL", chain(fwd_loss))
    r["grad"] = timed("fwd+bwd (grad)", chain(grad_only))
    r["full"] = timed("full step (grad+clip+SGD+EMA)", chain(full_step))
    if r["fwd_loss"] and r["fwd_train"]:
        print(f"loss+TAL forward-side cost: {r['fwd_loss'] - r['fwd_train']:.2f} ms", flush=True)
    if r["grad"] and r["full"]:
        print(f"optimizer+EMA cost: {r['full'] - r['grad']:.2f} ms", flush=True)
    print("RESULTS", {k: (round(v, 2) if v else None) for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
