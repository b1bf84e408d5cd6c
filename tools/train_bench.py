"""Training-step throughput benchmark (full jitted step: forward+TAL loss+backward
+clip+SGD+EMA) at 640px. Usage: python tools/train_bench.py [batch] [amp]"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(batch=16, amp="0"):
    batch = int(batch)
    amp = str(amp) == "1"
    import jax
    import jax.numpy as jnp

    from yololite_tpu.engine import optim
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models import modules as M
    from yololite_tpu.utils.ema import ema_update
    from yololite_tpu.utils.loss import build_targets, v8DetectionLoss

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    loss_fn = v8DetectionLoss(model.nc, model.strides, model.reg_max)
    labels_tree = optim.build_group_labels(params)
    opt_state = optim.init_state(params)

    S, MG = 640, 16  # bucketed GT pad (trainer buckets per batch; 4 GT/img here)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(rng.random((batch, S, S, 3), np.float32)))
    t = build_targets(
        {
            "batch_idx": np.repeat(np.arange(batch, dtype=np.float32), 4),
            "cls": np.tile(np.arange(4, dtype=np.float32)[:, None], (batch, 1)),
            "bboxes": np.tile(rng.uniform(0.2, 0.8, (4, 4)).astype(np.float32), (batch, 1)),
        },
        batch, (S, S), MG,
    )
    t = {k: jax.device_put(jnp.asarray(v)) for k, v in t.items()}

    @jax.jit
    def step(params, state, opt_state, ema, images, gl, gb, mg, lr):
        def lossf(p):
            ctx = M.Ctx(train=True)
            x = images.astype(jnp.bfloat16) if amp else images
            feats = model.apply(p, state, x, train=True, ctx=ctx)
            total, items = loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})
            return total, items

        (total, items), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        grads, _ = optim.clip_by_global_norm(grads, 10.0)
        lr_vec = jnp.stack([lr, lr, lr])
        params, opt_state = optim.sgd_update(params, grads, opt_state, labels_tree, lr_vec, 0.9, 5e-4)
        ema = ema_update(ema, params, jnp.asarray(1))
        return params, opt_state, ema, total

    ITERS = 10
    ema = jax.tree.map(jnp.copy, params)

    # Timing: chain the jitted step through its own carried pytrees (params ->
    # next call) and force with ONE scalar fetch at the end. NEVER lax.scan the
    # full training step on this tunnel: a scan-of-train-step wedged the remote
    # compiler for hours (docs/PERF.md round-3 tunnel facts).
    def chain(params, opt_state, ema):
        total = jnp.float32(0)
        for _ in range(ITERS):
            params, opt_state, ema, total = step(
                params, state, opt_state, ema, images, t["gt_labels"], t["gt_bboxes"],
                t["mask_gt"], jnp.float32(0.01))
        return params, opt_state, ema, total

    t0 = time.perf_counter()
    p1, o1, e1, total = chain(params, opt_state, ema)
    float(total)  # compile + one chain
    print(f"compile+{ITERS} chained steps: {time.perf_counter() - t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, _, _, total = chain(params, opt_state, ema)
        float(total)  # one sync forces the whole dependent chain
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"train step bs={batch} 640px amp={amp}: {best * 1e3:.1f} ms/step -> {batch / best:.0f} img/s")


if __name__ == "__main__":
    main(*sys.argv[1:]) if sys.argv[1:] else main()
