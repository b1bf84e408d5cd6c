"""Detection trainer: jitted train step, grad accumulation, EMA, warmup, resume.

TPU-first counterpart of reference engine/trainer.py:43-675. The epoch loop stays
on host; everything per-iteration heavy (forward, loss incl. TAL assignment,
backward, optimizer, EMA) is one compiled XLA graph. Mixed precision is native
bf16 activations (no GradScaler needed on TPU, cf. reference AMP trainer.py:167).
Data parallelism: batches are sharded over a 1-D mesh; params replicated; XLA
inserts the gradient psum (parallel/mesh.py).
"""

from __future__ import annotations

import functools
import math
import time
import warnings
from copy import copy, deepcopy
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.cfg import get_cfg, get_save_dir
from yololite_tpu.data.dataset import build_dataloader, build_yolo_dataset
from yololite_tpu.data.utils import check_det_dataset
from yololite_tpu.engine import optim
from yololite_tpu.models.checkpoint import load_native, save_native
from yololite_tpu.models.model import DetectionModel
from yololite_tpu.models import modules as M
from yololite_tpu.parallel.mesh import make_mesh, mesh_size, replicate_tree, shard_batch
from yololite_tpu.utils import LOGGER, TQDM, colorstr, yaml_save
from yololite_tpu.utils.checks import check_imgsz
from yololite_tpu.utils.ema import ModelEMA, ema_update
from yololite_tpu.utils.loss import build_targets, v8DetectionLoss


def one_cycle(y1=1.0, y2=0.01, steps=100):
    """Cosine ramp y1 -> y2 (reference torch_utils.py:291-293)."""
    return lambda x: max((1 - math.cos(x * math.pi / steps)) / 2, 0) * (y2 - y1) + y1


class EarlyStopping:
    """Patience-based stopper on fitness (reference torch_utils.py:415-458)."""

    def __init__(self, patience: int = 50):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")
        self.possible_stop = False

    def __call__(self, epoch: int, fitness: Optional[float]) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        delta = epoch - self.best_epoch
        self.possible_stop = delta >= (self.patience - 1)
        stop = delta >= self.patience
        if stop:
            LOGGER.info(
                f"Stopping training early as no improvement observed in last {self.patience} epochs. "
                f"Best results observed at epoch {self.best_epoch}."
            )
        return stop


class _AsyncSaver:
    """Single-worker checkpoint writer: latest-wins for routine saves, lossless
    for critical ones.

    The device->host fetch + npz write (~2 s over the sandbox relay) runs off
    the epoch loop; jax arrays are immutable, so captured references stay valid
    while training dispatches the next step. A plain last.npz save may be
    coalesced away by a newer one (same durability class as the reference's
    per-epoch sync save), but a save submitted with critical=True (best.npz /
    periodic epoch{N}.npz) is never dropped: submit blocks until any pending
    critical write has been picked up by the worker. Worker errors are logged
    on the next submit (not silently held until flush) and re-raised at flush.
    """

    def __init__(self):
        import threading

        self._cond = threading.Condition()
        self._pending = None
        self._pending_critical = False
        self._busy = False
        self._error = None
        self._thread = None

    def submit(self, fn, critical: bool = False):
        import threading

        with self._cond:
            if self._error is not None:  # surface persistent failures promptly
                LOGGER.warning(f"checkpoint save failed: {self._error!r} (will re-raise at end of training)")
            if self._thread is None:
                self._thread = threading.Thread(target=self._run, daemon=True, name="ckpt-saver")
                self._thread.start()
            while self._pending is not None and self._pending_critical:
                self._cond.wait()  # never replace a best/periodic write
            self._pending = fn  # latest wins among routine saves
            self._pending_critical = critical
            self._cond.notify_all()

    def _run(self):
        while True:
            with self._cond:
                while self._pending is None:
                    self._cond.wait()
                fn, self._pending = self._pending, None
                self._pending_critical = False
                self._busy = True
                self._cond.notify_all()  # unblock a submit waiting on a critical pickup
            try:
                fn()
            except Exception as e:  # logged on next submit, re-raised at flush()
                self._error = e
            finally:
                with self._cond:
                    self._busy = False
                    self._cond.notify_all()

    def flush(self):
        """Block until the queue is drained; re-raise any worker error."""
        with self._cond:
            while self._pending is not None or self._busy:
                self._cond.wait()
        if self._error is not None:
            err, self._error = self._error, None
            raise err


class DetectionTrainer:
    """Full training engine over a DetectionModel + explicit weight pytrees."""

    def __init__(self, cfg=None, overrides: Optional[Dict] = None):
        self.args = get_cfg(overrides=overrides)
        self.check_resume(overrides or {})
        np.random.seed(self.args.seed)
        self.save_dir = get_save_dir(self.args)
        # record the resolved dir in args so checkpoints carry it and a resumed
        # run reuses the SAME directory (reference cfg/__init__.py:186-187 +
        # trainer.py:558-585: ckpt train_args include save_dir)
        self.args.save_dir = str(self.save_dir)
        self.wdir = self.save_dir / "weights"
        self.batch_size = int(self.args.batch)
        self.epochs = int(self.args.epochs or 100)
        self.start_epoch = 0
        self.epoch = 0
        self.data = check_det_dataset(self.args.data)
        self.model: Optional[DetectionModel] = None
        self.params = None
        self.state = None
        self.ema: Optional[ModelEMA] = None
        self.best_fitness = None
        self.fitness = None
        self.metrics = None
        self.stop_training = False
        self.csv = self.save_dir / "results.csv"
        self.last, self.best = self.wdir / "last.npz", self.wdir / "best.npz"
        self.loss_names = ["box_loss", "cls_loss", "dfl_loss"]
        self.max_gt = 0
        self.mesh = None
        # compile-count hygiene: GT buckets x multi-scale sizes x tail shapes each
        # compile one step variant; track the distinct keys so the count is
        # visible in the log and multi-scale can coarsen its grid if it explodes
        self._step_shapes = set()
        self._ms_quant = 32  # multi-scale size grid (reference trainer.py:426-439 uses /32)
        self._saver = _AsyncSaver()
        self._resume_blob = getattr(self, "_resume_blob", None)

    # ---- model plumbing ----

    def set_model(self, model: DetectionModel, params, state):
        self.model = model
        self.params = params
        self.state = state

    def get_model(self):
        if self.model is None:
            cfg = self.args.model or "yolo11n.yaml"
            if str(cfg).endswith(".pt"):
                from yololite_tpu.models.checkpoint import load_pt

                self.model, self.params, self.state, _ = load_pt(cfg, nc=self.data["nc"])
            else:
                self.model = DetectionModel(cfg, nc=self.data["nc"])
                self.params, self.state = self.model.init(self.args.seed)
        if self.model.nc != self.data["nc"]:
            # rebuild the head for a different class count, keeping backbone
            # weights — from the model's OWN yaml dict, not a stock yolo11 file
            # (a custom architecture must survive the nc swap)
            model2 = DetectionModel(dict(self.model.yaml), nc=self.data["nc"])
            p2, s2 = model2.init(self.args.seed)
            for k in self.params:
                if k != str(model2.rows[-1].i):
                    p2[k], s2[k] = self.params[k], self.state[k]
            self.model, self.params, self.state = model2, p2, s2
        self.model.names = self.data["names"]

    # ---- setup ----

    def _setup_train(self):
        self.get_model()
        self.imgsz = check_imgsz(self.args.imgsz, stride=32, min_dim=1)
        self.args.imgsz = self.imgsz

        devices = jax.devices()
        if len(devices) > 1 and self.batch_size % len(devices) == 0:
            self.mesh = make_mesh()
            LOGGER.info(f"data-parallel over {len(devices)} devices: {devices[0].platform}")

        train_ds = build_yolo_dataset(copy(self.args), self.data["train"], self.batch_size, self.data, mode="train")
        self.train_loader = build_dataloader(train_ds, self.batch_size, self.args.workers, shuffle=True,
                                             seed=self.args.seed)
        self.test_loader = None
        if self.args.val and self.data.get("val"):
            from yololite_tpu.engine.validator import DetectionValidator

            vargs = {k: v for k, v in vars(self.args).items() if not isinstance(v, Path)}
            vargs.update({"mode": "val", "rect": True, "conf": 0.001, "plots": False, "verbose": False,
                          "save_json": False})  # rect val batches, like the reference trainer
            self.validator = DetectionValidator(save_dir=self.save_dir, args=vargs)
        else:
            self.validator = None

        # static GT padding size: dataset max instances (x4 headroom for mosaic)
        max_inst = max((len(lb["cls"]) for lb in train_ds.labels), default=1)
        self.max_gt = min(max(16, int(4.4 * max_inst) + 8), 256)

        self.accumulate = max(round(self.args.nbs / self.batch_size), 1)
        weight_decay = self.args.weight_decay * self.batch_size * self.accumulate / self.args.nbs
        iterations = math.ceil(len(train_ds) / max(self.batch_size, self.args.nbs)) * self.epochs
        self.opt_name, self.lr0, self.momentum = self._resolve_optimizer(iterations)
        self.weight_decay = weight_decay
        self.labels_tree = optim.build_group_labels(self.params)
        self.opt_state = optim.init_state(self.params)
        self.ema = ModelEMA(self.params, self.state)

        # LR schedule
        if self.args.cos_lr:
            self.lf = one_cycle(1, self.args.lrf, self.epochs)
        else:
            self.lf = lambda x: max(1 - x / self.epochs, 0) * (1.0 - self.args.lrf) + self.args.lrf
        self.stopper = EarlyStopping(patience=self.args.patience)

        self.freeze_mask = self._build_freeze_mask()
        if getattr(self.model.detect, "end2end", False):
            # end2end heads train the one2many + one2one branch pair
            # (reference tasks.py init_criterion -> E2EDetectLoss, loss.py:162)
            from yololite_tpu.utils.loss import E2EDetectLoss

            self.loss_fn = E2EDetectLoss(self.model.nc, self.model.strides, self.model.reg_max, hyp=self.args)
        else:
            self.loss_fn = v8DetectionLoss(self.model.nc, self.model.strides, self.model.reg_max, hyp=self.args)
        self._build_step()
        if self._resume_blob is not None:
            self.resume_training(self._resume_blob)

    def _resolve_optimizer(self, iterations):
        name = self.args.optimizer
        lr, momentum = self.args.lr0, self.args.momentum
        if name == "auto":
            nc = self.data["nc"]
            lr_fit = round(0.002 * 5 / (4 + nc), 6)
            name, lr, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)
            self.args.warmup_bias_lr = 0.0
            LOGGER.info(f"optimizer: auto -> {name}(lr={lr}, momentum={momentum})")
        canonical = {x.lower(): x for x in optim.UPDATES}
        name = canonical.get(str(name).lower())
        if name is None:
            raise NotImplementedError(f"optimizer '{self.args.optimizer}' not supported")
        return name, lr, momentum

    def _build_freeze_mask(self):
        """1.0 = trainable, 0.0 = frozen, per leaf (reference trainer.py:143-160)."""
        freeze = self.args.freeze
        frozen_layers = set()
        if isinstance(freeze, int):
            frozen_layers = set(range(freeze))
        elif isinstance(freeze, (list, tuple)):
            frozen_layers = set(int(x) for x in freeze)
        if not frozen_layers:
            return None
        mask = {}
        for k, sub in self.params.items():
            v = 0.0 if int(k) in frozen_layers else 1.0
            mask[k] = jax.tree.map(lambda _: v, sub)
        return mask

    def _build_step(self):
        """Compile grad-accumulation step and optimizer-apply step."""
        model, loss_fn = self.model, self.loss_fn
        half = bool(self.args.amp)
        freeze_mask = self.freeze_mask
        update_fn = optim.UPDATES[self.opt_name]
        weight_decay = self.weight_decay

        def _norm(images):
            """uint8 batches normalize on device (1 byte/px H2D, like reference
            trainer.py:424 img.float()/255); float batches pass through."""
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            return images.astype(jnp.bfloat16) if half else images

        # state/grad_sum are carried: donating them aliases the output buffers
        # in place of a fresh params-sized allocation per micro-step
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def grad_step(params, state, grad_sum, images, gt_labels, gt_bboxes, mask_gt):
            def lossf(p):
                ctx = M.Ctx(train=True)
                x = _norm(images)
                feats = model.apply(p, state, x, train=True, ctx=ctx)
                # feats stay bf16 on the amp path; the loss upcasts to fp32 at its
                # softmax/BCE/accumulation boundaries (fused, no fp32 materialization)
                total, items = loss_fn(feats, {"gt_labels": gt_labels, "gt_bboxes": gt_bboxes, "mask_gt": mask_gt})
                return total, (items, ctx.updates)

            (total, (items, bn_updates)), grads = jax.value_and_grad(lossf, has_aux=True)(params)
            if freeze_mask is not None:
                grads = jax.tree.map(lambda g, m: g * m, grads, freeze_mask)
            grad_sum = jax.tree.map(lambda a, g: a + g, grad_sum, grads)
            new_state = _merge_bn(state, bn_updates)
            return grad_sum, new_state, total, items

        def _merge_bn(state, updates):
            def rebuild(node, path, upd):
                if not path:
                    return {**node, "mean": jax.lax.stop_gradient(upd["mean"]),
                            "var": jax.lax.stop_gradient(upd["var"])}
                head = path[0]
                return {**node, head: rebuild(node[head], path[1:], upd)}

            for path, upd in updates.items():
                state = rebuild(state, list(path), upd)
            return state

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
        def apply_step(params, opt_state, grad_sum, ema_params, ema_state, state, lr_vec, momentum, ema_updates):
            grads, gnorm = optim.clip_by_global_norm(grad_sum, 10.0)
            params, opt_state = update_fn(params, grads, opt_state, self.labels_tree, lr_vec, momentum,
                                          weight_decay, trainable=freeze_mask)
            ema_params = ema_update(ema_params, params, ema_updates)
            ema_state = ema_update(ema_state, state, ema_updates)
            zero = jax.tree.map(jnp.zeros_like, grads)
            return params, opt_state, zero, ema_params, ema_state, gnorm

        # Steady-state accumulate==1 (batch >= nbs): one fused dispatch per
        # iteration -- grads feed clip+update+EMA inside a single XLA program, so
        # the params-sized grad_sum never round-trips HBM, the zeroing pass
        # disappears, and the optimizer update overlaps the tail of the backward.
        # Same math as grad_step(grad_sum=0) + apply_step (grad_sum=0+g == g);
        # results agree to float32 last-ulp (fusion/FMA order differs across the
        # two compilations). Only built when the whole run keeps accumulate==1,
        # so each (shape, bucket) key compiles one variant.
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
        def fused_step(params, opt_state, ema_params, ema_state, state,
                       images, gt_labels, gt_bboxes, mask_gt, lr_vec, momentum, ema_updates):
            def lossf(p):
                ctx = M.Ctx(train=True)
                x = _norm(images)
                feats = model.apply(p, state, x, train=True, ctx=ctx)
                total, items = loss_fn(feats, {"gt_labels": gt_labels, "gt_bboxes": gt_bboxes, "mask_gt": mask_gt})
                return total, (items, ctx.updates)

            (total, (items, bn_updates)), grads = jax.value_and_grad(lossf, has_aux=True)(params)
            if freeze_mask is not None:
                grads = jax.tree.map(lambda g, m: g * m, grads, freeze_mask)
            new_state = _merge_bn(state, bn_updates)
            grads, gnorm = optim.clip_by_global_norm(grads, 10.0)
            params, opt_state = update_fn(params, grads, opt_state, self.labels_tree, lr_vec, momentum,
                                          weight_decay, trainable=freeze_mask)
            ema_params = ema_update(ema_params, params, ema_updates)
            ema_state = ema_update(ema_state, new_state, ema_updates)
            return params, opt_state, ema_params, ema_state, new_state, total, items, gnorm

        self._grad_step = grad_step
        self._apply_step = apply_step
        # use only when accumulate==1 for the entire run (incl. warmup, which
        # interpolates between 1 and nbs/batch -- constant 1 when batch >= nbs)
        steady = max(round(self.args.nbs / self.batch_size), 1)
        self._fused_step = fused_step if steady == 1 else None

    # ---- main loop ----

    def train(self):
        self._setup_train()
        nb = len(self.train_loader)
        nw = max(round(self.args.warmup_epochs * nb), 100) if self.args.warmup_epochs > 0 else -1
        last_opt_step = -1
        ema_updates = self.ema.updates
        train_time_start = time.time()

        self.params = replicate_tree(self.mesh, self.params)
        self.state = replicate_tree(self.mesh, self.state)
        # the fused accumulate==1 path never touches grad_sum: skip the
        # params-sized allocation (and its mesh replicas) entirely
        grad_sum = None if self._fused_step is not None else jax.tree.map(jnp.zeros_like, self.params)
        ema_params, ema_state = replicate_tree(self.mesh, self.ema.ema_params), replicate_tree(
            self.mesh, self.ema.ema_state
        )
        opt_state = self.opt_state

        LOGGER.info(
            f"Image sizes {self.imgsz} train, {self.imgsz} val\n"
            f"Using {self.args.workers} dataloader workers\n"
            f"Logging results to {colorstr('bold', self.save_dir)}\n"
            f"Starting training for {self.epochs} epochs..."
        )
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.wdir.mkdir(parents=True, exist_ok=True)

        epoch = self.start_epoch
        try:
            self._train_epochs(epoch, nb, nw, grad_sum, opt_state, ema_params, ema_state,
                               ema_updates, last_opt_step, train_time_start)
        finally:
            # drain pending checkpoint writes even when the loop raises
            # (KeyboardInterrupt, data error): last.npz stays consistent and a
            # persistent save failure surfaces instead of dying with the run --
            # but never let a stale saver error REPLACE an in-flight exception
            import sys as _sys

            try:
                self._saver.flush()
            except Exception as save_err:
                if _sys.exc_info()[0] is None:
                    raise
                LOGGER.warning(f"checkpoint saver error during shutdown: {save_err!r}")
        LOGGER.info(f"\n{self.epochs} epochs completed in {(time.time() - train_time_start) / 3600:.3f} hours.")
        self.final_eval()
        return self.metrics

    def _train_epochs(self, epoch, nb, nw, grad_sum, opt_state, ema_params, ema_state,
                      ema_updates, last_opt_step, train_time_start):
        epoch_time_start = time.time()
        while epoch < self.epochs:
            self.epoch = epoch
            if epoch == (self.epochs - self.args.close_mosaic) and self.args.close_mosaic:
                LOGGER.info("Closing dataloader mosaic")
                self.train_loader.dataset.close_mosaic(hyp=copy(self.args))

            tloss = None
            pbar = TQDM(enumerate(self.train_loader), total=nb, desc=f"epoch {epoch + 1}/{self.epochs}")
            for i, batch in pbar:
                ni = i + nb * epoch
                if ni <= nw:
                    xi = [0, nw]
                    self.accumulate = max(1, int(np.interp(ni, xi, [1, self.args.nbs / self.batch_size]).round()))
                    lr_vec = np.array(
                        [
                            np.interp(ni, xi, [self.args.warmup_bias_lr, self.lr0 * self.lf(epoch)]),  # bias
                            np.interp(ni, xi, [0.0, self.lr0 * self.lf(epoch)]),  # weights
                            np.interp(ni, xi, [0.0, self.lr0 * self.lf(epoch)]),  # bn
                        ],
                        np.float32,
                    )
                    momentum = float(np.interp(ni, xi, [self.args.warmup_momentum, self.momentum]))
                else:
                    lr = self.lr0 * self.lf(epoch)
                    lr_vec = np.array([lr, lr, lr], np.float32)
                    momentum = self.momentum

                batch = self.preprocess_batch(batch)
                images = shard_batch(self.mesh, batch["img"])
                # bucket the static GT pad to this batch's actual max count (next pow2,
                # >=16): TAL's dense (B,M,A) grids scale with M, so sparse batches run
                # far cheaper than the dataset-wide max_gt; jit caches per bucket
                counts = np.bincount(
                    np.asarray(batch["batch_idx"]).astype(int), minlength=batch["img"].shape[0]
                )
                need = max(16, int(counts.max(initial=16)))
                m_bucket = min(self.max_gt, 1 << (need - 1).bit_length())
                targets = build_targets(batch, batch["img"].shape[0], batch["img"].shape[1:3], m_bucket)
                targets = shard_batch(self.mesh, targets)
                self._track_compiles(batch["img"].shape, m_bucket)

                if self._fused_step is not None:
                    # accumulate==1 for the whole run: single dispatch per step
                    ema_updates += 1
                    (self.params, opt_state, ema_params, ema_state, self.state,
                     total, items, gnorm) = self._fused_step(
                        self.params, opt_state, ema_params, ema_state, self.state, images,
                        targets["gt_labels"], targets["gt_bboxes"], targets["mask_gt"],
                        jnp.asarray(lr_vec), jnp.asarray(momentum, jnp.float32), jnp.asarray(ema_updates),
                    )
                    last_opt_step = ni
                else:
                    grad_sum, self.state, total, items = self._grad_step(
                        self.params, self.state, grad_sum, images,
                        targets["gt_labels"], targets["gt_bboxes"], targets["mask_gt"],
                    )
                    if ni - last_opt_step >= self.accumulate:
                        ema_updates += 1
                        self.params, opt_state, grad_sum, ema_params, ema_state, gnorm = self._apply_step(
                            self.params, opt_state, grad_sum, ema_params, ema_state, self.state,
                            jnp.asarray(lr_vec), jnp.asarray(momentum, jnp.float32), jnp.asarray(ema_updates),
                        )
                        last_opt_step = ni
                # running mean stays a device array: fetching `items` here would
                # sync the host to every step and stall dispatch pipelining (the
                # host must stay ahead, preparing the next batch)
                tloss = items if tloss is None else (tloss * i + items) / (i + 1)

                if i % max(nb // 4, 1) == 0:
                    t = np.asarray(tloss)  # the only in-epoch device fetch
                    pbar.set_description(
                        f"epoch {epoch + 1}/{self.epochs} box {t[0]:.3f} cls {t[1]:.3f} dfl {t[2]:.3f}"
                    )

            self.ema.ema_params, self.ema.ema_state, self.ema.updates = ema_params, ema_state, ema_updates
            self.opt_state = opt_state
            self.lr = {f"lr/pg{j}": float(lr_vec[j]) for j in range(3)}

            final_epoch = epoch + 1 >= self.epochs
            self.fitness = None
            if self.validator is not None and (self.args.val or final_epoch):
                self.metrics = self.validate()
            self.stop_training = self.stopper(epoch, self.fitness)
            if self.args.time:
                self.stop_training |= (time.time() - train_time_start) > self.args.time * 3600

            self.save_metrics(epoch, np.asarray(tloss) if tloss is not None else None)
            LOGGER.info(f"compiled train-step variants so far: {len(self._step_shapes)} "
                        f"(batch-shape x GT-bucket keys)")
            if self.args.save:
                self.save_model(epoch)
            epoch_time_start = time.time()
            if self.stop_training:
                break
            epoch += 1

    # ---- hooks ----

    def preprocess_batch(self, batch):
        """Multi-scale resize on host (reference trainer.py:423-440).

        Sizes snap to self._ms_quant (32 like the reference; coarsened to 64 if
        the jit cache grows past a dozen step variants — each distinct size
        compiles its own XLA graph).
        """
        if self.args.multi_scale:
            import cv2

            q = self._ms_quant
            imgsz = self.imgsz if isinstance(self.imgsz, int) else self.imgsz[0]
            # clamp at one grid cell: a draw below q would floor to sz=0 (small
            # imgsz after the /64 coarsening) and crash cv2.resize
            sz = max((np.random.randint(int(imgsz * 0.5), int(imgsz * 1.5 + 32)) // q) * q, q)
            if sz != batch["img"].shape[1]:
                batch["img"] = np.stack(
                    [cv2.resize(im, (sz, sz), interpolation=cv2.INTER_LINEAR) for im in batch["img"]]
                )
        return batch

    def _track_compiles(self, images_shape, m_bucket):
        """Record the (batch shape, GT bucket) jit-cache key; coarsen multi-scale
        when the compiled-variant count exceeds ~a dozen."""
        self._step_shapes.add((*images_shape, m_bucket))
        n = len(self._step_shapes)
        if self.args.multi_scale and n > 12 and self._ms_quant < 64:
            self._ms_quant = 64
            LOGGER.warning(
                f"multi-scale training compiled {n} step variants; coarsening the "
                f"size grid from /32 to /64 to bound the jit cache"
            )

    def validate(self):
        v = self.validator
        v.args.plots = False
        stats = v(trainer=self)
        fitness = stats.get("fitness", -np.inf)
        self.fitness = fitness
        if self.best_fitness is None or fitness > self.best_fitness:
            self.best_fitness = fitness
        return stats

    # ---- persistence ----

    def _train_meta(self, epoch):
        return {
            "epoch": epoch,
            "best_fitness": float(self.best_fitness) if self.best_fitness is not None else None,
            "ema_updates": self.ema.updates,
            # full yaml dict, not a stock-name guess: a custom architecture must
            # reload as itself (json-safe; DetectionModel accepts dicts)
            "cfg": dict(self.model.yaml),
            "nc": self.model.nc,
            "names": self.model.names,
            "args": {k: v for k, v in vars(self.args).items() if not isinstance(v, Path)},
            "date": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }

    def save_model(self, epoch):
        """Save last/best: EMA weights + optimizer state for resume (trainer.py:360-388).

        Runs on the async saver thread: the ~2 s device->host fetch overlaps the
        next epoch's dispatched work instead of stalling the loop.
        """
        meta = self._train_meta(epoch)
        opt_flat = {"mu": self.opt_state.mu, "nu": self.opt_state.nu}
        blob_state = {
            "model_state": self.ema.ema_state,
            "raw_params": self.params,
            "raw_state": self.state,
            "opt": opt_flat,
        }
        # the jitted step donates its buffers (donate_argnums), which DELETES the
        # current arrays once the next step dispatches -- snapshot with a cheap
        # device-side copy (x+0) so the async fetch reads stable buffers
        snap = lambda t: jax.tree.map(lambda x: x + 0 if isinstance(x, jax.Array) else x, t)
        blob_state = snap(blob_state)
        ema_params = snap(self.ema.ema_params)
        is_best = (self.best_fitness is not None and self.fitness is not None
                   and self.best_fitness == self.fitness)
        periodic = self.args.save_period > 0 and epoch % self.args.save_period == 0

        def _write():
            save_native(self.last, ema_params, blob_state, meta)
            if is_best:
                save_native(self.best, ema_params, blob_state, meta)
            if periodic:
                save_native(self.wdir / f"epoch{epoch}.npz", ema_params, blob_state, meta)

        # every epoch-final save is critical: the saver must never coalesce one
        # away behind a newer write, matching the reference's durability class
        # (it persists last.pt synchronously every epoch, trainer.py:384-388) —
        # a crash after epoch N always resumes from N, never N-1. Costs at most
        # one in-flight write's wait per submit, negligible at real epoch times.
        self._saver.submit(_write, critical=True)

    def save_metrics(self, epoch, tloss):
        """Append one row to results.csv (reference trainer.py:529-536).

        The column schema is pinned at the first write (resumes re-adopt the
        existing header) so rows written before the first validation — e.g.
        args.val=False until the final epoch — carry the same columns as rows
        written after it, instead of silently growing wider than the header.
        """
        metrics = dict(self.metrics or {})
        if not hasattr(self, "_csv_keys"):
            if self.csv.exists():  # resume: adopt the file's existing schema
                self._csv_keys = self.csv.read_text(encoding="utf-8").splitlines()[0].split(",")
            else:
                metric_keys = list(metrics.keys()) or (
                    list(self.validator.metrics.keys) + ["fitness"] if self.validator is not None else []
                )
                self._csv_keys = ["epoch", *self.loss_names, *metric_keys, "lr/pg0", "lr/pg1", "lr/pg2"]
        row = dict(zip(self.loss_names, [float(x) for x in (tloss if tloss is not None else [0, 0, 0])]))
        row["epoch"] = epoch + 1
        row.update({k: float(v) for k, v in metrics.items()})
        row.update({f"lr/pg{j}": self.lr.get(f"lr/pg{j}", 0.0) for j in range(3)})
        header = "" if self.csv.exists() else ",".join(self._csv_keys) + "\n"
        with open(self.csv, "a", encoding="utf-8") as f:
            f.write(header + ",".join(f"{row.get(k, 0.0)}" for k in self._csv_keys) + "\n")

    def final_eval(self):
        """Re-validate best checkpoint with plots (reference trainer.py:543-556)."""
        if self.best.exists() and self.validator is not None:
            params, state, meta = load_native(self.best)
            self.ema.ema_params = params
            self.ema.ema_state = state["model_state"]
            LOGGER.info(f"\nValidating {self.best}...")
            self.validator.args.plots = self.args.plots
            self.metrics = self.validator(
                model=self.model, params=params, state=state["model_state"]
            )

    # ---- resume ----

    def check_resume(self, overrides):
        resume = self.args.resume
        if not resume:
            return
        last = Path(resume if isinstance(resume, (str, Path)) and Path(str(resume)).exists() else "")
        if not last or not str(last).endswith(".npz"):
            from yololite_tpu.utils import get_latest_run

            last = get_latest_run()
            if not last:
                raise FileNotFoundError("resume requested but no last.npz found")
        params, state, meta = load_native(last)
        args = meta.get("args", {})
        args["resume"] = True
        for k in ("imgsz", "batch", "device", "close_mosaic"):
            if k in overrides:
                args[k] = overrides[k]
        self.args = get_cfg(overrides=dict(args))
        if args.get("save_dir"):  # get_cfg drops non-schema keys; reuse the run dir
            self.args.save_dir = args["save_dir"]
        self._resume_blob = (params, state, meta)

    def resume_training(self, blob):
        from yololite_tpu.models.checkpoint import conform_tree

        params, state, meta = blob
        pt, st = self.params, self.state  # fresh-init structure templates
        self.ema.ema_params = conform_tree(pt, params)
        self.ema.ema_state = conform_tree(st, state["model_state"])
        self.ema.updates = int(meta.get("ema_updates", 0))
        self.params = conform_tree(pt, state["raw_params"])
        self.state = conform_tree(st, state["raw_state"])
        self.opt_state = optim.OptState(
            step=jnp.asarray(self.ema.updates, jnp.int32),
            mu=conform_tree(pt, state["opt"]["mu"]),
            nu=conform_tree(pt, state["opt"]["nu"]),
            extra=jnp.asarray(
                optim.nadam_mu_product(self.ema.updates, self.momentum)
                if self.opt_name == "NAdam" else 1.0, jnp.float32,
            ),
        )
        self.best_fitness = meta.get("best_fitness")
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        if self.start_epoch >= self.epochs - self.args.close_mosaic:
            self.train_loader.dataset.close_mosaic(hyp=copy(self.args))
        LOGGER.info(f"Resuming training from epoch {self.start_epoch}")
        self._resume_blob = None
