"""Training engine tests: coco8 convergence smoke, checkpoints, resume, EMA."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference mount not present")


def test_optim_sgd_matches_torch():
    """Our SGD update math == torch.optim.SGD (nesterov, momentum, weight decay)."""
    import torch
    import jax.numpy as jnp

    from yololite_tpu.engine import optim

    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    g1 = rng.standard_normal((4, 3)).astype(np.float32)
    g2 = rng.standard_normal((4, 3)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, nesterov=True, weight_decay=0.0005)
    for g in (g1, g2):
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    params = {"w": jnp.asarray(w)}
    labels = {"w": optim.GROUP_WEIGHT}
    st = optim.init_state(params)
    lr_vec = jnp.asarray([0.01, 0.01, 0.01])
    for g in (g1, g2):
        params, st = optim.sgd_update(params, {"w": jnp.asarray(g)}, st, labels, lr_vec, 0.9, 0.0005)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_optim_adamw_matches_torch():
    import torch
    import jax.numpy as jnp

    from yololite_tpu.engine import optim

    rng = np.random.default_rng(1)
    w = rng.standard_normal((5,)).astype(np.float32)
    grads = [rng.standard_normal((5,)).astype(np.float32) for _ in range(3)]

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    topt = torch.optim.AdamW([tw], lr=0.002, betas=(0.9, 0.999), weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    params = {"w": jnp.asarray(w)}
    labels = {"w": optim.GROUP_WEIGHT}
    st = optim.init_state(params)
    lr_vec = jnp.asarray([0.002] * 3)
    for g in grads:
        params, st = optim.adamw_update(params, {"w": jnp.asarray(g)}, st, labels, lr_vec, 0.9, 0.01)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_ema_decay_formula():
    import jax.numpy as jnp

    from yololite_tpu.utils.ema import ema_decay, ema_update

    d = float(ema_decay(jnp.asarray(2000)))
    assert abs(d - 0.9999 * (1 - np.exp(-1))) < 1e-6
    ema = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    out = ema_update(ema, new, jnp.asarray(1))
    expected = 0.9999 * (1 - np.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(out["w"]), expected, rtol=1e-4)


@needs_ref
def test_train_coco8_two_epochs(tmp_path):
    """1-epoch-style integration: loss finite & decreasing trend, ckpts written."""
    from yololite_tpu import YOLOLite

    m = YOLOLite("yolo11n.yaml")
    metrics = m.train(
        data=str(REFERENCE / "coco8" / "coco8.yaml"),
        epochs=3,
        imgsz=160,
        batch=4,
        workers=2,
        project=str(tmp_path / "runs"),
        name="t1",
        close_mosaic=0,
        warmup_epochs=0.5,
        val=True,
        plots=False,
        save=True,
        optimizer="SGD",
        lr0=0.01,
    )
    run_dir = tmp_path / "runs" / "t1"
    assert (run_dir / "weights" / "last.npz").exists()
    assert (run_dir / "results.csv").exists()
    rows = (run_dir / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 4  # header + 3 epochs
    losses = np.array([[float(v) for v in r.split(",")[1:4]] for r in rows[1:]])
    assert np.isfinite(losses).all()
    # box+cls+dfl total should not explode over 3 tiny epochs
    assert losses[-1].sum() < losses[0].sum() * 1.5


@needs_ref
def test_train_resume(tmp_path):
    from yololite_tpu import YOLOLite
    from yololite_tpu.engine.trainer import DetectionTrainer

    m = YOLOLite("yolo11n.yaml")
    m.train(
        data=str(REFERENCE / "coco8" / "coco8.yaml"),
        epochs=2, imgsz=128, batch=4, workers=2,
        project=str(tmp_path / "runs"), name="r1",
        close_mosaic=0, val=False, plots=False, save=True, optimizer="SGD",
    )
    last = tmp_path / "runs" / "r1" / "weights" / "last.npz"
    assert last.exists()

    t = DetectionTrainer(overrides={
        "resume": str(last), "data": str(REFERENCE / "coco8" / "coco8.yaml"),
        "epochs": 4, "mode": "train", "project": str(tmp_path / "runs"), "name": "r1b",
        "val": False, "plots": False, "workers": 2,
    })
    assert t.start_epoch == 0  # set later, in _setup_train via resume blob
    # resume reuses the original run dir (ckpt args carry save_dir, reference
    # cfg/__init__.py:186-187) -- the 'r1b' name override must NOT win
    assert t.save_dir == tmp_path / "runs" / "r1"
    t.epochs = 4
    t.train()
    assert t.epoch >= 2  # continued past the restored epoch


@needs_ref
def test_train_auto_optimizer_adamw(tmp_path):
    """optimizer='auto' resolves to AdamW for small datasets and trains 1 epoch."""
    from yololite_tpu import YOLOLite

    m = YOLOLite("yolo11n.yaml")
    m.train(
        data=str(REFERENCE / "coco8" / "coco8.yaml"),
        epochs=1, imgsz=128, batch=4, workers=2,
        project=str(tmp_path / "runs"), name="adamw",
        close_mosaic=0, val=False, plots=False, save=False, optimizer="auto",
    )
    t = m.trainer
    assert t.opt_name == "AdamW"
    assert abs(t.lr0 - round(0.002 * 5 / 84, 6)) < 1e-9
    assert t.args.warmup_bias_lr == 0.0


@needs_ref
def test_native_save_load_roundtrip_predict(tmp_path):
    """YOLOLite.save -> load: identical detections."""
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from tests.test_model_parity import _build_reference_model

    tm = _build_reference_model("n")
    tm.args = {"imgsz": 160}
    pt = tmp_path / "w.pt"
    torch.save({"model": tm}, str(pt))

    from yololite_tpu import YOLOLite

    m1 = YOLOLite(str(pt))
    npz = tmp_path / "w.npz"
    m1.save(npz)
    m2 = YOLOLite(str(npz))

    img = np.random.default_rng(3).integers(0, 255, (160, 160, 3), np.uint8)
    r1 = m1.predict([img], conf=1e-6, imgsz=160, verbose=False, save=False)[0]
    r2 = m2.predict([img], conf=1e-6, imgsz=160, verbose=False, save=False)[0]
    np.testing.assert_allclose(r1.boxes.data, r2.boxes.data, rtol=1e-4, atol=1e-3)


def test_frozen_params_not_decayed():
    """Frozen leaves (trainable=0) must not move: no decay, no update (ADVICE r1 #2).

    Torch skips grad-less params entirely; with the freeze mask zeroing only the
    gradient, weight decay would still shrink frozen weights every step.
    """
    import jax.numpy as jnp

    from yololite_tpu.engine import optim

    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"a": jnp.asarray(w), "b": jnp.asarray(w.copy())}
    labels = {"a": optim.GROUP_WEIGHT, "b": optim.GROUP_WEIGHT}
    trainable = {"a": 0.0, "b": 1.0}
    lr_vec = jnp.asarray([0.01, 0.01, 0.01])
    zero_g = {"a": jnp.zeros_like(params["a"]), "b": jnp.zeros_like(params["b"])}

    for update, extra in (
        (optim.sgd_update, dict(momentum=0.9, weight_decay=0.05)),
        (optim.adamw_update, dict(beta1=0.9, weight_decay=0.05)),
        (optim.adam_update, dict(beta1=0.9, weight_decay=0.05)),
        (optim.rmsprop_update, dict(momentum=0.9, weight_decay=0.05)),
    ):
        p, st = dict(params), optim.init_state(params)
        for _ in range(3):
            p, st = update(p, zero_g, st, labels, lr_vec, *extra.values(), trainable=trainable)
        np.testing.assert_array_equal(np.asarray(p["a"]), w, err_msg=f"{update.__name__} moved frozen leaf")
        assert not np.allclose(np.asarray(p["b"]), w), f"{update.__name__} failed to decay trainable leaf"


def test_validator_uses_ema_bn_state():
    """Mid-train validation must pair EMA params with EMA'd BN stats (ADVICE r1 #1)."""
    import inspect

    from yololite_tpu.engine import validator as V

    src = inspect.getsource(V.DetectionValidator.__call__)
    assert "ema.ema_state" in src


@pytest.mark.parametrize("name", ["Adamax", "NAdam", "RAdam"])
def test_optim_exotic_matches_torch(name):
    """Adamax/NAdam/RAdam match torch.optim trajectories exactly (VERDICT r1 #4)."""
    import torch
    import jax.numpy as jnp

    from yololite_tpu.engine import optim

    rng = np.random.default_rng(2)
    w = rng.standard_normal((5, 4)).astype(np.float32)
    gs = [rng.standard_normal((5, 4)).astype(np.float32) for _ in range(6)]

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    tcls = {"Adamax": torch.optim.Adamax, "NAdam": torch.optim.NAdam, "RAdam": torch.optim.RAdam}[name]
    topt = tcls([tw], lr=0.01, betas=(0.9, 0.999), weight_decay=0.0005)
    for g in gs:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    params = {"w": jnp.asarray(w)}
    labels = {"w": optim.GROUP_WEIGHT}
    st = optim.init_state(params)
    lr_vec = jnp.asarray([0.01, 0.01, 0.01])
    update = optim.UPDATES[name]
    for g in gs:
        params, st = update(params, {"w": jnp.asarray(g)}, st, labels, lr_vec, 0.9, 0.0005)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_nadam_mu_product_resume():
    """nadam_mu_product(t) reproduces the running product after t steps."""
    import jax.numpy as jnp

    from yololite_tpu.engine import optim

    params = {"w": jnp.ones((2, 2))}
    labels = {"w": optim.GROUP_WEIGHT}
    st = optim.init_state(params)
    g = {"w": jnp.full((2, 2), 0.1)}
    lr_vec = jnp.asarray([0.01, 0.01, 0.01])
    for _ in range(7):
        params, st = optim.nadam_update(params, g, st, labels, lr_vec, 0.9, 0.0)
    np.testing.assert_allclose(float(st.extra), optim.nadam_mu_product(7, 0.9), rtol=1e-6)


def test_early_stopping_patience():
    from yololite_tpu.engine.trainer import EarlyStopping

    es = EarlyStopping(patience=3)
    assert es(0, 0.5) is False
    assert es(1, 0.4) is False          # no improvement, delta 1
    assert es(2, 0.45) is False         # delta 2 -> possible_stop
    assert es.possible_stop
    assert es(3, 0.3) is True           # delta 3 == patience -> stop
    # improvement resets the window
    es2 = EarlyStopping(patience=2)
    es2(0, 0.1); es2(1, 0.2); es2(2, 0.3)
    assert es2(3, 0.25) is False and es2(4, 0.25) is True
    # patience=0 -> infinite (reference torch_utils.py:424)
    es3 = EarlyStopping(patience=0)
    assert not any(es3(e, 0.0 if e else 1.0) for e in range(200))


def test_strip_optimizer(tmp_path):
    import numpy as np

    from yololite_tpu.models.checkpoint import load_native, save_native, strip_optimizer

    params = {"0": {"conv": {"w": np.ones((3, 3, 3, 8), np.float32)}}}
    state = {"model_state": {"0": {"bn": {"mean": np.zeros(8), "var": np.ones(8)}}},
             "optimizer": {"mu": np.zeros(8)}}
    meta = {"epoch": 7, "ema_updates": 123, "best_fitness": 0.5}
    p = tmp_path / "last.npz"
    save_native(p, params, state, meta)
    out = strip_optimizer(p)
    p2, s2, m2 = load_native(out)
    assert m2["epoch"] == -1 and "ema_updates" not in m2
    assert "optimizer" not in s2  # training state gone, model stats kept
    assert "0" in s2
    np.testing.assert_array_equal(np.asarray(p2["0"]["conv"]["w"]), params["0"]["conv"]["w"])


def test_async_saver_critical_never_dropped():
    """A best/periodic write pending on the saver must never be coalesced away
    by a later routine save (ADVICE r2: best.npz silently held stale weights)."""
    import threading
    import time

    from yololite_tpu.engine.trainer import _AsyncSaver

    s = _AsyncSaver()
    order = []
    gate = threading.Event()
    s.submit(lambda: (gate.wait(5), order.append("slow")))
    time.sleep(0.2)  # worker picks it up and blocks on the gate
    s.submit(lambda: order.append("best"), critical=True)  # pending critical
    submitted = []
    th = threading.Thread(target=lambda: (s.submit(lambda: order.append("routine")),
                                          submitted.append(1)))
    th.start()
    time.sleep(0.2)
    assert not submitted  # routine submit blocks while a critical write is pending
    gate.set()
    th.join(5)
    s.flush()
    assert order == ["slow", "best", "routine"]


def test_async_saver_error_surfaces():
    """Worker errors re-raise at flush (and are logged on later submits)."""
    import pytest

    from yololite_tpu.engine.trainer import _AsyncSaver

    s = _AsyncSaver()
    s.submit(lambda: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(OSError, match="disk full"):
        s.flush()
    s.submit(lambda: None)  # saver still usable after the error
    s.flush()


def test_save_native_atomic(tmp_path):
    """save_native never leaves a torn file: tmp write + os.replace."""
    import numpy as np

    from yololite_tpu.models.checkpoint import load_native, save_native

    p = tmp_path / "w" / "last.npz"
    save_native(p, {"a": np.arange(4.0)}, {"s": np.ones(2)}, {"epoch": 3})
    assert p.exists() and not list(p.parent.glob("*.tmp"))
    params, state, meta = load_native(p)
    np.testing.assert_array_equal(params["a"], np.arange(4.0))
    assert meta["epoch"] == 3


def test_fused_step_matches_two_phase(tmp_path):
    """The accumulate==1 fused step (grad+clip+update+EMA in one jit) matches
    grad_step(grad_sum=0) + apply_step to float32 last-ulp (the two graphs
    compile with different fusion/FMA contraction order, so bit-exactness
    across the jit boundary is not guaranteed -- the math is the same)."""
    import jax
    import jax.numpy as jnp

    from yololite_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides={
        "model": "yolo11n.yaml", "data": str(REFERENCE / "coco8" / "coco8.yaml"),
        "epochs": 1, "imgsz": 128, "batch": 4, "nbs": 4, "workers": 0, "mode": "train",
        "project": str(tmp_path / "runs"), "name": "fused", "val": False, "plots": False,
        "optimizer": "SGD", "amp": False,
    })
    t._setup_train()
    assert t._fused_step is not None  # nbs == batch -> accumulate stays 1

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 128, 128, 3), np.float32))
    M = 16
    gl = jnp.asarray(rng.integers(0, 80, (4, M, 1)), jnp.int32)
    gb = jnp.asarray(np.sort(rng.uniform(5, 120, (4, M, 2, 2)), axis=2).reshape(4, M, 4), jnp.float32)
    mg = jnp.ones((4, M, 1), jnp.float32)
    lr = jnp.asarray(np.array([0.01, 0.01, 0.01], np.float32))
    mom = jnp.float32(0.9)
    upd = jnp.asarray(3)

    copy_tree = lambda tr: jax.tree.map(lambda x: jnp.array(x, copy=True), tr)
    ema_p, ema_s = copy_tree(t.params), copy_tree(t.state)

    # two-phase reference result (copies: grad_step/apply_step donate buffers)
    zero = jax.tree.map(jnp.zeros_like, t.params)
    gs, st2, total2, items2 = t._grad_step(t.params, copy_tree(t.state), zero, images, gl, gb, mg)
    p2, _, _, ep2, es2, _ = t._apply_step(
        copy_tree(t.params), copy_tree(t.opt_state), gs, copy_tree(ema_p), copy_tree(ema_s),
        st2, lr, mom, upd)

    # fused result
    p1, _, ep1, es1, st1, total1, items1, _ = t._fused_step(
        copy_tree(t.params), copy_tree(t.opt_state), copy_tree(ema_p), copy_tree(ema_s),
        copy_tree(t.state), images, gl, gb, mg, lr, mom, upd)

    np.testing.assert_allclose(float(total1), float(total2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(items1), np.asarray(items2), rtol=1e-5)
    for a, b, name in ((p1, p2, "params"), (ep1, ep2, "ema_params"), (es1, es2, "ema_state"), (st1, st2, "state")):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=3e-5, atol=1e-6, err_msg=name)


def test_train_fused_path_end_to_end(tmp_path):
    """Full train through the fused accumulate==1 branch (batch == nbs)."""
    from yololite_tpu import YOLOLite

    m = YOLOLite("yolo11n.yaml")
    m.train(
        data=str(REFERENCE / "coco8" / "coco8.yaml"),
        epochs=2, imgsz=128, batch=4, nbs=4, workers=2,
        project=str(tmp_path / "runs"), name="fused_e2e", close_mosaic=0,
        warmup_epochs=0.5, val=False, plots=False, save=True, optimizer="SGD", lr0=0.01,
    )
    run_dir = tmp_path / "runs" / "fused_e2e"
    rows = (run_dir / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 3
    losses = np.array([[float(v) for v in r.split(",")[1:4]] for r in rows[1:]])
    assert np.isfinite(losses).all()


def test_train_multi_scale_fused(tmp_path):
    """multi_scale random resize through the fused accumulate==1 step: each
    snapped size compiles its own variant, tracked by _track_compiles."""
    from yololite_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides={
        "model": "yolo11n.yaml", "data": str(REFERENCE / "coco8" / "coco8.yaml"),
        "epochs": 2, "imgsz": 96, "batch": 4, "nbs": 4, "workers": 0, "mode": "train",
        "project": str(tmp_path / "runs"), "name": "ms", "val": False, "plots": False,
        "close_mosaic": 0, "optimizer": "SGD", "multi_scale": True, "seed": 3,
    })
    t.train()
    assert t._fused_step is not None
    assert len(t._step_shapes) >= 1  # compile-count hygiene tracked
    import jax

    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(t.params))


def test_save_metrics_schema_pinned(tmp_path):
    """results.csv columns are pinned at the first write: rows written before
    the first validation (val=False early epochs) match the header width, and
    later rows with metrics fill the same columns."""
    from yololite_tpu.engine.trainer import DetectionTrainer

    t = object.__new__(DetectionTrainer)
    t.csv = tmp_path / "results.csv"
    t.loss_names = ["box_loss", "cls_loss", "dfl_loss"]
    t.metrics = None
    t.lr = {"lr/pg0": 0.01, "lr/pg1": 0.01, "lr/pg2": 0.01}

    class _M:
        keys = ["metrics/precision(B)", "metrics/recall(B)", "metrics/mAP50(B)", "metrics/mAP50-95(B)"]

    class _V:
        metrics = _M()

    t.validator = _V()

    t.save_metrics(0, np.array([1.0, 2.0, 3.0]))  # no metrics yet
    t.metrics = {"metrics/precision(B)": 0.5, "metrics/recall(B)": 0.4,
                 "metrics/mAP50(B)": 0.3, "metrics/mAP50-95(B)": 0.2, "fitness": 0.21}
    t.save_metrics(1, np.array([0.9, 1.8, 2.7]))

    rows = t.csv.read_text().strip().splitlines()
    widths = [len(r.split(",")) for r in rows]
    assert len(set(widths)) == 1, widths  # header + every row same column count
    header = rows[0].split(",")
    assert "metrics/mAP50-95(B)" in header and "fitness" in header
    # epoch-0 row has zeros in the metric columns, epoch-1 row the real values
    r1 = dict(zip(header, rows[1].split(",")))
    r2 = dict(zip(header, rows[2].split(",")))
    assert float(r1["metrics/mAP50-95(B)"]) == 0.0
    assert float(r2["metrics/mAP50-95(B)"]) == 0.2


def test_save_metrics_resume_adopts_existing_header(tmp_path):
    """A resumed run re-adopts the schema already in results.csv instead of
    re-pinning a fresh (possibly different) one."""
    from yololite_tpu.engine.trainer import DetectionTrainer

    t = object.__new__(DetectionTrainer)
    t.csv = tmp_path / "results.csv"
    t.csv.write_text("epoch,box_loss,cls_loss,dfl_loss,lr/pg0,lr/pg1,lr/pg2\n1,1.0,2.0,3.0,0.01,0.01,0.01\n")
    t.loss_names = ["box_loss", "cls_loss", "dfl_loss"]
    t.metrics = {"metrics/mAP50(B)": 0.3}  # not in the existing schema -> ignored
    t.lr = {"lr/pg0": 0.02, "lr/pg1": 0.02, "lr/pg2": 0.02}
    t.validator = None

    t.save_metrics(1, np.array([0.5, 0.6, 0.7]))
    rows = t.csv.read_text().strip().splitlines()
    assert all(len(r.split(",")) == 7 for r in rows)
