"""End-to-end predict pipeline tests using a fabricated reference-format .pt.

The pretrained blob is absent from the mount, so we torch-save a reference model
(random weights) in the reference checkpoint layout and exercise: stub-unpickle
import -> pytree mapping -> letterbox -> jitted forward+decode+NMS -> Results,
plus numeric decode parity vs the torch inference output.
"""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax.numpy as jnp

BOATS = REFERENCE / "boats.jpg"


@pytest.fixture(scope="module")
def fake_pt(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference mount not present")
    sys.path.insert(0, str(REFERENCE))
    import torch
    from tests.test_model_parity import _build_reference_model

    tm = _build_reference_model("n")
    tm.args = {"imgsz": 640, "conf": None}
    tm.names = {i: f"c{i}" for i in range(80)}
    pt = tmp_path_factory.mktemp("ckpt") / "yolo11n.pt"
    torch.save({"model": tm, "train_args": {"imgsz": 640, "batch": 16}, "epoch": -1}, str(pt))
    return str(pt), tm


def test_load_pt_roundtrip(fake_pt):
    pt, tm = fake_pt
    from yololite_tpu.models.checkpoint import load_pt

    model, params, state, meta = load_pt(pt)
    assert model.nc == 80
    assert meta["args"]["imgsz"] == 640
    w_torch = tm.state_dict()["model.0.conv.weight"].numpy()
    w_jax = np.asarray(params["0"]["conv"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w_jax, w_torch, atol=1e-6)


def test_decode_parity_vs_torch_inference(fake_pt):
    """Our decode path == torch Detect._inference (dbox + sigmoid cls)."""
    import torch

    pt, tm = fake_pt
    from yololite_tpu.models.checkpoint import load_pt
    from yololite_tpu.ops.decode import decode_detections

    model, params, state, meta = load_pt(pt)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 160, 160), dtype=np.float32)
    with torch.no_grad():
        y = tm(torch.from_numpy(x))
    t_pred = y[0].numpy()  # (1, 84, A): xywh pixels + sigmoid scores

    feats = model.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))
    boxes, scores = decode_detections(feats, model.strides, model.nc, xywh=True)
    j_pred = np.concatenate([np.asarray(boxes), np.asarray(scores)], axis=-1).transpose(0, 2, 1)
    np.testing.assert_allclose(j_pred, t_pred, rtol=1e-3, atol=2e-4)


def test_predict_end_to_end(fake_pt, tmp_path):
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    results = m.predict([str(BOATS)], conf=1e-7, verbose=False, save=False, imgsz=320)
    assert len(results) == 1
    r = results[0]
    assert r.orig_shape[0] > 0
    # random weights: boxes exist at tiny conf and lie inside the original image
    assert len(r.boxes) > 0
    xyxy = r.boxes.xyxy
    assert (xyxy[:, 0] >= 0).all() and (xyxy[:, 2] <= r.orig_shape[1]).all()
    assert (xyxy[:, 1] >= 0).all() and (xyxy[:, 3] <= r.orig_shape[0]).all()
    # Results API surface
    assert isinstance(r.summary(), list)
    assert r.to_csv() is not None
    txt = tmp_path / "out.txt"
    r.save_txt(txt)
    assert txt.exists()


def test_predict_numpy_source(fake_pt):
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    img = np.full((240, 320, 3), 128, np.uint8)
    results = m.predict([img, img], conf=0.5, verbose=False, save=False, imgsz=320, batch=2)
    assert len(results) == 2


def test_ensemble_two_models(fake_pt, tmp_path):
    """Ensemble of two checkpoints doubles the candidate pool pre-NMS."""
    pt, _ = fake_pt
    import jax.numpy as jnp

    from yololite_tpu.models.ensemble import attempt_load_weights

    ens = attempt_load_weights([pt, pt])
    assert len(ens.members) == 2
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    boxes, scores = ens.decode(x)
    single = ens.members[0]
    feats = single[0].apply(single[1], single[2], x)
    a_single = sum(f.shape[1] * f.shape[2] for f in feats)
    assert boxes.shape[1] == 2 * a_single
    dets = ens(x, conf_thres=1e-6, max_det=10)
    assert dets.shape == (1, 10, 6)


def test_predict_conf_change_rebuilds_graph(fake_pt):
    """Changing conf between predict calls must take effect (graph is rebuilt)."""
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    r_low = m.predict([img], conf=1e-7, verbose=False, save=False, imgsz=160)[0]
    r_high = m.predict([img], conf=0.9999, verbose=False, save=False, imgsz=160)[0]
    assert len(r_low.boxes) > 0
    assert len(r_high.boxes) == 0


def test_embed_returns_pooled_features(fake_pt):
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    embs = m.embed([img], layers=[4, 6], imgsz=160)
    assert len(embs) == 1
    assert embs[0].ndim == 2 and embs[0].shape[0] == 1 and embs[0].shape[1] > 0


def test_inference_pipeline_sustained(fake_pt):
    """Double-buffered serving pipeline: all tickets complete, latency tracked."""
    import time

    pt, _ = fake_pt
    from yololite_tpu import YOLOLite
    from yololite_tpu.runtime import InferencePipeline
    from yololite_tpu.engine.predictor import DetectionPredictor

    m = YOLOLite(pt)
    pred = DetectionPredictor(overrides={"conf": 0.25, "batch": 2, "imgsz": 160, "mode": "predict",
                                         "verbose": False, "save": False})
    pred.setup_model(m.model, m.params, m.state)
    pipe = InferencePipeline(pred, imgsz=160).start()

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (120, 160, 3), np.uint8) for _ in range(2)]
    t0 = time.perf_counter()
    for _ in range(5):
        pipe.submit(frames)
    pipe.close()
    got = list(pipe.results())
    wall = time.perf_counter() - t0
    assert len(got) == 5
    for ticket, dets in got:
        assert dets.shape == (2, 300, 6)
    s = pipe.summary(wall)
    assert s["completed"] == 10
    assert s["p50_ms"] > 0


def test_pytree_to_state_dict_roundtrip(fake_pt):
    """Inverse weight export: our pytrees -> torch state_dict, bit-exact reload."""
    import torch

    pt, tm = fake_pt
    from yololite_tpu.models.checkpoint import load_pt, pytree_to_state_dict

    model, params, state, meta = load_pt(pt)
    sd = pytree_to_state_dict(params, state)
    ref_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    for k, v in sd.items():
        np.testing.assert_allclose(np.asarray(v), ref_sd[k], atol=1e-6, err_msg=k)
    skipped = {k for k in ref_sd if k not in sd}
    assert all("num_batches" in k or "dfl" in k for k in skipped)


def test_load_pt_pickled_ensemble(fake_pt, tmp_path):
    """A torch-saved reference `Ensemble` object (tasks.py:448) unwraps to its model."""
    import torch

    pt, tm = fake_pt
    sys.path.insert(0, str(REFERENCE))
    from yololite.nn.tasks import Ensemble

    ens = Ensemble()
    ens.append(tm)
    ept = tmp_path / "ensemble.pt"
    torch.save({"model": ens, "train_args": {"imgsz": 640}}, str(ept))

    from yololite_tpu.models.checkpoint import load_pt

    model, params, state, meta = load_pt(str(ept))
    w_torch = tm.state_dict()["model.0.conv.weight"].numpy()
    w_jax = np.asarray(params["0"]["conv"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w_jax, w_torch, atol=1e-6)


def test_load_pt_fused_conv_checkpoint(fake_pt, tmp_path):
    """A fused checkpoint (BN folded into conv, ultralytics fuse() layout) loads and
    produces the same forward as the unfused one."""
    import copy

    import torch

    pt, tm = fake_pt
    sys.path.insert(0, str(REFERENCE))
    from yololite.utils.torch_utils import fuse_conv_and_bn

    fused = copy.deepcopy(tm)
    for m in fused.modules():
        if type(m).__name__ in ("Conv", "DWConv") and hasattr(m, "bn"):
            m.conv = fuse_conv_and_bn(m.conv, m.bn)
            delattr(m, "bn")
    fpt = tmp_path / "fused.pt"
    torch.save({"model": fused, "train_args": {"imgsz": 640}}, str(fpt))

    from yololite_tpu.models.checkpoint import load_pt

    model_u, params_u, state_u, _ = load_pt(pt)
    model_f, params_f, state_f, _ = load_pt(str(fpt))
    assert "bn" not in params_f["0"], "fused checkpoint should map onto a fused pytree"

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3), dtype=np.float32))
    feats_u = model_u.apply(params_u, state_u, x)
    feats_f = model_f.apply(params_f, state_f, x)
    for a, b in zip(feats_u, feats_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4)


def test_load_pt_nc_mismatch_intersect(fake_pt):
    """Fine-tune flow: loading an 80-class .pt at nc=2 transfers every
    shape-matching leaf (incl. the nc-independent cv2 box branch) and keeps the
    fresh class head (reference intersect_dicts, tasks.py:197-210)."""
    pt, _ = fake_pt
    from yololite_tpu.models.checkpoint import load_pt

    m80, p80, s80, _ = load_pt(pt)
    m2, p2, s2, _ = load_pt(pt, nc=2)
    assert m2.nc == 2
    np.testing.assert_allclose(
        np.asarray(p2["0"]["conv"]["w"]), np.asarray(p80["0"]["conv"]["w"]), atol=0
    )
    k = str(m2.rows[-1].i)
    np.testing.assert_allclose(  # box branch is nc-independent -> transferred
        np.asarray(p2[k]["cv2"]["0"]["2"]["w"]), np.asarray(p80[k]["cv2"]["0"]["2"]["w"]), atol=0
    )
    # class head output conv has nc=2 channels (fresh init)
    assert np.asarray(p2[k]["cv3"]["0"]["2"]["w"]).shape[-1] == 2


def test_predict_tensor_source(fake_pt):
    """NHWC float tensor sources bypass letterboxing (our LoadTensor analogue)."""
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    rng = np.random.default_rng(11)
    batch = rng.random((2, 160, 160, 3)).astype(np.float32)  # RGB 0-1, stride-divisible
    results = m.predict(batch, conf=1e-7, verbose=False, save=False, batch=2)
    assert len(results) == 2
    r = results[0]
    assert r.orig_shape == (160, 160)
    assert len(r.boxes) > 0  # random weights at tiny conf produce boxes
    xyxy = r.boxes.xyxy
    assert (xyxy >= 0).all() and (xyxy[:, 2] <= 160).all() and (xyxy[:, 3] <= 160).all()
    # jax device arrays are accepted too
    import jax.numpy as _jnp

    results2 = m.predict(_jnp.asarray(batch), conf=1e-7, verbose=False, save=False, batch=2)
    assert len(results2) == 2


def test_predict_classes_filter_and_agnostic(fake_pt):
    """classes= restricts detections to the given ids; agnostic_nms runs class-blind."""
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    img = np.random.default_rng(3).integers(0, 255, (320, 320, 3), np.uint8)
    r = m.predict([img], conf=1e-7, classes=[0, 5], verbose=False, save=False, imgsz=320)[0]
    assert len(r.boxes) > 0
    assert set(np.unique(r.boxes.cls.astype(int))) <= {0, 5}

    m2 = YOLOLite(pt)
    r2 = m2.predict([img], conf=1e-7, agnostic_nms=True, verbose=False, save=False, imgsz=320)[0]
    assert r2.boxes is not None  # class-blind suppression path compiles + runs


def test_predict_tta_augment(fake_pt):
    """augment=True merges multi-scale + flip candidates pre-NMS (reference tasks.py:278)."""
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    img = np.random.default_rng(5).integers(0, 255, (320, 320, 3), np.uint8)
    r = m.predict([img], conf=1e-7, augment=True, verbose=False, save=False, imgsz=320)[0]
    assert len(r.boxes) > 0
    xyxy = r.boxes.xyxy
    assert (xyxy[:, 0] >= 0).all() and (xyxy[:, 2] <= 320).all()


def test_predict_visualize_feature_maps(fake_pt, tmp_path):
    """visualize=True saves backbone feature-map grids (reference plotting.py:1060)."""
    pt, _ = fake_pt
    from yololite_tpu import YOLOLite

    m = YOLOLite(pt)
    img = np.random.default_rng(6).integers(0, 255, (320, 320, 3), np.uint8)
    m.predict([img], conf=0.5, visualize=True, verbose=False, save=False, imgsz=320,
              project=str(tmp_path), name="vis")
    pngs = list(tmp_path.rglob("*.png"))
    assert pngs, "feature visualization should write stage PNGs"


def test_predict_rect_imgsz(fake_pt):
    """Non-square imgsz [h, w] flows through letterbox, forward and NMS with
    correct per-level (h, w) grids and boxes inside the original image."""
    from yololite_tpu import YOLOLite

    pt, _ = fake_pt
    img = np.asarray(np.random.default_rng(3).integers(0, 255, (300, 400, 3)), np.uint8)
    m = YOLOLite(pt)
    r = m.predict([img], conf=1e-6, verbose=False, save=False, imgsz=[192, 256])[0]
    assert len(r.boxes) > 0
    xyxy = np.asarray(r.boxes.xyxy)
    assert (xyxy[:, 0] >= 0).all() and (xyxy[:, 2] <= 400).all()
    assert (xyxy[:, 1] >= 0).all() and (xyxy[:, 3] <= 300).all()


def test_export_predict_roundtrip(tmp_path):
    """jax.export artifact == in-process predict graph, bit-for-bit.

    Exports the fused forward+decode+NMS graph (weights baked in), reloads it
    from disk, and compares against the same graph run in-process. Serving
    contract: normalized float32 NHWC in, (B, max_det, 6) padded rows out.
    """
    import jax

    from yololite_tpu import YOLOLite
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.nms import nms_from_feats
    from yololite_tpu.runtime import load_exported

    m = YOLOLite("yolo11n.yaml")
    path = m.export(tmp_path / "yolo11n.shlo", imgsz=160, batch=2, half=True, platforms=("cpu",))
    assert path.exists() and (tmp_path / "yolo11n.shlo.json").exists()
    call, meta = load_exported(path)
    assert meta["nc"] == 80 and meta["max_det"] == 300

    imgs = np.random.default_rng(0).random((2, 160, 160, 3), np.float32)
    out = np.asarray(call(jnp.asarray(imgs)))
    assert out.shape == (2, 300, 6)

    params, state = fuse_tree(m.params, m.state)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if np.issubdtype(np.asarray(x).dtype, np.floating) else x, t)
    params, state = cast(params), cast(state)

    def fn(images):
        feats = m.model.apply(params, state, images.astype(jnp.bfloat16), train=False)
        return nms_from_feats(feats, m.model.strides, m.model.nc, m.model.reg_max,
                              conf_thres=0.25, iou_thres=0.7, max_det=300, max_cand=300, half=True)

    ref = np.asarray(jax.jit(fn)(imgs))
    np.testing.assert_array_equal(out, ref)


def test_single_pt_multi_member_ensemble(fake_pt, tmp_path):
    """A single .pt holding a pickled multi-member reference Ensemble loads every
    member and predicts via pre-NMS concat (reference tasks.py:448-459)."""
    pt, tm = fake_pt
    import torch

    from tests.test_model_parity import _build_reference_model
    from yololite.nn.tasks import Ensemble as TorchEnsemble

    m2 = _build_reference_model("n")
    with torch.no_grad():  # decorrelate from tm (builder seeds both identically)
        for p in m2.parameters():
            p.add_(0.01 * torch.randn_like(p))
    m2.args = {"imgsz": 640}
    m2.names = {i: f"c{i}" for i in range(80)}
    ens_t = TorchEnsemble()
    ens_t.append(tm)
    ens_t.append(m2)
    pt2 = tmp_path / "pair.pt"
    torch.save({"model": ens_t, "train_args": {"imgsz": 640}}, str(pt2))

    from yololite_tpu.models.checkpoint import load_pt
    from yololite_tpu.models.model import EnsembleModel

    model, params, state, meta = load_pt(str(pt2))
    assert isinstance(model, EnsembleModel) and len(model.members) == 2
    # member order and weights preserved
    w0 = np.asarray(params["m0"]["0"]["conv"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w0, tm.state_dict()["model.0.conv.weight"].numpy(), atol=1e-6)
    w1 = np.asarray(params["m1"]["0"]["conv"]["w"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w1, m2.state_dict()["model.0.conv.weight"].numpy(), atol=1e-6)

    # decode_concat = per-member decode concatenated along anchors
    from yololite_tpu.ops.decode import decode_detections

    x = jnp.asarray(np.random.default_rng(0).random((1, 160, 160, 3), np.float32))
    boxes, scores = model.decode_concat(params, state, x)
    b0, s0 = decode_detections(
        model.members[0].apply(params["m0"], state["m0"], x), model.strides, model.nc)
    assert boxes.shape[1] == 2 * b0.shape[1]
    np.testing.assert_allclose(np.asarray(boxes[:, : b0.shape[1]]), np.asarray(b0), rtol=1e-5, atol=1e-5)

    # end-to-end through the public API (predictor builds the ensemble graph)
    from yololite_tpu import YOLOLite

    y = YOLOLite(str(pt2))
    img = np.random.default_rng(1).integers(0, 255, (200, 320, 3), np.uint8)
    results = y.predict([img], conf=1e-7, verbose=False, save=False, imgsz=160)
    assert len(results) == 1 and len(results[0].boxes) > 0
