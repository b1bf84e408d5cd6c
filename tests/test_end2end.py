"""End2end (NMS-free) head: one2one branch pair, E2EDetectLoss, top-k postprocess.

Covers the reference's Detect.end2end path (head.py:55-57,71-93,145-167) and
E2EDetectLoss (loss.py:162-177): structure, gradient detachment of the one2one
branch, loss composition, exact top-k-select parity against the reference's
torch Detect.postprocess, and an end-to-end train step + predict.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax
import jax.numpy as jnp


E2E_SPEC = {
    "nc": 7,
    "scale": "n",
    "scales": {"n": [0.50, 0.25, 1024]},
    "backbone": [
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3k2", [128, False, 0.25]],
        [-1, 1, "Conv", [256, 3, 2]],
    ],
    "head": [
        [-1, 1, "Conv", [256, 3, 2]],
        [[3, 4], 1, "Detect", ["nc", True]],  # second arg flips end2end
    ],
}


def _tiny_e2e():
    from yololite_tpu.models.model import DetectionModel

    model = DetectionModel(dict(E2E_SPEC))
    params, state = model.init(0)
    return model, params, state


def test_detect_end2end_structure_and_forward():
    model, params, state = _tiny_e2e()
    det = model.detect
    assert det.end2end
    dkey = str(model.rows[-1].i)
    assert set(params[dkey]) == {"cv2", "cv3", "one2one_cv2", "one2one_cv3"}
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    out = model.apply(params, state, x, train=False)
    assert set(out) == {"one2many", "one2one"}
    for branch in out.values():
        assert len(branch) == det.nl
        for f in branch:
            assert f.shape[0] == 2 and f.shape[-1] == det.no


def test_one2one_branch_is_gradient_detached():
    """stop_gradient isolation (reference head.py:85 x.detach()): the one2one
    branch loss must produce ZERO gradient on backbone/neck parameters."""
    model, params, state = _tiny_e2e()
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3), np.float32))

    def one2one_sum(p):
        out = model.apply(p, state, x, train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out["one2one"])

    g = jax.grad(one2one_sum)(params)
    dkey = str(model.rows[-1].i)
    backbone_norm = sum(
        float(jnp.sum(jnp.abs(v)))
        for k in g if k != dkey
        for v in jax.tree.leaves(g[k])
    )
    o2o_norm = sum(
        float(jnp.sum(jnp.abs(v)))
        for v in jax.tree.leaves(g[dkey]["one2one_cv2"]) + jax.tree.leaves(g[dkey]["one2one_cv3"])
    )
    assert backbone_norm == 0.0, "one2one loss leaked gradient into the backbone"
    assert o2o_norm > 0.0, "one2one branch got no gradient at all"


def test_e2e_loss_is_sum_of_branch_losses():
    from yololite_tpu.utils.loss import E2EDetectLoss, v8DetectionLoss

    model, params, state = _tiny_e2e()
    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3), np.float32))
    preds = model.apply(params, state, x, train=True)
    B, mb = 2, 4
    rng = np.random.default_rng(3)
    cxy = rng.random((B, mb, 2)) * 40 + 10
    wh = rng.random((B, mb, 2)) * 8 + 2
    gt = {
        "gt_labels": jnp.asarray(rng.integers(0, 7, (B, mb, 1)), jnp.float32),
        "gt_bboxes": jnp.asarray(np.concatenate([cxy - wh, cxy + wh], -1), jnp.float32),
        "mask_gt": jnp.ones((B, mb, 1), jnp.float32),
    }
    e2e = E2EDetectLoss(model.nc, model.strides, model.reg_max)
    total, items = e2e(preds, gt)
    lm = v8DetectionLoss(model.nc, model.strides, model.reg_max, tal_topk=10)
    lo = v8DetectionLoss(model.nc, model.strides, model.reg_max, tal_topk=1)
    tm, im = lm(preds["one2many"], gt)
    to, io_ = lo(preds["one2one"], gt)
    np.testing.assert_allclose(float(total), float(tm + to), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(items), np.asarray(im + io_), rtol=1e-6)
    assert np.isfinite(float(total))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_postprocess_topk_matches_reference_exactly():
    """Our two-stage top-k select == the reference's torch Detect.postprocess
    (head.py:145-167) on the same decoded predictions, row for row."""
    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.nn.modules.head import Detect as TorchDetect

    from yololite_tpu.ops.decode import decode_detections, postprocess_end2end

    rng = np.random.default_rng(4)
    nc, max_det = 7, 20
    feats = [jnp.asarray(rng.standard_normal((2, s, s, 64 + nc), np.float32))
             for s in (8, 4, 2)]
    strides = [8, 16, 32]
    out = np.asarray(postprocess_end2end(feats, strides, nc, 16, max_det=max_det))

    boxes, scores = decode_detections(feats, strides, nc, 16, xywh=False)
    preds_t = torch.from_numpy(
        np.concatenate([np.asarray(boxes), np.asarray(scores)], -1))  # (B, A, 4+nc)
    ref = TorchDetect.postprocess(preds_t, max_det, nc).numpy()
    np.testing.assert_allclose(out[..., :4], ref[..., :4], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out[..., 4], ref[..., 4], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out[..., 5], ref[..., 5])


def test_postprocess_conf_gate_zeroes_rows():
    from yololite_tpu.ops.decode import postprocess_end2end

    rng = np.random.default_rng(5)
    nc = 3
    feats = [jnp.asarray(rng.standard_normal((1, s, s, 64 + nc), np.float32) - 2.0)
             for s in (4, 2, 1)]
    out = np.asarray(postprocess_end2end(feats, [8, 16, 32], nc, 16, max_det=10,
                                         conf_thres=0.9))
    dead = out[0][out[0][:, 4] <= 0.9]
    assert (dead == 0).all()


def test_end2end_train_step_and_predict(tmp_path):
    """Full trainer step with E2EDetectLoss + predictor top-k path, via the
    public API on coco8 (the reference ships no end2end yaml; this is the
    capability test)."""
    import yaml

    from yololite_tpu import YOLOLite

    spec = dict(E2E_SPEC)
    ypath = tmp_path / "tiny_e2e.yaml"
    with open(ypath, "w") as f:
        yaml.safe_dump(spec, f)

    m = YOLOLite(str(ypath))
    assert m.model.detect.end2end
    if reference_available():
        res = m.train(data=str(REFERENCE / "coco8" / "coco8.yaml"), epochs=1,
                      imgsz=64, batch=2, project=str(tmp_path / "runs"),
                      plots=False, workers=0, close_mosaic=0, val=True)
        assert res is not None
    img = np.asarray(np.random.default_rng(6).integers(0, 255, (96, 128, 3)), np.uint8)
    r = m.predict([img], conf=1e-6, verbose=False, save=False, imgsz=64)[0]
    assert r.boxes.data.shape[1] == 6
