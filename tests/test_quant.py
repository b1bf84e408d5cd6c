"""int8 serving path: quantization correctness + predictor integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE, reference_available


def test_quantized_forward_close_to_bf16():
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.models.quant import quantize_model

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    rng = np.random.default_rng(0)
    calib = [rng.random((2, 160, 160, 3), np.float32)]
    qp, qs, scales = quantize_model(model, params, state, calib)
    assert scales["s_act"] > 0

    x = jnp.asarray(rng.random((1, 160, 160, 3)), jnp.bfloat16)
    fp, fs = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    feats_bf = model.apply(cast(fp), cast(fs), x, train=False)
    feats_q = model.apply(qp, qs, x, train=False)
    for a, b in zip(feats_bf, feats_q):
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.99, cos


def test_quantized_weights_are_int8():
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.quant import quantize_model

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    qp, _, _ = quantize_model(model, params, state, [np.random.default_rng(0).random((1, 64, 64, 3), np.float32)])
    # backbone convs carry int8 weights; attention island stays bf16
    assert qp["0"]["q"]["w"].dtype == jnp.int8
    assert "q" not in qp["10"]["m"]["0"]["attn"]["qkv"], "attention must stay a bf16 island"
    # Detect logits layers keep float weights
    assert "q" not in qp["23"]["cv2"]["0"]["2"]


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
def test_predictor_int8_end_to_end(tmp_path):
    """predict(int8=True) quantizes on the first batch and produces detections
    close to the bf16 path on the same images."""
    from yololite_tpu.engine.predictor import DetectionPredictor
    from yololite_tpu.models.model import DetectionModel

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    imgs = [np.random.default_rng(i).integers(0, 255, (160, 160, 3), np.uint8) for i in range(2)]

    common = dict(imgsz=160, batch=2, conf=1e-5, save=False, verbose=False, project=str(tmp_path))
    ref_pred = DetectionPredictor(overrides=dict(common))
    ref_pred.setup_model(model, params, state, half=False)
    ref_results = ref_pred(imgs)

    q_pred = DetectionPredictor(overrides=dict(common, int8=True))
    q_pred.setup_model(model, params, state, half=False)
    q_results = q_pred(imgs)
    assert q_pred._quantized

    for r_ref, r_q in zip(ref_results, q_results):
        a, b = r_ref.boxes.data, r_q.boxes.data
        assert len(b) > 0
        # same top detection location within a few pixels at random weights
        if len(a) and len(b):
            np.testing.assert_allclose(a[0][:4], b[0][:4], atol=8.0)


def test_predictor_int8_tensor_source_calibrates(tmp_path):
    """int8=True with a pre-normalized NHWC tensor source: calibration runs on
    the tensor batch itself (not skipped -- ADVICE r2 #4) and the quantized
    graph produces detections."""
    from yololite_tpu.engine.predictor import DetectionPredictor
    from yololite_tpu.models.model import DetectionModel

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    batch = np.random.default_rng(7).random((2, 160, 160, 3)).astype(np.float32)

    pred = DetectionPredictor(overrides=dict(
        imgsz=160, batch=2, conf=1e-6, save=False, verbose=False,
        project=str(tmp_path), int8=True))
    pred.setup_model(model, params, state, half=False)
    results = pred(batch)
    assert pred._quantized  # tensor branch must calibrate, not silently skip
    assert len(results) == 2


def test_int8_export_roundtrip(tmp_path):
    """int8-quantized export artifact == in-process quantized graph, bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yololite_tpu import YOLOLite
    from yololite_tpu.models.quant import quantize_model
    from yololite_tpu.ops.nms import nms_from_feats
    from yololite_tpu.runtime import load_exported

    m = YOLOLite("yolo11n.yaml")
    calib = [np.random.default_rng(1).random((2, 160, 160, 3), np.float32)]
    p = m.export(tmp_path / "n_int8.shlo", imgsz=160, batch=2, platforms=("cpu",), int8_calib=calib)
    call, meta = load_exported(p)
    assert meta["int8"] is True

    imgs = np.random.default_rng(0).random((2, 160, 160, 3), np.float32)
    out = np.asarray(call(jnp.asarray(imgs)))

    qp, qs, _ = quantize_model(m.model, m.params, m.state, calib)

    def fn(images):
        feats = m.model.apply(qp, qs, images.astype(jnp.bfloat16), train=False)
        return nms_from_feats(feats, m.model.strides, m.model.nc, m.model.reg_max,
                              conf_thres=0.25, iou_thres=0.7, max_det=300, max_cand=300, half=True)

    ref = np.asarray(jax.jit(fn)(imgs))
    np.testing.assert_array_equal(out, ref)
