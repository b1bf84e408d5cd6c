"""Validator pipeline + metrics parity tests.

ap_per_class / compute_ap are compared numerically against the reference's numpy
implementations on synthetic detections (importing the reference's metrics module
only inside the test, as a golden oracle).
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available


def _synthetic_stats(seed=0, n_det=200, n_gt=120, nc=6):
    rng = np.random.default_rng(seed)
    tp = rng.random((n_det, 10)) > 0.6
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone: tp at higher iou implies tp at lower
    conf = rng.random(n_det)
    pred_cls = rng.integers(0, nc, n_det)
    target_cls = rng.integers(0, nc, n_gt)
    return tp, conf, pred_cls, target_cls


def test_ap_per_class_matches_reference():
    if not reference_available():
        pytest.skip("reference mount not present")
    import sys

    sys.path.insert(0, str(REFERENCE))
    from yololite.utils.metrics import ap_per_class as ref_ap_per_class

    from yololite_tpu.utils.metrics import ap_per_class

    tp, conf, pred_cls, target_cls = _synthetic_stats()
    ours = ap_per_class(tp, conf, pred_cls, target_cls)
    theirs = ref_ap_per_class(tp, conf, pred_cls, target_cls)
    # tp, fp, p, r, f1, ap, unique_classes
    for i, name in enumerate(["tp", "fp", "p", "r", "f1", "ap", "classes"]):
        np.testing.assert_allclose(np.asarray(ours[i], float), np.asarray(theirs[i], float),
                                   rtol=1e-7, atol=1e-9, err_msg=name)


def test_fitness_formula():
    from yololite_tpu.utils.metrics import DetMetrics

    m = DetMetrics(names={0: "a", 1: "b"})
    tp, conf, pred_cls, target_cls = _synthetic_stats(seed=1, nc=2)
    m.process(tp, conf, pred_cls, target_cls)
    mp, mr, map50, map5095 = m.mean_results()
    assert abs(m.fitness - (0.1 * map50 + 0.9 * map5095)) < 1e-9


def test_match_predictions_greedy_unique():
    from yololite_tpu.engine.validator import DetectionValidator

    v = DetectionValidator(args={"data": None, "mode": "val"})
    # 2 gt, 3 predictions; pred0 and pred1 both overlap gt0; higher-iou pred wins
    iou = np.array(
        [
            [0.9, 0.85, 0.0],
            [0.0, 0.0, 0.6],
        ]
    )
    pred_cls = np.array([0.0, 0.0, 1.0])
    true_cls = np.array([0.0, 1.0])
    correct = v.match_predictions(pred_cls, true_cls, iou)
    assert correct.shape == (3, 10)
    assert correct[0, 0] and not correct[1, 0]  # pred0 matched at 0.5, pred1 not (gt taken)
    assert correct[2, 0] and not correct[2, 5]  # pred2 iou 0.6 < 0.75


def test_validator_end_to_end_coco8(tmp_path):
    """Full val pipeline on coco8 with the fabricated random-weight checkpoint."""
    if not reference_available():
        pytest.skip("reference mount not present")
    from tests.test_predict import fake_pt  # reuse fixture machinery manually
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from tests.test_model_parity import _build_reference_model

    tm = _build_reference_model("n")
    tm.args = {"imgsz": 640}
    pt = tmp_path / "yolo11n.pt"
    torch.save({"model": tm, "train_args": {"imgsz": 640}}, str(pt))

    from yololite_tpu import YOLOLite

    m = YOLOLite(str(pt))
    metrics = m.val(data=str(REFERENCE / "coco8" / "coco8.yaml"), imgsz=320, batch=4,
                    plots=False, verbose=False, save_json=False,
                    project=str(tmp_path / "runs"))
    rd = metrics.results_dict
    assert "metrics/mAP50-95(B)" in rd
    assert 0.0 <= rd["metrics/mAP50-95(B)"] <= 1.0
    assert "fitness" in rd


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
def test_validator_rect_batching(tmp_path):
    """rect=True val: aspect-grouped batch shapes, one compile per bucket."""
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from tests.test_model_parity import _build_reference_model

    tm = _build_reference_model("n")
    tm.args = {"imgsz": 640}
    pt = tmp_path / "yolo11n.pt"
    torch.save({"model": tm, "train_args": {"imgsz": 640}}, str(pt))

    from yololite_tpu import YOLOLite

    m = YOLOLite(str(pt))
    metrics = m.val(data=str(REFERENCE / "coco8" / "coco8.yaml"), imgsz=320, batch=2, rect=True,
                    plots=False, verbose=False, project=str(tmp_path / "runs"))
    rd = metrics.results_dict
    assert 0.0 <= rd["metrics/mAP50-95(B)"] <= 1.0


def test_val_save_json_scores_with_vendored_cocoeval(tmp_path):
    """save_json=True writes predictions.json AND re-scores via the vendored COCOeval
    (GT synthesized from coco8's own labels since no instances json ships)."""
    if not reference_available():
        pytest.skip("reference mount not present")
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from tests.test_model_parity import _build_reference_model

    tm = _build_reference_model("n")
    tm.args = {"imgsz": 640}
    pt = tmp_path / "yolo11n.pt"
    torch.save({"model": tm, "train_args": {"imgsz": 640}}, str(pt))

    from yololite_tpu import YOLOLite

    m = YOLOLite(str(pt))
    # random weights + bias_init leave all scores below the 0.001 default conf;
    # drop the gate so detections exist and the json path is exercised
    metrics = m.val(data=str(REFERENCE / "coco8" / "coco8.yaml"), imgsz=320, batch=4,
                    plots=False, verbose=False, save_json=True, conf=1e-6,
                    project=str(tmp_path / "runs"))
    rd = metrics.results_dict
    assert 0.0 <= rd["metrics/mAP50-95(B)"] <= 1.0
    import glob

    preds = glob.glob(str(tmp_path / "runs" / "**" / "predictions.json"), recursive=True)
    assert preds, "predictions.json not written"
