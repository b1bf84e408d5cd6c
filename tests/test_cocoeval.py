"""Vendored numpy COCOeval: hand-computed fixtures + consistency with ap_per_class."""

import numpy as np
import pytest

from yololite_tpu.utils.cocoeval import COCOEval, gt_from_yolo_labels, iou_ltwh


def _gt(images, anns):
    cats = sorted({a["category_id"] for a in anns})
    return {
        "images": [{"id": i, "width": 640, "height": 640} for i in images],
        "annotations": [
            {"id": j + 1, "iscrowd": 0, "area": a["bbox"][2] * a["bbox"][3], **a} for j, a in enumerate(anns)
        ],
        "categories": [{"id": c} for c in cats],
    }


def test_iou_ltwh_crowd_semantics():
    dt = np.array([[0.0, 0, 10, 10]])
    gt = np.array([[0.0, 0, 20, 20]])
    plain = iou_ltwh(dt, gt, np.array([0]))
    crowd = iou_ltwh(dt, gt, np.array([1]))
    np.testing.assert_allclose(plain, [[100 / 400]])
    np.testing.assert_allclose(crowd, [[1.0]])  # crowd union = det area


def test_perfect_predictions_ap_one():
    anns = [
        {"image_id": 1, "category_id": 0, "bbox": [10, 10, 50, 50]},
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 80, 40]},
    ]
    dets = [
        {"image_id": 1, "category_id": 0, "bbox": [10, 10, 50, 50], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 80, 40], "score": 0.8},
    ]
    s = COCOEval(_gt([1], anns), dets).summarize()
    assert s[0] == pytest.approx(1.0)  # mAP50-95
    assert s[1] == pytest.approx(1.0)  # mAP50


def test_hand_computed_ap():
    """2 GT, 3 dets (TP, FP, TP by score): AP = (51*1 + 50*(2/3)) / 101 at every IoU."""
    anns = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10]},
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 10, 10]},
    ]
    dets = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 1, "category_id": 0, "bbox": [300, 300, 10, 10], "score": 0.8},
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 10, 10], "score": 0.7},
    ]
    s = COCOEval(_gt([1], anns), dets).summarize()
    expect = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert s[0] == pytest.approx(expect, abs=1e-9)
    assert s[1] == pytest.approx(expect, abs=1e-9)


def test_crowd_match_is_ignored_not_tp():
    """A det matching only a crowd GT is ignored: no TP, no FP."""
    gt = {
        "images": [{"id": 1, "width": 640, "height": 640}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 0, "bbox": [0, 0, 100, 100], "area": 10000, "iscrowd": 1},
            {"id": 2, "image_id": 1, "category_id": 0, "bbox": [300, 300, 50, 50], "area": 2500, "iscrowd": 0},
        ],
        "categories": [{"id": 0}],
    }
    dets = [
        {"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9},  # inside crowd
        {"image_id": 1, "category_id": 0, "bbox": [300, 300, 50, 50], "score": 0.8},  # real TP
    ]
    s = COCOEval(gt, dets).summarize()
    # only the non-crowd GT counts; its det is a clean TP after an ignored det
    assert s[0] == pytest.approx(1.0)


def test_area_range_breakdown():
    """One small (16x16) and one large (200x200) object, both detected perfectly."""
    anns = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 16, 16]},
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 200, 200]},
    ]
    dets = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 16, 16], "score": 0.9},
        {"image_id": 1, "category_id": 0, "bbox": [100, 100, 200, 200], "score": 0.8},
    ]
    ev = COCOEval(_gt([1], anns), dets)
    s = ev.summarize()
    assert s[3] == pytest.approx(1.0)  # AP small
    assert s[5] == pytest.approx(1.0)  # AP large
    assert s[4] == -1.0  # no medium objects -> -1 sentinel
    # AR maxDets=1 sees only the higher-scoring det -> recall 0.5
    assert s[6] == pytest.approx(0.5)
    assert s[8] == pytest.approx(1.0)


def test_iou_threshold_sweep():
    """Det at IoU 0.6 vs GT: TP for thresholds .5/.55/.6, FP above -> mAP50-95 = 3/10."""
    anns = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10]}]
    # shift: overlap 10x6/ (100+100-60)=60/140... pick boxes with exact IoU 0.6: inter/union=0.6
    # use w=10,h=10 gt; det [0,0,10,7.5]: inter=75, union=100+75-75=100 -> 0.75. Use det y-shift:
    # det [0,2.5,10,10]: inter=75, union=125 -> 0.6
    dets = [{"image_id": 1, "category_id": 0, "bbox": [0, 2.5, 10, 10], "score": 0.9}]
    s = COCOEval(_gt([1], anns), dets).summarize()
    assert s[1] == pytest.approx(1.0)  # AP50
    assert s[0] == pytest.approx(3 / 10)  # thresholds 0.5, 0.55, 0.6 pass (>= thr)


def test_matches_ap_per_class_on_synthetic_scene():
    """COCOEval and our 101-pt ap_per_class agree closely on a crowd-free scene."""
    from yololite_tpu.utils.metrics import ap_per_class

    rng = np.random.default_rng(0)
    n_img, n_cls = 8, 3
    anns, dets, imgs = [], [], list(range(n_img))
    tp_list, conf_list, pred_cls_list, target_cls_list = [], [], [], []
    iouv = np.linspace(0.5, 0.95, 10)

    from yololite_tpu.engine.validator import DetectionValidator

    matcher = DetectionValidator.__new__(DetectionValidator)
    matcher.iouv = iouv
    matcher.niou = 10

    for im in imgs:
        n_gt = rng.integers(1, 5)
        gt_boxes = np.stack(
            [
                rng.uniform(0, 500, n_gt),
                rng.uniform(0, 500, n_gt),
                rng.uniform(40, 120, n_gt),
                rng.uniform(40, 120, n_gt),
            ],
            1,
        )
        gt_cls = rng.integers(0, n_cls, n_gt)
        for b, c in zip(gt_boxes, gt_cls):
            anns.append({"image_id": im, "category_id": int(c), "bbox": [float(x) for x in b]})
        # detections: jittered copies of GT + random false positives
        det_boxes, det_cls, det_scores = [], [], []
        for b, c in zip(gt_boxes, gt_cls):
            if rng.random() < 0.8:
                jit = b + rng.normal(0, 4, 4)
                jit[2:] = np.clip(jit[2:], 8, None)
                det_boxes.append(jit)
                det_cls.append(c)
                det_scores.append(rng.uniform(0.5, 1.0))
        for _ in range(rng.integers(0, 3)):
            det_boxes.append(np.array([rng.uniform(0, 500), rng.uniform(0, 500), 50, 50]))
            det_cls.append(rng.integers(0, n_cls))
            det_scores.append(rng.uniform(0.05, 0.5))
        if not det_boxes:
            continue
        det_boxes = np.stack(det_boxes)
        det_cls = np.array(det_cls)
        det_scores = np.array(det_scores)
        for b, c, s in zip(det_boxes, det_cls, det_scores):
            dets.append(
                {"image_id": im, "category_id": int(c), "bbox": [float(x) for x in b], "score": float(s)}
            )
        # our pipeline ingredients (xyxy)
        def ltwh2xyxy(a):
            a = a.copy()
            a[:, 2:] += a[:, :2]
            return a

        from yololite_tpu.ops.boxes import box_iou

        order = np.argsort(-det_scores)
        iou = np.asarray(box_iou(ltwh2xyxy(gt_boxes), ltwh2xyxy(det_boxes[order])))
        tp = matcher.match_predictions(det_cls[order], gt_cls, iou)
        tp_list.append(tp)
        conf_list.append(det_scores[order])
        pred_cls_list.append(det_cls[order])
        target_cls_list.append(gt_cls)

    coco_stats = COCOEval(_gt(imgs, anns), dets).summarize()

    tp = np.concatenate(tp_list)
    conf = np.concatenate(conf_list)
    pred_cls = np.concatenate(pred_cls_list)
    target_cls = np.concatenate(target_cls_list)

    # (a) COCOEval == step-function 101-pt AP recomputed from OUR matcher's TP
    # assignments: the matching semantics agree exactly on a crowd-free scene.
    order = np.argsort(-conf)
    tp_s, pc_s = tp[order], pred_cls[order]
    classes, nt = np.unique(target_cls, return_counts=True)
    rec_pts = np.linspace(0, 1, 101)
    aps = []
    for ci, c in enumerate(classes):
        m = pc_s == c
        ap_t = []
        for t in range(10):
            tps = np.cumsum(tp_s[m][:, t])
            fps = np.cumsum(~tp_s[m][:, t])
            rc = tps / nt[ci]
            pr = tps / np.maximum(tps + fps, 1e-16)
            pr = np.maximum.accumulate(pr[::-1])[::-1]
            q = np.zeros(101)
            inds = np.searchsorted(rc, rec_pts, side="left")
            v = inds < len(rc)
            q[v] = pr[inds[v]]
            ap_t.append(q.mean())
        aps.append(ap_t)
    step_ap = np.array(aps)
    assert coco_stats[0] == pytest.approx(float(step_ap.mean()), abs=1e-9)
    assert coco_stats[1] == pytest.approx(float(step_ap[:, 0].mean()), abs=1e-9)

    # (b) vs ap_per_class: np.interp linearly bridges PR points, so ultralytics-style
    # mAP sits slightly ABOVE the COCO step function (the known pycocotools delta).
    res = ap_per_class(tp, conf, pred_cls, target_cls)
    ap = res[5]
    assert coco_stats[0] <= float(ap.mean()) <= coco_stats[0] + 0.10
    assert coco_stats[1] <= float(ap[:, 0].mean()) <= coco_stats[1] + 0.10


def test_gt_from_yolo_labels_roundtrip():
    labels = [
        {
            "shape": (480, 640),
            "cls": np.array([[0.0], [2.0]]),
            "bboxes": np.array([[0.5, 0.5, 0.25, 0.5], [0.25, 0.25, 0.1, 0.1]]),
        }
    ]
    gt = gt_from_yolo_labels(labels, ["000000000123.jpg"], class_map=list(range(80)))
    assert gt["images"][0] == {"id": 123, "width": 640, "height": 480}
    a0 = gt["annotations"][0]
    np.testing.assert_allclose(a0["bbox"], [240, 120, 160, 240])
    assert a0["category_id"] == 0 and a0["area"] == 160 * 240
