"""Unit tests for box algebra, decode, NMS, and letterbox geometry."""

import numpy as np
import pytest

import jax.numpy as jnp

from yololite_tpu.ops import (
    bbox_iou,
    box_iou,
    bbox2dist,
    dist2bbox,
    make_anchors,
    non_max_suppression,
    xywh2xyxy,
    xyxy2xywh,
    LetterBox,
)
from yololite_tpu.ops.decode import dfl_expectation


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    back = xyxy2xywh(xywh2xyxy(b))
    np.testing.assert_allclose(back, b, rtol=1e-5, atol=1e-4)


def test_dist2bbox_roundtrip():
    rng = np.random.default_rng(1)
    anchors = jnp.asarray(rng.uniform(5, 50, (30, 2)).astype(np.float32))
    dist = jnp.asarray(rng.uniform(0, 10, (30, 4)).astype(np.float32))
    boxes = dist2bbox(dist, anchors, xywh=False)
    back = bbox2dist(anchors, boxes, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), rtol=1e-5, atol=1e-4)


def test_dfl_expectation_degenerate():
    # one-hot logits -> expectation equals the hot bin index
    logits = np.full((1, 3, 64), -1e9, dtype=np.float32)
    for a, hot in enumerate([2, 7, 15]):
        for side in range(4):
            logits[0, a, side * 16 + hot] = 0.0
    out = np.asarray(dfl_expectation(jnp.asarray(logits)))
    np.testing.assert_allclose(out[0, 0], [2] * 4, atol=1e-5)
    np.testing.assert_allclose(out[0, 1], [7] * 4, atol=1e-5)
    np.testing.assert_allclose(out[0, 2], [15] * 4, atol=1e-5)


def test_make_anchors_matches_reference_math():
    anchors, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
    anchors, strides = np.asarray(anchors), np.asarray(strides)
    assert anchors.shape == (20, 2) and strides.shape == (20, 1)
    np.testing.assert_allclose(anchors[0], [0.5, 0.5])
    np.testing.assert_allclose(anchors[5], [1.5, 1.5])  # row-major: second row, second col
    np.testing.assert_allclose(strides[:16], 8)
    np.testing.assert_allclose(strides[16:], 16)


def test_ciou_matches_manual():
    b1 = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    b2 = jnp.asarray([[12.0, 12.0, 22.0, 22.0]])
    plain = float(np.asarray(bbox_iou(b1, b2, xywh=False))[0])
    ciou = float(np.asarray(bbox_iou(b1, b2, xywh=False, CIoU=True))[0])
    inter = 8 * 8
    union = 100 + 100 - inter
    assert abs(plain - inter / union) < 1e-4
    assert ciou < plain  # CIoU penalizes center distance


def nms_oracle(boxes, scores, iou_thres):
    """Plain numpy greedy NMS (torchvision semantics: suppress IoU > threshold)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = np.asarray(box_iou(boxes[i : i + 1], boxes)).reshape(-1)
        suppressed |= ious > iou_thres
        suppressed[i] = True
    return np.array(keep)


@pytest.mark.parametrize("agnostic", [False, True])
def test_nms_matches_greedy_oracle(agnostic):
    rng = np.random.default_rng(2)
    n, nc = 200, 5
    centers = rng.uniform(50, 590, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    cls = rng.integers(0, nc, n)
    conf = rng.uniform(0, 1, n).astype(np.float32)
    scores = np.zeros((n, nc), np.float32)
    scores[np.arange(n), cls] = conf

    out = np.asarray(
        non_max_suppression(
            jnp.asarray(boxes)[None], jnp.asarray(scores)[None], conf_thres=0.1, iou_thres=0.45,
            max_det=300, max_cand=256, agnostic=agnostic,
        )
    )[0]
    got = out[out[:, 4] > 0]

    mask = conf > 0.1
    off = np.zeros(n) if agnostic else cls * 7680.0
    obx = boxes + off[:, None]
    keep = nms_oracle(obx[mask], conf[mask], 0.45)
    exp_idx = np.flatnonzero(mask)[keep]
    # same detection set, sorted by confidence
    exp = np.concatenate([boxes[exp_idx], conf[exp_idx, None], cls[exp_idx, None].astype(np.float32)], -1)
    exp = exp[np.argsort(-exp[:, 4], kind="stable")][:300]
    assert got.shape[0] == exp.shape[0]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-3)


def test_nms_multilabel():
    # one box scoring above threshold for two classes -> two detections survive
    boxes = np.array([[10, 10, 50, 50]], np.float32)
    scores = np.array([[0.9, 0.8, 0.001]], np.float32)
    out = np.asarray(
        non_max_suppression(
            jnp.asarray(boxes)[None], jnp.asarray(scores)[None], conf_thres=0.01, iou_thres=0.5,
            max_det=10, max_cand=8, multi_label=True,
        )
    )[0]
    got = out[out[:, 4] > 0]
    assert got.shape[0] == 2
    assert set(got[:, 5].astype(int)) == {0, 1}


def test_letterbox_geometry_vs_reference_math():
    # 480x640 -> 640x640: r=1.0 wait no: min(640/480, 640/640)=1.0 -> pad dh=(640-480)/2=80
    img = np.full((480, 640, 3), 37, np.uint8)
    lb = LetterBox((640, 640))
    out = lb(img)
    assert out.shape == (640, 640, 3)
    assert (out[:80] == 114).all() and (out[-80:] == 114).all()
    assert (out[80:560] == 37).all()

    # odd padding split: 100x200 -> 64x64: r=0.32 -> new_unpad=(64,32), dh=32 -> 15.95/16.05 -> top 16, bottom 16
    img2 = np.full((100, 200, 3), 9, np.uint8)
    out2 = LetterBox((64, 64))(img2)
    assert out2.shape == (64, 64, 3)
    col = out2[:, 32, 0]
    assert (col[:16] == 114).all() and (col[-16:] == 114).all()


def test_nms_fast_mode_runs():
    """Fast mode (one-shot matrix NMS) returns a valid padded tensor.
    (The former 'serve' mode was deleted in round 4 after losing to exact
    greedy at every batch size — docs/r4_latency_results.log.)"""
    rng = np.random.default_rng(4)
    boxes = rng.uniform(0, 600, (2, 400, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 50, (2, 400, 2))
    scores = (rng.random((2, 400, 3)) ** 4).astype(np.float32)
    out = np.asarray(
        non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), conf_thres=0.2, iou_thres=0.5,
                            max_det=50, max_cand=128, mode="fast")
    )
    assert out.shape == (2, 50, 6)
    got = out[out[..., 4] > 0]
    assert (got[:, 4] > 0.2).all()


@pytest.mark.parametrize("half", [False, True], ids=["f32", "bf16"])
def test_nms_from_feats_matches_decode_then_nms(half):
    """Late-decode NMS (select top-K first, decode K boxes) is numerically
    identical to decode_detections + non_max_suppression on the same maps."""
    import jax
    import jax.numpy as jnp

    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import nms_from_feats, non_max_suppression

    nc, reg_max, strides = 8, 16, (8, 16, 32)
    B = 3
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((B, s, s, 4 * reg_max + nc)).astype(np.float32) * 2)
        for s in (16, 8, 4)
    ]
    if half:
        feats = [f.astype(jnp.bfloat16) for f in feats]
    else:
        feats = [f.astype(jnp.float32) for f in feats]

    kw = dict(conf_thres=0.05, iou_thres=0.5, max_det=40, max_cand=128)
    if not half:
        # f32: pipeline must match the reference path tightly (the segment-matmul
        # DFL rounds differently at ~1e-6 relative -> ~1e-3 px)
        ffull = [f.astype(jnp.float32) for f in feats]
        boxes, scores = decode_detections(ffull, strides, nc, reg_max, xywh=False)
        ref = np.asarray(non_max_suppression(boxes, scores, multi_label=False, **kw))
        out = np.asarray(nms_from_feats(feats, strides, nc, reg_max, half=half, **kw))
        np.testing.assert_allclose(out[..., 4:], ref[..., 4:], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(out[..., :4], ref[..., :4], atol=1e-3)

        cm = jnp.asarray(np.arange(nc) % 2 == 0)
        ref2 = np.asarray(non_max_suppression(boxes, scores, multi_label=False,
                                              class_mask=cm, agnostic=True, **kw))
        out2 = np.asarray(nms_from_feats(feats, strides, nc, reg_max, half=half,
                                         class_mask=cm, agnostic=True, **kw))
        np.testing.assert_allclose(out2[..., 4:], ref2[..., 4:], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(out2[..., :4], ref2[..., :4], atol=1e-3)
        return

    # bf16 half path: build the oracle with the pipeline's own box math (f32
    # segment-matmul DFL of the bf16 logits + standard NMS on bf16 scores) —
    # then selection, suppression and ranking must match bit-tightly
    from yololite_tpu.ops.boxes import dist2bbox, make_anchors
    from yololite_tpu.ops.decode import dfl_expectation_mm

    B = feats[0].shape[0]
    bl = jnp.concatenate([f[..., : 4 * reg_max].reshape(B, -1, 4 * reg_max) for f in feats], 1)
    scores = jnp.concatenate(
        [jax.nn.sigmoid(f[..., 4 * reg_max:]).reshape(B, -1, nc) for f in feats], 1
    )  # bf16, same values the pipeline's sigmoid(max) selection sees
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    boxes_all = dist2bbox(dfl_expectation_mm(bl, reg_max), anchors[None], xywh=False) * stride_t[None]
    ref = np.asarray(non_max_suppression(boxes_all.astype(jnp.float32), scores,
                                         multi_label=False, **kw))
    out = np.asarray(nms_from_feats(feats, strides, nc, reg_max, half=True, **kw))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fixpoint_keep_matches_sequential_on_chains():
    """Alternating suppression chains are the fixpoint iteration's worst case:
    box k overlaps only box k+1, so keep decisions alternate and each sweep
    finalizes one more link. Must equal the sequential greedy oracle exactly."""
    import jax.numpy as jnp

    from yololite_tpu.ops.nms import _fixpoint_keep, _greedy_keep

    # chain of 12 boxes, each overlapping only its neighbor (IoU ~0.54)
    n = 12
    boxes = np.stack([
        np.arange(n) * 6.0, np.zeros(n), np.arange(n) * 6.0 + 13.0, np.full(n, 10.0)
    ], axis=1).astype(np.float32)
    valid = np.ones(n, bool)
    valid[3] = False  # a hole re-links the chain parity after it

    shifted = jnp.asarray(boxes)[None]
    v = jnp.asarray(valid)[None]
    fix = np.asarray(_fixpoint_keep(shifted, v, 0.4))[0]
    seq = np.asarray(_greedy_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.4))

    # numpy sequential-greedy oracle
    def iou(a, b):
        x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
        x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
        inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua
    keep = valid.copy()
    for j in range(n):
        if not keep[j]:
            continue
        for i in range(j):
            if keep[i] and iou(boxes[i], boxes[j]) > 0.4:
                keep[j] = False
                break
    np.testing.assert_array_equal(fix, keep)
    np.testing.assert_array_equal(seq, keep)
    # the chain alternates keeps around the hole
    assert keep.sum() > 2 and not keep.all()


def test_fixpoint_vs_scan_fuzz():
    """Fixpoint greedy == chunked-scan greedy over many random crowded scenes."""
    import jax.numpy as jnp

    from yololite_tpu.ops.nms import _fixpoint_keep, _greedy_keep

    for seed in range(12):
        rng = np.random.default_rng(seed)
        n = 96
        centers = rng.uniform(20, 120, (n, 2))  # dense -> long suppression cascades
        wh = rng.uniform(10, 60, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
        boxes = boxes[np.argsort(-rng.random(n))]  # arbitrary "score" order
        valid = rng.random(n) > 0.1
        fix = np.asarray(_fixpoint_keep(jnp.asarray(boxes)[None], jnp.asarray(valid)[None], 0.5))[0]
        seq = np.asarray(_greedy_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        np.testing.assert_array_equal(fix, seq, err_msg=f"seed={seed}")


def test_fixpoint_chunked_matches_scan_fuzz():
    """Chunked fixpoint (large-K form, on-the-fly IoU slabs) == chunked-scan
    greedy, at a K spanning several slabs and on the adversarial chain."""
    import jax.numpy as jnp

    from yololite_tpu.ops.nms import _fixpoint_keep_chunked, _greedy_keep

    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        n = 160  # chunk=64 -> 3 slabs (chunk arg below keeps the test fast)
        centers = rng.uniform(20, 150, (n, 2))
        wh = rng.uniform(10, 60, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
        boxes = boxes[np.argsort(-rng.random(n))]
        valid = rng.random(n) > 0.1
        fix = np.asarray(_fixpoint_keep_chunked(
            jnp.asarray(boxes)[None], jnp.asarray(valid)[None], 0.5, chunk=64))[0]
        seq = np.asarray(_greedy_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        np.testing.assert_array_equal(fix, seq, err_msg=f"seed={seed}")

    # adversarial alternating chain with a hole (fixpoint's worst case)
    n = 24
    boxes = np.stack([
        np.arange(n) * 6.0, np.zeros(n), np.arange(n) * 6.0 + 13.0, np.full(n, 10.0)
    ], axis=1).astype(np.float32)
    valid = np.ones(n, bool)
    valid[5] = False
    fix = np.asarray(_fixpoint_keep_chunked(
        jnp.asarray(boxes)[None], jnp.asarray(valid)[None], 0.4, chunk=8))[0]
    seq = np.asarray(_greedy_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.4))
    np.testing.assert_array_equal(fix, seq)


def test_nms_large_k_modes_emit_identical_detections():
    """non_max_suppression's large-K strategies ('blocked' default, 'fixpoint',
    'scan') must emit identical detections (multi-label val path)."""
    from yololite_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(11)
    a, nc = 600, 8
    boxes = np.concatenate([rng.uniform(0, 300, (1, a, 2)),
                            rng.uniform(10, 80, (1, a, 2))], -1).astype(np.float32)
    boxes = np.asarray(xywh2xyxy(jnp.asarray(boxes)))
    scores = rng.random((1, a, nc)).astype(np.float32) ** 4
    kw = dict(conf_thres=0.001, iou_thres=0.7, max_det=300, max_cand=2048, multi_label=True)

    assert nms_mod.LARGE_K_MODE == "blocked"
    ref = np.asarray(non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), **kw))
    try:
        for mode in ("fixpoint", "scan"):
            nms_mod.LARGE_K_MODE = mode
            non_max_suppression.clear_cache()
            out = np.asarray(non_max_suppression(jnp.asarray(boxes), jnp.asarray(scores), **kw))
            np.testing.assert_array_equal(out, ref, err_msg=mode)
    finally:
        nms_mod.LARGE_K_MODE = "blocked"
        non_max_suppression.clear_cache()
    assert (out[..., 4] > 0).sum() > 10  # non-trivial scene


def test_nms_from_feats_large_k_scan_fallback():
    """max_cand > 1024 routes suppression through the chunked scan; results must
    match the standard decode+NMS path on the same maps."""
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import nms_from_feats, non_max_suppression

    nc, reg_max, strides = 4, 16, (8, 16, 32)
    rng = np.random.default_rng(7)
    feats = [jnp.asarray(rng.standard_normal((1, s, s, 4 * reg_max + nc)).astype(np.float32))
             for s in (32, 16, 8)]  # A = 1024 + 256 + 64 = 1344
    kw = dict(conf_thres=0.4, iou_thres=0.5, max_det=64, max_cand=1344)
    boxes, scores = decode_detections(feats, strides, nc, reg_max, xywh=False)
    ref = np.asarray(non_max_suppression(boxes, scores, multi_label=False, **kw))
    out = np.asarray(nms_from_feats(feats, strides, nc, reg_max, **kw))
    np.testing.assert_allclose(out[..., 4:], ref[..., 4:], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[..., :4], ref[..., :4], atol=1e-3)


def test_nms_from_feats_multilabel_matches_decode_then_nms():
    """Fused multi-label select-first == decode_detections +
    non_max_suppression(multi_label=True), tie order included (the validator
    pipeline, VERDICT r3 #5)."""
    import jax.numpy as jnp

    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import nms_from_feats, non_max_suppression

    nc, reg_max, strides = 8, 16, (8, 16, 32)
    B = 3
    rng = np.random.default_rng(7)
    feats = [
        jnp.asarray(rng.standard_normal((B, s, s, 4 * reg_max + nc)).astype(np.float32) * 2)
        for s in (16, 8, 4)
    ]
    # validator shape: low conf gate, large candidate pool, multi-label
    kw = dict(conf_thres=0.01, iou_thres=0.5, max_det=60, max_cand=512)
    boxes, scores = decode_detections(feats, strides, nc, reg_max, xywh=False)
    ref = np.asarray(non_max_suppression(boxes, scores, multi_label=True, **kw))
    out = np.asarray(nms_from_feats(feats, strides, nc, reg_max, multi_label=True, **kw))
    np.testing.assert_allclose(out[..., 4:], ref[..., 4:], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(out[..., :4], ref[..., :4], atol=1e-3)
    # multi-label must emit multiple classes for the same anchor when both pass
    assert len(np.unique(ref[ref[..., 4] > 0][:, 5])) > 1


def test_blocked_keep_matches_serial_greedy():
    """_blocked_keep (block fixpoint + cross-suppression) is bit-identical to
    the serial greedy scan, including adversarial alternating chains that
    straddle block boundaries."""
    import jax
    import jax.numpy as jnp

    from yololite_tpu.ops.nms import _blocked_keep, _greedy_keep

    rng = np.random.default_rng(11)
    K, B = 512, 2

    def ref_keep(shifted, valid):
        return np.asarray(jax.vmap(
            lambda s, v: _greedy_keep(s, v, iou_thres=0.5))(shifted, valid))

    # random clusters
    centers = rng.uniform(0, 400, (B, K, 2))
    wh = rng.uniform(10, 60, (B, K, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    valid = rng.random((B, K)) > 0.1
    got = np.asarray(_blocked_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5, block=128))
    np.testing.assert_array_equal(got, ref_keep(jnp.asarray(boxes), jnp.asarray(valid)))

    # adversarial overlapping chain: box i overlaps i+1 heavily (IoU 14/26 =
    # 0.54 > 0.5) but not i+2 (8/32 = 0.25), so greedy keeps alternating
    # members; the chain crosses every block boundary
    xs = np.arange(K, dtype=np.float32) * 6.0
    chain = np.stack([xs, np.zeros(K, np.float32), xs + 20.0, np.full(K, 20.0, np.float32)], -1)
    chain_b = np.broadcast_to(chain, (B, K, 4)).copy()
    valid_all = np.ones((B, K), bool)
    got2 = np.asarray(_blocked_keep(jnp.asarray(chain_b), jnp.asarray(valid_all), 0.5, block=128))
    ref2 = ref_keep(jnp.asarray(chain_b), jnp.asarray(valid_all))
    np.testing.assert_array_equal(got2, ref2)
    assert got2[0].sum() > 0 and not got2[0].all()

    # fully-dead tail: everything beyond the first block suppressed or invalid
    one = np.tile(np.array([[0, 0, 100, 100]], np.float32), (K, 1))
    one_b = np.broadcast_to(one, (B, K, 4)).copy()
    got3 = np.asarray(_blocked_keep(jnp.asarray(one_b), jnp.asarray(valid_all), 0.5, block=128))
    ref3 = ref_keep(jnp.asarray(one_b), jnp.asarray(valid_all))
    np.testing.assert_array_equal(got3, ref3)
    assert got3.sum() == B  # exactly one survivor per image


def test_take_rows_blocked_exact():
    """take_rows_blocked == take_along_axis row gather, bit-for-bit, every
    dtype/shape/block incl. A not divisible by block and repeated indices."""
    import jax.numpy as jnp

    from yololite_tpu.ops.decode import take_rows_blocked

    rng = np.random.default_rng(3)
    for a, w, k, block in [(8400, 64, 300, 16), (100, 4, 7, 16), (33, 1, 40, 8)]:
        x = rng.standard_normal((2, a, w)).astype(np.float32)
        idx = rng.integers(0, a, (2, k)).astype(np.int32)
        idx[:, :2] = idx[:, 2:4]  # repeated indices must replicate rows
        for dt in (jnp.float32, jnp.bfloat16):
            xd = jnp.asarray(x, dt)
            got = np.asarray(take_rows_blocked(xd, jnp.asarray(idx), block), np.float32)
            ref = np.asarray(xd, np.float32)[np.arange(2)[:, None], idx]
            np.testing.assert_array_equal(got, ref, err_msg=f"a={a} w={w} block={block} {dt}")


def test_nms_from_feats_gather_modes_identical():
    """All three GATHER_MODE forms (ohg / blocked / dfl_all) emit bit-identical
    detections, f32 and bf16."""
    import jax.numpy as jnp

    from yololite_tpu.ops import nms as nms_mod
    from yololite_tpu.ops.nms import nms_from_feats

    nc, reg_max, strides = 8, 16, (8, 16, 32)
    rng = np.random.default_rng(7)
    for half in (False, True):
        feats = [
            jnp.asarray(rng.standard_normal((2, s, s, 4 * reg_max + nc)).astype(np.float32) * 2)
            for s in (16, 8, 4)
        ]
        if half:
            feats = [f.astype(jnp.bfloat16) for f in feats]
        kw = dict(conf_thres=0.05, iou_thres=0.5, max_det=40, max_cand=128, half=half)
        old = nms_mod.GATHER_MODE
        try:
            outs = {}
            for gm in ("ohg", "blocked", "dfl_all"):
                nms_mod.GATHER_MODE = gm
                outs[gm] = np.asarray(nms_from_feats(feats, strides, nc, reg_max, **kw))
        finally:
            nms_mod.GATHER_MODE = old
        np.testing.assert_array_equal(outs["ohg"], outs["dfl_all"], err_msg=f"half={half}")
        np.testing.assert_array_equal(outs["ohg"], outs["blocked"], err_msg=f"half={half}")
