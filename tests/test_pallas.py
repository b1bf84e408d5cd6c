"""Pallas kernel tests (interpret mode on CPU) + device letterbox parity vs cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from yololite_tpu.ops.boxes import box_iou
from yololite_tpu.ops.nms import _greedy_keep
from yololite_tpu.ops.pallas_kernels import device_letterbox, greedy_nms_keep_pallas
from yololite_tpu.ops.letterbox import LetterBox


def test_pallas_nms_matches_scan():
    rng = np.random.default_rng(0)
    B, K = 2, 128
    centers = rng.uniform(20, 600, (B, K, 2))
    wh = rng.uniform(10, 120, (B, K, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, (B, K)).astype(np.float32), axis=-1)  # sorted desc
    valid = scores > 0.1

    iou = np.stack([np.asarray(box_iou(jnp.asarray(b), jnp.asarray(b))) for b in boxes])
    keep_pallas = np.asarray(
        greedy_nms_keep_pallas(jnp.asarray(iou), jnp.asarray(valid), 0.45, interpret=True)
    )
    for b in range(B):
        # _greedy_keep takes the (K, 4) boxes and computes IoU slabs on the fly
        keep_scan = np.asarray(_greedy_keep(jnp.asarray(boxes[b]), jnp.asarray(valid[b]), 0.45))
        np.testing.assert_array_equal(keep_pallas[b] > 0, keep_scan)


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (417, 333)])
def test_device_letterbox_matches_cv2(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (*shape, 3), np.uint8)
    host = LetterBox((320, 320))(img).astype(np.float32) / 255.0
    dev = np.asarray(device_letterbox(jnp.asarray(img)[None], imgsz=320))[0]
    assert dev.shape == host.shape
    # identical geometry; bilinear kernels agree to ~1 LSB of uint8
    assert np.abs(dev - host).max() < (2.0 / 255.0)
    # padding region (geometric) is exactly the fill value
    h0, w0 = shape
    r = min(320 / h0, 320 / w0)
    new_w, new_h = int(round(w0 * r)), int(round(h0 * r))
    top = int(round((320 - new_h) / 2 - 0.1))
    left = int(round((320 - new_w) / 2 - 0.1))
    if top > 0:
        np.testing.assert_allclose(dev[:top], 114 / 255.0, atol=1e-6)
    if left > 0:
        np.testing.assert_allclose(dev[:, :left], 114 / 255.0, atol=1e-6)


def test_decode_select_pallas_matches_decode():
    """Fused decode+select kernel == decode_detections + max/argmax (interpret mode)."""
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.pallas_kernels import decode_select_pallas

    B = 2
    shapes = [(16, 16), (8, 8), (4, 4)]
    strides = [8, 16, 32]
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, h, w, 144), np.float32)) for h, w in shapes]

    boxes_ref, scores_ref = decode_detections(feats, strides, 80, 16, xywh=False)
    conf_ref = np.max(np.asarray(scores_ref), -1)
    cls_ref = np.argmax(np.asarray(scores_ref), -1)

    boxes, conf, cls = decode_select_pallas(feats, strides, 80, 16, conf_thres=0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(boxes_ref), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cls), cls_ref)
    gated = np.where(conf_ref > 0.25, conf_ref, -1.0)
    np.testing.assert_array_equal(np.asarray(conf) > 0, gated > 0)  # identical gating
    sel = gated > 0
    np.testing.assert_allclose(np.asarray(conf)[sel], gated[sel], atol=1e-6)


def test_fused_decode_nms_matches_reference_path():
    """fused_decode_nms == decode_detections + non_max_suppression end-to-end."""
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import fused_decode_nms, non_max_suppression

    B = 3
    shapes = [(16, 16), (8, 8), (4, 4)]
    strides = [8, 16, 32]
    rng = np.random.default_rng(4)
    feats = [jnp.asarray(rng.standard_normal((B, h, w, 144), np.float32)) for h, w in shapes]

    b, sc = decode_detections(feats, strides, 80, 16, xywh=False)
    ref = np.asarray(non_max_suppression(b, sc, conf_thres=0.25, iou_thres=0.6, max_det=50, max_cand=128))
    out = np.asarray(fused_decode_nms(feats, strides, 80, 16, conf_thres=0.25, iou_thres=0.6,
                                      max_det=50, max_cand=128, interpret=True))
    assert (ref[..., 4] > 0).sum() == (out[..., 4] > 0).sum()
    np.testing.assert_allclose(out, ref, atol=1e-3)
