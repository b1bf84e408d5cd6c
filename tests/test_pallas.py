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



