"""OBB math parity vs reference probiou / corner conversion / rotated NMS."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax.numpy as jnp

from yololite_tpu.ops.rotated import nms_rotated, probiou, xywhr2xyxyxyxy

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference mount not present")


def _rand_obbs(n, seed=0):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(20, 80, n)
    cy = rng.uniform(20, 80, n)
    w = rng.uniform(5, 30, n)
    h = rng.uniform(5, 30, n)
    r = rng.uniform(0, np.pi / 2, n)
    return np.stack([cx, cy, w, h, r], -1).astype(np.float32)


@needs_ref
def test_probiou_parity():
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.utils.metrics import probiou as ref_probiou

    b1 = _rand_obbs(40, 0)
    b2 = _rand_obbs(40, 1)
    ours = np.asarray(probiou(jnp.asarray(b1), jnp.asarray(b2)))
    theirs = ref_probiou(torch.from_numpy(b1), torch.from_numpy(b2)).numpy().reshape(-1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_ref
def test_xywhr_corners_parity():
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.utils.ops import xywhr2xyxyxyxy as ref_conv

    b = _rand_obbs(20, 2)
    ours = np.asarray(xywhr2xyxyxyxy(jnp.asarray(b)))
    theirs = ref_conv(torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


def test_nms_rotated_suppresses_duplicates():
    base = np.array([[50, 50, 20, 10, 0.3]], np.float32)
    boxes = np.concatenate([base, base + np.array([[0.5, 0.5, 0, 0, 0]], np.float32),
                            np.array([[120, 120, 10, 10, 1.0]], np.float32)])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_det=3)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert 0 in kept and 2 in kept and 1 not in kept
