"""Forward-pass parity vs the PyTorch reference (random weights, transferred).

Builds the reference DetectionModel from its yaml (torch, CPU), exports its
state_dict into our pytrees, runs both on identical inputs, and compares the raw
Detect maps. This is the strongest correctness check available without the
pretrained .pt blob (absent from the mount, SURVEY.md line 31).
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax
import jax.numpy as jnp

from yololite_tpu.models.model import DetectionModel, count_params
from yololite_tpu.models.checkpoint import state_dict_to_pytree
from yololite_tpu.models import modules as M

EXPECTED_TRAINABLE = {"n": 2624064, "s": 9458736, "m": 20114672, "l": 25372144, "x": 56966160}


def test_param_counts_match_reference_spec():
    for scale, expect in EXPECTED_TRAINABLE.items():
        m = DetectionModel(f"yolo11{scale}.yaml")
        p, _ = m.init(jax.random.key(0))
        assert count_params(p) == expect, scale
        assert m.strides == [8, 16, 32]


def test_forward_shapes():
    m = DetectionModel("yolo11n.yaml")
    p, s = m.init(jax.random.key(0))
    x = jnp.zeros((2, 256, 256, 3))
    outs = m.apply(p, s, x)
    assert [o.shape for o in outs] == [(2, 32, 32, 144), (2, 16, 16, 144), (2, 8, 8, 144)]


def _build_reference_model(scale="n", tmp_path=None):
    import os
    import tempfile

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.nn.tasks import DetectionModel as TorchDetectionModel

    # the reference strips the scale letter from the path (yolo11n.yaml ->
    # yolo11.yaml) before loading, so stage the base yaml next to a scale-named
    # path; dir name must avoid digit+[nslmx] sequences (reference regex quirk)
    tmp = "/tmp/yoloref_stage"
    os.makedirs(tmp, exist_ok=True)
    src = REFERENCE / "yololite" / "cfg" / "yolo11.yaml"
    base = f"{tmp}/yolo11.yaml"
    if not os.path.exists(base):
        os.symlink(src, base)
    torch.manual_seed(0)
    tm = TorchDetectionModel(cfg=f"{tmp}/yolo11{scale}.yaml", verbose=False)
    tm.eval()
    return tm


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
@pytest.mark.parametrize("scale", ["n", "s"])
def test_forward_parity_vs_torch(scale):
    import torch

    tm = _build_reference_model(scale)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jm = DetectionModel(f"yolo11{scale}.yaml")
    params, state = state_dict_to_pytree(sd, jm)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 128, 128), dtype=np.float32)

    with torch.no_grad():
        tm_out = tm(torch.from_numpy(x))
    # eval-mode reference returns (decoded, feats); compare the raw feats
    t_feats = tm_out[1] if isinstance(tm_out, tuple) else tm_out

    j_feats = jm.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)))

    for tf, jf in zip(t_feats, j_feats):
        tf = tf.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        jf = np.asarray(jf)
        assert tf.shape == jf.shape
        np.testing.assert_allclose(jf, tf, rtol=1e-4, atol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
def test_train_mode_bn_parity():
    """Batch-stat forward (train=True) matches torch train() behavior on conv0."""
    import torch

    tm = _build_reference_model("n")
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    jm = DetectionModel("yolo11n.yaml")
    params, state = state_dict_to_pytree(sd, jm)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)

    tm.train()
    layer0 = tm.model[0]
    with torch.no_grad():
        t_y = layer0(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    ctx = M.Ctx(train=True)
    row0 = jm.rows[0]
    j_y = np.asarray(row0.mod(params["0"], state["0"], jnp.asarray(x.transpose(0, 2, 3, 1)), ctx, ("0",)))
    np.testing.assert_allclose(j_y, t_y, rtol=1e-4, atol=1e-4)

    # running-stat updates match torch's EMA (momentum 0.03, unbiased var)
    t_mean = layer0.bn.running_mean.numpy()
    t_var = layer0.bn.running_var.numpy()
    upd = ctx.updates[("0", "bn")]
    np.testing.assert_allclose(np.asarray(upd["mean"]), t_mean, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["var"]), t_var, rtol=1e-4, atol=1e-5)


def test_bn_fusion_exact():
    """fuse_tree folds every Conv+BN with no output change (inference path)."""
    from yololite_tpu.models.modules import fuse_tree

    m = DetectionModel("yolo11n.yaml")
    p, s = m.init(0)
    rng = np.random.default_rng(7)
    s = jax.tree.map(lambda x: x + jnp.asarray(rng.uniform(-0.05, 0.05, x.shape), jnp.float32), s)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3), dtype=np.float32))
    y0 = m.apply(p, s, x)
    fp, fs = fuse_tree(p, s)
    y1 = m.apply(fp, fs, x)
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_gflops_matches_reference_spec():
    """Analytic conv+dot GFLOPs within 2% of the reference spec table."""
    for scale, ref in [("n", 6.6), ("s", 21.7)]:
        m = DetectionModel(f"yolo11{scale}.yaml")
        p, s = m.init(0)
        g = m.gflops(p, s, 640)
        assert abs(g - ref) / ref < 0.02, (scale, g)


def test_parse_spec_strides_extended_zoo():
    """Detect strides must account for ALL downsampling modules (ADVICE r1 #3)."""
    from yololite_tpu.models.model import parse_spec

    spec = {
        "nc": 80,
        "backbone": [
            [-1, 1, "Focus", [64, 3]],        # /2
            [-1, 1, "Conv", [128, 3, 2]],     # /4
            [-1, 1, "ADown", [128]],          # /8
            [-1, 1, "SCDown", [256, 3, 2]],   # /16
            [-1, 1, "AConv", [256]],          # /32
        ],
        "head": [
            [[2, 3, 4], 1, "Detect", ["nc"]],
        ],
    }
    rows, save, nc, strides = parse_spec(spec)
    assert strides == [8, 16, 32], strides


def test_parse_spec_rejects_non_pow2_stride():
    import pytest

    from yololite_tpu.models.model import parse_spec

    spec = {
        "nc": 2,
        "backbone": [[-1, 1, "Conv", [16, 3, 3]]],  # stride 3 -> not a power of two
        "head": [[[0], 1, "Detect", ["nc"]]],
    }
    with pytest.raises(ValueError):
        parse_spec(spec)
