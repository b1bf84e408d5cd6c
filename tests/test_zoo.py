"""Module-zoo parity vs reference torch blocks (weights transferred, same input)."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax.numpy as jnp

from yololite_tpu.models.checkpoint import map_state_dict_into
from yololite_tpu.models import modules as M
from yololite_tpu.models import zoo as Z
from yololite_tpu.models import transformer as T

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference mount not present")

# (name, our ctor, reference ctor args) -- all single-input NHWC blocks
CASES = [
    ("C1", lambda: Z.C1(32, 64, 2), ("C1", (32, 64, 2))),
    ("C2", lambda: Z.C2(32, 64, 2), ("C2", (32, 64, 2))),
    ("C2f", lambda: M.C2f(32, 64, 2, True), ("C2f", (32, 64, 2, True))),
    ("C3", lambda: M.C3(32, 64, 2), ("C3", (32, 64, 2))),
    ("C3x", lambda: Z.C3x(32, 64, 2), ("C3x", (32, 64, 2))),
    ("C3Ghost", lambda: Z.C3Ghost(32, 64, 2), ("C3Ghost", (32, 64, 2))),
    ("RepC3", lambda: Z.RepC3(32, 64, 2), ("RepC3", (32, 64, 2))),
    ("BottleneckCSP", lambda: Z.BottleneckCSP(32, 64, 2), ("BottleneckCSP", (32, 64, 2))),
    ("GhostConv", lambda: Z.GhostConv(32, 64, 3, 1), ("GhostConv", (32, 64, 3, 1))),
    ("GhostBottleneck", lambda: Z.GhostBottleneck(32, 64, 3, 2), ("GhostBottleneck", (32, 64, 3, 2))),
    ("Focus", lambda: Z.Focus(3, 32, 3), ("Focus", (3, 32, 3))),
    ("SPP", lambda: Z.SPP(64, 64), ("SPP", (64, 64))),
    ("SPPELAN", lambda: Z.SPPELAN(64, 64, 32), ("SPPELAN", (64, 64, 32))),
    ("RepConv", lambda: Z.RepConv(32, 32), ("RepConv", (32, 32))),
    ("RepVGGDW", lambda: Z.RepVGGDW(32), ("RepVGGDW", (32,))),
    ("CIB", lambda: Z.CIB(32, 32, True), ("CIB", (32, 32, True))),
    ("C2fCIB", lambda: Z.C2fCIB(32, 64, 2), ("C2fCIB", (32, 64, 2))),
    ("PSA", lambda: Z.PSA(128, 128), ("PSA", (128, 128))),
    ("C2fPSA", lambda: Z.C2fPSA(128, 128, 1), ("C2fPSA", (128, 128, 1))),
    ("SCDown", lambda: Z.SCDown(32, 64, 3, 2), ("SCDown", (32, 64, 3, 2))),
    ("ADown", lambda: Z.ADown(64, 64), ("ADown", (64, 64))),
    ("AConv", lambda: Z.AConv(32, 64), ("AConv", (32, 64))),
    ("ELAN1", lambda: Z.ELAN1(32, 64, 64, 32), ("ELAN1", (32, 64, 64, 32))),
    ("RepNCSPELAN4", lambda: Z.RepNCSPELAN4(32, 64, 64, 32, 1), ("RepNCSPELAN4", (32, 64, 64, 32, 1))),
    ("HGStem", lambda: Z.HGStem(3, 16, 32), ("HGStem", (3, 16, 32))),
    ("HGBlock", lambda: Z.HGBlock(32, 16, 32, 3, 3), ("HGBlock", (32, 16, 32, 3, 3))),
    ("ResNetLayer-first", lambda: Z.ResNetLayer(3, 32, 1, True, 1), ("ResNetLayer", (3, 32, 1, True, 1))),
    ("ResNetLayer", lambda: Z.ResNetLayer(64, 16, 2, False, 2), ("ResNetLayer", (64, 16, 2, False, 2))),
    ("CBAM", lambda: Z.CBAM(32), ("CBAM", (32,))),
    ("Proto", lambda: Z.Proto(32, 64, 16), ("Proto", (32, 64, 16))),
    ("AIFI", lambda: T.AIFI(64, 128, 4), ("AIFI", (64, 128, 4))),
    ("TransformerBlock", lambda: T.TransformerBlock(32, 64, 4, 2), ("TransformerBlock", (32, 64, 4, 2))),
    ("C3TR", lambda: T.C3TR(32, 64, 2), ("C3TR", (32, 64, 2))),
]


def _torch_block(name, args):
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.nn import modules as ref_modules

    torch.manual_seed(0)
    blk = getattr(ref_modules, name)(*args)
    for m in blk.modules():  # framework condition: initialize_weights sets eps=1e-3
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
    blk.eval()
    return blk


@needs_ref
@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_zoo_block_parity(case):
    import torch

    label, ours_fn, (ref_name, ref_args) = case
    tb = _torch_block(ref_name, ref_args)
    jb = ours_fn()
    params, state = jb.init(M.KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)

    cin = ref_args[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, cin, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x))
    jy = jb(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), M.Ctx(train=False))
    jy = np.asarray(jy).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(jy, ty.numpy(), rtol=2e-4, atol=2e-4, err_msg=label)


@needs_ref
@pytest.mark.parametrize("name,ours_fn,ref_args", [
    ("Conv2", lambda: Z.Conv2(32, 64, 3, 1), (32, 64, 3, 1)),
    ("Conv2-s2", lambda: Z.Conv2(32, 64, 3, 2), (32, 64, 3, 2)),
], ids=["Conv2", "Conv2-s2"])
def test_conv2_parity(name, ours_fn, ref_args):
    import torch

    tb = _torch_block("Conv2", ref_args)
    jb = ours_fn()
    params, state = jb.init(M.KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, ref_args[0], 32, 32), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x))
    jy = jb(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), M.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty.numpy(), rtol=2e-4, atol=2e-4)
    # fused path (1x1 folded into center tap + BN) matches the unfused forward
    from yololite_tpu.models.modules import fuse_tree

    fp, fs = fuse_tree(params, state)
    assert "cv2" not in fp and "bn" not in fp
    jyf = jb(fp, fs, jnp.asarray(x.transpose(0, 2, 3, 1)), M.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(jyf), np.asarray(jy), rtol=1e-4, atol=1e-4)


@needs_ref
def test_dwconvtranspose2d_parity():
    import torch

    tb = _torch_block("DWConvTranspose2d", (32, 32, 2, 2))
    jb = Z.DWConvTranspose2d(32, 32, 2, 2)
    params, state = jb.init(M.KeyGen(0))
    # grouped transposed conv: torch weight (c_in, c_out//g, kh, kw) -> flipped
    # 5-dim (kh, kw, c_in//g, g, c_out//g); the module reshapes to g-major HWIO
    w = tb.weight.detach().numpy()[:, :, ::-1, ::-1]
    g = tb.groups
    cin, outg, kh, kw = w.shape
    w = w.reshape(g, cin // g, outg, kh, kw).transpose(3, 4, 1, 0, 2)
    params["wt"] = jnp.asarray(w.copy())
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x))
    jy = jb(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), M.Ctx(train=False))
    jyt = np.asarray(jy).transpose(0, 3, 1, 2) + tb.bias.detach().numpy()[None, :, None, None]
    np.testing.assert_allclose(jyt, ty.numpy(), rtol=2e-4, atol=2e-4)


@needs_ref
@pytest.mark.parametrize("scale", [False, True], ids=["noscale", "scale"])
def test_max_sigmoid_attn_parity(scale):
    import torch

    # reference block requires ec == c2 (its embed/guide head reshapes share hc);
    # not exported from nn.modules __init__ -> import from block directly
    import sys as _sys
    _sys.path.insert(0, str(REFERENCE))
    from yololite.nn.modules.block import MaxSigmoidAttnBlock as TorchMSAB
    import torch as _torch

    _torch.manual_seed(0)
    tb = TorchMSAB(48, 32, 2, 32, 24, scale)
    for m in tb.modules():
        if isinstance(_torch.nn.BatchNorm2d, type) and isinstance(m, _torch.nn.BatchNorm2d):
            m.eps = 1e-3
    tb.eval()
    jb = Z.MaxSigmoidAttnBlock(48, 32, nh=2, ec=32, gc=24, scale=scale)
    params, state = jb.init(M.KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 48, 16, 16), dtype=np.float32)
    g = rng.standard_normal((2, 5, 24), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x), torch.from_numpy(g))
    jy = jb(params, state, [jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(g)], M.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty.numpy(), rtol=2e-4, atol=2e-4)


@needs_ref
def test_c2fattn_parity():
    import torch

    tb = _torch_block("C2fAttn", (32, 64, 2, 32, 2, 24))  # ec must equal c2*e (reference constraint)
    jb = Z.C2fAttn(32, 64, 2, ec=32, nh=2, gc=24)
    params, state = jb.init(M.KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 16, 16), dtype=np.float32)
    g = rng.standard_normal((2, 5, 24), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x), torch.from_numpy(g))
    jy = jb(params, state, [jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(g)], M.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty.numpy(), rtol=2e-4, atol=2e-4)


@needs_ref
def test_image_pooling_attn_parity():
    import torch

    tb = _torch_block("ImagePoolingAttn", (32, (16, 24), 48, 4, 3, False))
    jb = Z.ImagePoolingAttn(ec=32, ch=(16, 24), ct=48, nh=4, k=3, scale=False)
    params, state = jb.init(M.KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)
    rng = np.random.default_rng(4)
    f1 = rng.standard_normal((2, 16, 20, 20), dtype=np.float32)
    f2 = rng.standard_normal((2, 24, 10, 10), dtype=np.float32)
    text = rng.standard_normal((2, 7, 48), dtype=np.float32)
    with torch.no_grad():
        ty = tb([torch.from_numpy(f1), torch.from_numpy(f2)], torch.from_numpy(text))
    jy = jb(params, state,
            [jnp.asarray(f1.transpose(0, 2, 3, 1)), jnp.asarray(f2.transpose(0, 2, 3, 1)), jnp.asarray(text)],
            M.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=2e-4, atol=2e-4)


@needs_ref
@pytest.mark.parametrize("bn", [False, True], ids=["l2", "bn"])
def test_contrastive_head_parity(bn):
    import torch

    if bn:
        tb = _torch_block("BNContrastiveHead", (24,))
        jb = Z.BNContrastiveHead(24)
    else:
        tb = _torch_block("ContrastiveHead", ())
        jb = Z.ContrastiveHead()
    params, state = jb.init(M.KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 24, 8, 8), dtype=np.float32)
    w = rng.standard_normal((2, 6, 24), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x), torch.from_numpy(w))
    jy = jb(params, state, [jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w)], M.Ctx(train=False))
    np.testing.assert_allclose(np.asarray(jy).transpose(0, 3, 1, 2), ty.numpy(), rtol=2e-4, atol=2e-4)


def test_parse_spec_new_blocks():
    """Graph compiler builds yamls using the round-2 zoo additions."""
    from yololite_tpu.models.model import DetectionModel

    spec = {
        "nc": 4,
        "backbone": [
            [-1, 1, "Conv2", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[2, 3, 4], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(spec)
    assert m.strides == [8, 16, 32]
    params, state = m.init(0)
    import numpy as np

    x = jnp.asarray(np.zeros((1, 64, 64, 3), np.float32))
    feats = m.apply(params, state, x)
    assert [f.shape[1] for f in feats] == [8, 4, 2]


@needs_ref
def test_dwconvtranspose2d_checkpoint_roundtrip():
    """Grouped transposed-conv weights import from a torch state_dict and export
    back bit-exactly (ADVICE r2: the wt branch assumed groups=1)."""
    import torch

    from yololite_tpu.models.checkpoint import map_state_dict_into, pytree_to_state_dict

    tb = _torch_block("DWConvTranspose2d", (32, 16, 2, 2))  # g = gcd(32,16) = 16
    jb = Z.DWConvTranspose2d(32, 16, 2, 2)
    params, state = jb.init(M.KeyGen(0))
    template = {"m": params}
    sd = {"m.weight": tb.weight.detach().numpy()}
    filled, _ = map_state_dict_into(dict(sd), template, {}, strict=False)
    assert filled["m"]["wt"].shape == params["wt"].shape

    # forward parity at the imported weights (bias handled outside the module)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ty = tb(torch.from_numpy(x)).numpy()
    jy = jb(filled["m"], state, jnp.asarray(x.transpose(0, 2, 3, 1)), M.Ctx(train=False))
    jyt = np.asarray(jy).transpose(0, 3, 1, 2) + tb.bias.detach().numpy()[None, :, None, None]
    np.testing.assert_allclose(jyt, ty, rtol=2e-4, atol=2e-4)

    # export inverse: pytree -> torch names, bit-exact roundtrip
    back = pytree_to_state_dict(filled, {}, prefix="")
    np.testing.assert_array_equal(back["m.weight"], sd["m.weight"])
