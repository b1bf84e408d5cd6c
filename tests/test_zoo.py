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
