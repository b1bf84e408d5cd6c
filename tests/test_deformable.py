"""Deformable attention parity vs the reference torch implementation."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax.numpy as jnp

from yololite_tpu.models.checkpoint import map_state_dict_into
from yololite_tpu.models.deformable import (
    DeformableTransformerDecoderLayer,
    MSDeformAttn,
    grid_sample_bilinear,
    multi_scale_deformable_attn,
)
from yololite_tpu.models.modules import Ctx, KeyGen

needs_ref = pytest.mark.skipif(not reference_available(), reason="reference mount not present")


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 8, 10, 4), dtype=np.float32)  # NHWC
    grid = rng.uniform(-1.3, 1.3, (3, 5, 7, 2)).astype(np.float32)  # include out-of-range
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    with torch.no_grad():
        t = F.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy()  # (N, C, 5, 7)
    np.testing.assert_allclose(ours, t.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5)


@needs_ref
def test_ms_deformable_attn_core_parity():
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.nn.modules.utils import multi_scale_deformable_attn_pytorch

    rng = np.random.default_rng(1)
    B, heads, c = 2, 4, 8
    shapes = [(8, 8), (4, 4)]
    len_v = sum(h * w for h, w in shapes)
    Q, L, P = 6, len(shapes), 3
    value = rng.standard_normal((B, len_v, heads, c), dtype=np.float32)
    loc = rng.uniform(0, 1, (B, Q, heads, L, P, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (B, Q, heads, L, P)).astype(np.float32)

    ours = np.asarray(multi_scale_deformable_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    with torch.no_grad():
        theirs = multi_scale_deformable_attn_pytorch(
            torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(w)
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_ref
def test_msdeformattn_module_parity():
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.nn.modules.transformer import MSDeformAttn as RefAttn

    torch.manual_seed(0)
    ref = RefAttn(d_model=32, n_levels=2, n_heads=4, n_points=2)
    ref.eval()
    ours = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=2)
    params, state = ours.init(KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)

    rng = np.random.default_rng(2)
    shapes = [(6, 6), (3, 3)]
    len_v = sum(h * w for h, w in shapes)
    B, Q = 2, 5
    query = rng.standard_normal((B, Q, 32), dtype=np.float32)
    refer = rng.uniform(0.2, 0.8, (B, Q, 2, 2)).astype(np.float32)
    value = rng.standard_normal((B, len_v, 32), dtype=np.float32)

    with torch.no_grad():
        t = ref(torch.from_numpy(query), torch.from_numpy(refer), torch.from_numpy(value), shapes).numpy()
    j = np.asarray(ours(params, state, (jnp.asarray(query), jnp.asarray(refer), jnp.asarray(value), shapes),
                        Ctx(False)))
    np.testing.assert_allclose(j, t, rtol=1e-4, atol=1e-5)


@needs_ref
def test_decoder_layer_parity():
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.nn.modules.transformer import DeformableTransformerDecoderLayer as RefLayer

    torch.manual_seed(1)
    ref = RefLayer(d_model=32, n_heads=4, d_ffn=64, n_levels=2, n_points=2)
    ref.eval()
    ours = DeformableTransformerDecoderLayer(d_model=32, n_heads=4, d_ffn=64, n_levels=2, n_points=2)
    params, state = ours.init(KeyGen(0))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, state = map_state_dict_into(sd, params, state)

    rng = np.random.default_rng(3)
    shapes = [(6, 6), (3, 3)]
    len_v = sum(h * w for h, w in shapes)
    B, Q = 2, 5
    embed = rng.standard_normal((B, Q, 32), dtype=np.float32)
    refer = rng.uniform(0.2, 0.8, (B, Q, 2)).astype(np.float32)
    feats = rng.standard_normal((B, len_v, 32), dtype=np.float32)

    with torch.no_grad():
        t = ref(torch.from_numpy(embed), torch.from_numpy(refer), torch.from_numpy(feats), shapes).numpy()
    j = np.asarray(ours(params, state, (jnp.asarray(embed), jnp.asarray(refer), jnp.asarray(feats), shapes),
                        Ctx(False)))
    np.testing.assert_allclose(j, t, rtol=1e-4, atol=2e-5)
