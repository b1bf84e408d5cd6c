"""Transformer layers (encoder side) in NHWC functional JAX.

Counterpart of reference nn/modules/transformer.py:26-214: TransformerEncoderLayer,
AIFI (2D sin-cos positional encoding), TransformerLayer/Block (used by C3TR), MLP
blocks and LayerNorm2d. The deformable decoder stack (MSDeformAttn,
DeformableTransformerDecoder, transformer.py:216-425) is RT-DETR-only and unused
by any shipped model yaml; its gather-heavy sampling is planned as a Pallas
kernel in a later round.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from yololite_tpu.models.modules import Conv, Module, Seq, _Composite, _kaiming_uniform


class Linear(Module):
    """nn.Linear with torch default init."""

    def __init__(self, c1, c2, bias=True):
        self.c1, self.c2, self.has_bias = c1, c2, bias

    def init(self, key):
        p = {"weight": _kaiming_uniform(key, (self.c2, self.c1), self.c1)}  # torch (out, in)
        if self.has_bias:
            p["bias"] = _kaiming_uniform(key, (self.c2,), self.c1)
        return p, {}

    def __call__(self, params, state, x, ctx, path=()):
        y = x @ params["weight"].T
        return y + params["bias"] if self.has_bias else y


class LayerNorm(Module):
    def __init__(self, c, eps=1e-5):
        self.c, self.eps = c, eps

    def init(self, key):
        return {"weight": jnp.ones(self.c), "bias": jnp.zeros(self.c)}, {}

    def __call__(self, params, state, x, ctx, path=()):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps) * params["weight"] + params["bias"]


class LayerNorm2d(Module):
    """Channel layernorm over NHWC (reference transformer.py:191-214)."""

    def __init__(self, num_channels, eps=1e-6):
        self.c, self.eps = num_channels, eps

    def init(self, key):
        return {"weight": jnp.ones(self.c), "bias": jnp.zeros(self.c)}, {}

    def __call__(self, params, state, x, ctx, path=()):
        u = x.mean(-1, keepdims=True)
        s = ((x - u) ** 2).mean(-1, keepdims=True)
        x = (x - u) / jnp.sqrt(s + self.eps)
        return params["weight"] * x + params["bias"]


class MultiheadAttention(Module):
    """torch nn.MultiheadAttention-compatible (packed in_proj, out_proj)."""

    def __init__(self, embed_dim, num_heads):
        self.e, self.h = embed_dim, num_heads
        self.hd = embed_dim // num_heads

    def init(self, key):
        return (
            {
                "in_proj_weight": _kaiming_uniform(key, (3 * self.e, self.e), self.e),
                "in_proj_bias": jnp.zeros(3 * self.e),
                "out_proj": {
                    "weight": _kaiming_uniform(key, (self.e, self.e), self.e),
                    "bias": jnp.zeros(self.e),
                },
            },
            {},
        )

    def __call__(self, params, state, qkv, ctx, path=()):
        q, k, v = qkv  # each (B, N, E)
        w = params["in_proj_weight"]
        b = params["in_proj_bias"]
        e = self.e
        q = q @ w[:e].T + b[:e]
        k = k @ w[e : 2 * e].T + b[e : 2 * e]
        v = v @ w[2 * e :].T + b[2 * e :]
        B, N, _ = q.shape
        q = q.reshape(B, N, self.h, self.hd)
        k = k.reshape(B, -1, self.h, self.hd)
        v = v.reshape(B, -1, self.h, self.hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(self.hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, e)
        return out @ params["out_proj"]["weight"].T + params["out_proj"]["bias"]


class TransformerEncoderLayer(_Composite):
    """Post/pre-norm encoder layer (reference transformer.py:26-82); dropout=0."""

    def __init__(self, c1, cm=2048, num_heads=8, dropout=0.0, act="gelu", normalize_before=False):
        self.normalize_before = normalize_before
        self.act = act
        self.sub = {
            "ma": MultiheadAttention(c1, num_heads),
            "fc1": Linear(c1, cm),
            "fc2": Linear(cm, c1),
            "norm1": LayerNorm(c1),
            "norm2": LayerNorm(c1),
        }

    def _ffn_act(self, x):
        return jax.nn.gelu(x, approximate=False) if self.act == "gelu" else jax.nn.relu(x)

    def forward_tokens(self, params, state, src, ctx, path, pos=None):
        def attn(s, q_src):
            q = k = q_src if pos is None else q_src + pos
            return self.sub["ma"](params["ma"], state.get("ma", {}), (q, k, s), ctx, path + ("ma",))

        if self.normalize_before:
            s2 = self._apply("norm1", params, state, src, ctx, path)
            src = src + attn(s2, s2)
            s2 = self._apply("norm2", params, state, src, ctx, path)
            s2 = self._apply("fc2", params, state,
                             self._ffn_act(self._apply("fc1", params, state, s2, ctx, path)), ctx, path)
            return src + s2
        src = src + attn(src, src)
        src = self._apply("norm1", params, state, src, ctx, path)
        s2 = self._apply("fc2", params, state,
                         self._ffn_act(self._apply("fc1", params, state, src, ctx, path)), ctx, path)
        return self._apply("norm2", params, state, src + s2, ctx, path)

    def __call__(self, params, state, x, ctx, path=()):
        return self.forward_tokens(params, state, x, ctx, path)


def sincos_2d(w: int, h: int, embed_dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """2D sin-cos positional embedding (reference transformer.py:101-115)."""
    assert embed_dim % 4 == 0
    grid_w, grid_h = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij")
    pos_dim = embed_dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], 1)[None]


class AIFI(TransformerEncoderLayer):
    """Attention-based intra-scale feature interaction (reference transformer.py:84-115).

    NHWC in/out; tokens ordered (w, h) to match the torch flatten of NCHW
    [C,H,W] -> HxW... note the reference builds the pos grid with indexing='ij'
    over (w, h) while flattening pixels in (h, w) order; we replicate exactly.
    """

    def __call__(self, params, state, x, ctx, path=()):
        B, H, W, C = x.shape
        pos = sincos_2d(W, H, C).astype(x.dtype)
        tokens = x.reshape(B, H * W, C)
        out = self.forward_tokens(params, state, tokens, ctx, path, pos=pos)
        return out.reshape(B, H, W, C)


class TransformerLayer(_Composite):
    """LayerNorm-free ViT layer (reference transformer.py:116-133)."""

    def __init__(self, c, num_heads):
        self.sub = {
            "q": Linear(c, c, bias=False),
            "k": Linear(c, c, bias=False),
            "v": Linear(c, c, bias=False),
            "ma": MultiheadAttention(c, num_heads),
            "fc1": Linear(c, c, bias=False),
            "fc2": Linear(c, c, bias=False),
        }

    def __call__(self, params, state, x, ctx, path=()):
        q = self._apply("q", params, state, x, ctx, path)
        k = self._apply("k", params, state, x, ctx, path)
        v = self._apply("v", params, state, x, ctx, path)
        x = self.sub["ma"](params["ma"], state.get("ma", {}), (q, k, v), ctx, path + ("ma",)) + x
        y = self._apply("fc1", params, state, x, ctx, path)
        return self._apply("fc2", params, state, y, ctx, path) + x


class TransformerBlock(_Composite):
    """Conv-projected ViT stack with learned position bias (reference transformer.py:135-155)."""

    def __init__(self, c1, c2, num_heads, num_layers):
        self.c2 = c2
        self.has_conv = c1 != c2
        self.sub = {
            "linear": Linear(c2, c2),
            "tr": Seq(*(TransformerLayer(c2, num_heads) for _ in range(num_layers))),
        }
        if self.has_conv:
            self.sub["conv"] = Conv(c1, c2)

    def __call__(self, params, state, x, ctx, path=()):
        if self.has_conv:
            x = self._apply("conv", params, state, x, ctx, path)
        B, H, W, C = x.shape
        p = x.reshape(B, H * W, C)
        p = p + self._apply("linear", params, state, p, ctx, path)
        p = self._apply("tr", params, state, p, ctx, path)
        return p.reshape(B, H, W, C)


class MLPBlock(_Composite):
    """Linear-act-Linear (reference transformer.py:157-170)."""

    def __init__(self, embedding_dim, mlp_dim):
        self.sub = {"lin1": Linear(embedding_dim, mlp_dim), "lin2": Linear(mlp_dim, embedding_dim)}

    def __call__(self, params, state, x, ctx, path=()):
        y = jax.nn.gelu(self._apply("lin1", params, state, x, ctx, path), approximate=False)
        return self._apply("lin2", params, state, y, ctx, path)


class MLP(_Composite):
    """N-layer FFN with ReLU between layers (reference transformer.py:172-189)."""

    def __init__(self, input_dim, hidden_dim, output_dim, num_layers, sigmoid=False):
        h = [hidden_dim] * (num_layers - 1)
        self.num_layers = num_layers
        self.use_sigmoid = sigmoid
        from yololite_tpu.models.modules import ModList

        self.sub = {"layers": ModList([Linear(n, k) for n, k in zip([input_dim] + h, h + [output_dim])])}

    def __call__(self, params, state, x, ctx, path=()):
        ml = self.sub["layers"]
        for i in range(self.num_layers):
            x = ml.apply_i(i, params["layers"], state.get("layers", {}), x, ctx, path + ("layers",))
            if i < self.num_layers - 1:
                x = jax.nn.relu(x)
        return jax.nn.sigmoid(x) if self.use_sigmoid else x


class C3TR(Module):
    """C3 whose inner stack is a TransformerBlock (reference block.py C3TR)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        from yololite_tpu.models.modules import C3

        self.inner = C3(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.inner.sub["m"] = TransformerBlock(c_, c_, 4, n)

    def init(self, key):
        return self.inner.init(key)

    def __call__(self, params, state, x, ctx, path=()):
        return self.inner(params, state, x, ctx, path)
