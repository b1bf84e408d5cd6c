"""Deformable-DETR decoder stack in JAX (RT-DETR tail of the module zoo).

Counterpart of reference nn/modules/transformer.py:216-425 (MSDeformAttn,
DeformableTransformerDecoderLayer/Decoder) and nn/modules/utils.py:26-70
(multi_scale_deformable_attn). The CUDA grid_sample becomes a vectorized
bilinear gather (align_corners=False, zeros padding) — fixed shapes, jittable.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.models.modules import Module, _Composite
from yololite_tpu.models.transformer import LayerNorm, Linear, MultiheadAttention


def inverse_sigmoid(x, eps=1e-5):
    x = x.clip(0, 1)
    return jnp.log(x.clip(eps) / (1 - x).clip(eps))


def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch F.grid_sample(mode=bilinear, padding=zeros, align_corners=False).

    img: (N, H, W, C); grid: (N, Q, P, 2) xy in [-1, 1]. Returns (N, Q, P, C).
    """
    N, H, W, C = img.shape
    gx = ((grid[..., 0] + 1) * W - 1) / 2
    gy = ((grid[..., 1] + 1) * H - 1) / 2
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = gx - x0
    wy1 = gy - y0
    wx0, wy0 = 1 - wx1, 1 - wy1

    def tap(yi, xi, wy, wx):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = yi.clip(0, H - 1).astype(jnp.int32)
        xc = xi.clip(0, W - 1).astype(jnp.int32)
        n = jnp.arange(N)[:, None, None]
        v = img[n, yc, xc]  # (N, Q, P, C)
        return v * (wy * wx * valid)[..., None]

    return tap(y0, x0, wy0, wx0) + tap(y0, x1, wy0, wx1) + tap(y1, x0, wy1, wx0) + tap(y1, x1, wy1, wx1)


def multi_scale_deformable_attn(
    value: jnp.ndarray,  # (B, len_v, heads, c_head)
    value_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Q, heads, levels, points, 2) in [0, 1]
    attention_weights: jnp.ndarray,  # (B, Q, heads, levels, points)
) -> jnp.ndarray:
    """Reference utils.py:26-70 semantics with a bilinear-gather grid sample."""
    B, _, heads, c_head = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    grids = 2 * sampling_locations - 1
    start = 0
    sampled = []
    for lvl, (H, W) in enumerate(value_shapes):
        v = value[:, start : start + H * W]  # (B, HW, heads, c)
        start += H * W
        v = v.transpose(0, 2, 1, 3).reshape(B * heads, H, W, c_head)
        g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4).reshape(B * heads, Q, P, 2)
        sampled.append(grid_sample_bilinear(v, g))  # (B*heads, Q, P, c)
    s = jnp.stack(sampled, axis=2)  # (B*heads, Q, L, P, c)
    w = attention_weights.transpose(0, 2, 1, 3, 4).reshape(B * heads, Q, L, P, 1)
    out = (s * w).sum(axis=(2, 3))  # (B*heads, Q, c)
    return out.reshape(B, heads, Q, c_head).transpose(0, 2, 1, 3).reshape(B, Q, heads * c_head)


class MSDeformAttn(_Composite):
    """Multiscale deformable attention (reference transformer.py:216-310)."""

    def __init__(self, d_model=256, n_levels=4, n_heads=8, n_points=4):
        assert d_model % n_heads == 0
        self.d_model, self.n_levels, self.n_heads, self.n_points = d_model, n_levels, n_heads, n_points
        self.sub = {
            "sampling_offsets": Linear(d_model, n_heads * n_levels * n_points * 2),
            "attention_weights": Linear(d_model, n_heads * n_levels * n_points),
            "value_proj": Linear(d_model, d_model),
            "output_proj": Linear(d_model, d_model),
        }

    def init(self, key):
        params, state = _Composite.init(self, key)
        # reference grid prior on the offset bias (transformer.py:246-262)
        thetas = np.arange(self.n_heads, dtype=np.float32) * (2 * math.pi / self.n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, self.n_levels, self.n_points, 1))
        for i in range(self.n_points):
            grid[:, :, i, :] *= i + 1
        params["sampling_offsets"]["weight"] = jnp.zeros_like(params["sampling_offsets"]["weight"])
        params["sampling_offsets"]["bias"] = jnp.asarray(grid.reshape(-1))
        params["attention_weights"]["weight"] = jnp.zeros_like(params["attention_weights"]["weight"])
        params["attention_weights"]["bias"] = jnp.zeros_like(params["attention_weights"]["bias"])
        return params, state

    def __call__(self, params, state, inputs, ctx, path=()):
        query, refer_bbox, value, value_shapes = inputs[:4]
        value_mask = inputs[4] if len(inputs) > 4 else None
        B, Q = query.shape[:2]
        len_v = value.shape[1]
        value = self._apply("value_proj", params, state, value, ctx, path)
        if value_mask is not None:
            value = jnp.where(value_mask[..., None], value, 0.0)
        value = value.reshape(B, len_v, self.n_heads, self.d_model // self.n_heads)
        off = self._apply("sampling_offsets", params, state, query, ctx, path).reshape(
            B, Q, self.n_heads, self.n_levels, self.n_points, 2
        )
        aw = self._apply("attention_weights", params, state, query, ctx, path).reshape(
            B, Q, self.n_heads, self.n_levels * self.n_points
        )
        aw = jax.nn.softmax(aw, -1).reshape(B, Q, self.n_heads, self.n_levels, self.n_points)
        num_points = refer_bbox.shape[-1]
        if num_points == 2:
            norm = jnp.asarray([[w, h] for (h, w) in value_shapes], jnp.float32)  # flip(-1)
            add = off / norm[None, None, None, :, None, :]
            loc = refer_bbox[:, :, None, :, None, :] + add
        elif num_points == 4:
            add = off / self.n_points * refer_bbox[:, :, None, :, None, 2:] * 0.5
            loc = refer_bbox[:, :, None, :, None, :2] + add
        else:
            raise ValueError(f"refer_bbox last dim must be 2 or 4, got {num_points}")
        out = multi_scale_deformable_attn(value, value_shapes, loc, aw)
        return self._apply("output_proj", params, state, out, ctx, path)


class DeformableTransformerDecoderLayer(_Composite):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:310-371)."""

    def __init__(self, d_model=256, n_heads=8, d_ffn=1024, dropout=0.0, n_levels=4, n_points=4):
        self.sub = {
            "self_attn": MultiheadAttention(d_model, n_heads),
            "norm1": LayerNorm(d_model),
            "cross_attn": MSDeformAttn(d_model, n_levels, n_heads, n_points),
            "norm2": LayerNorm(d_model),
            "linear1": Linear(d_model, d_ffn),
            "linear2": Linear(d_ffn, d_model),
            "norm3": LayerNorm(d_model),
        }

    def __call__(self, params, state, inputs, ctx, path=()):
        embed, refer_bbox, feats, shapes = inputs[:4]
        padding_mask = inputs[4] if len(inputs) > 4 else None
        query_pos = inputs[5] if len(inputs) > 5 else None

        q = embed if query_pos is None else embed + query_pos
        tgt = self.sub["self_attn"](params["self_attn"], state.get("self_attn", {}), (q, q, embed), ctx,
                                    path + ("self_attn",))
        embed = self._apply("norm1", params, state, embed + tgt, ctx, path)

        qc = embed if query_pos is None else embed + query_pos
        tgt = self.sub["cross_attn"](
            params["cross_attn"], state.get("cross_attn", {}),
            (qc, refer_bbox[:, :, None], feats, shapes, padding_mask), ctx, path + ("cross_attn",)
        )
        embed = self._apply("norm2", params, state, embed + tgt, ctx, path)

        t = jax.nn.relu(self._apply("linear1", params, state, embed, ctx, path))
        t = self._apply("linear2", params, state, t, ctx, path)
        return self._apply("norm3", params, state, embed + t, ctx, path)


class DeformableTransformerDecoder(Module):
    """Iterative box-refinement decoder (reference transformer.py:372-425)."""

    def __init__(self, hidden_dim, decoder_layer_fn, num_layers, eval_idx=-1):
        self.layers = [decoder_layer_fn() for _ in range(num_layers)]
        self.num_layers = num_layers
        self.hidden_dim = hidden_dim
        self.eval_idx = eval_idx if eval_idx >= 0 else num_layers + eval_idx

    def init(self, key):
        params, state = {}, {}
        for i, l in enumerate(self.layers):
            params[str(i)], state[str(i)] = l.init(key)
        return {"layers": params}, {"layers": state}

    def __call__(self, params, state, inputs, ctx, path=(), bbox_heads=None, score_heads=None, pos_mlp=None,
                 train: bool = False):
        embed, refer_bbox, feats, shapes = inputs[:4]
        refer_bbox = jax.nn.sigmoid(refer_bbox)
        dec_bboxes, dec_cls = [], []
        last_refined = None
        out = embed
        lp, ls = params["layers"], state["layers"]
        for i, layer in enumerate(self.layers):
            qp = pos_mlp(refer_bbox) if pos_mlp is not None else None
            out = layer(lp[str(i)], ls.get(str(i), {}), (out, refer_bbox, feats, shapes, None, qp), ctx,
                        path + ("layers", str(i)))
            bbox = bbox_heads[i](out)
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer_bbox))
            if train:
                dec_cls.append(score_heads[i](out))
                dec_bboxes.append(refined if i == 0 else jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined)))
            elif i == self.eval_idx:
                dec_cls.append(score_heads[i](out))
                dec_bboxes.append(refined)
                break
            last_refined = refined
            refer_bbox = jax.lax.stop_gradient(refined) if train else refined
        return jnp.stack(dec_bboxes), jnp.stack(dec_cls)
