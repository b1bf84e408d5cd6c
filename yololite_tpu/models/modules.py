"""Functional JAX/TPU modules for the YOLO11 family.

Design: every module is a lightweight Python object built once at graph-construction
time. Parameters and batch-norm running statistics live in separate nested-dict
pytrees whose keys mirror the reference's torch submodule names (cv1, m.0, bn, ...)
so checkpoint import is a mechanical walk
(cf. /root/reference/yololite/nn/modules/{conv,block,head}.py for behavior parity).

All activations are NHWC (TPU-native layout); conv weights are HWIO.
Apply signature: module(params, state, x, ctx) -> y. `ctx.train` selects
batch-stat normalization; BN running-stat updates are recorded in
`ctx.updates[path]` as {'mean': ..., 'var': ...} for the trainer to merge.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # reference sets BatchNorm2d eps=1e-3 (torch_utils.py:249)
BN_MOMENTUM = 0.03  # and momentum=0.03 (torch_utils.py:250)


class Ctx:
    """Per-forward context: train flag, BN stat collector, optional feature taps."""

    def __init__(self, train: bool = False, capture: Optional[Sequence[int]] = None,
                 calibrate: bool = False):
        self.train = train
        self.updates: Dict[Tuple[str, ...], Dict[str, jnp.ndarray]] = {}
        self.capture = set(capture or ())  # layer indices whose outputs to record
        self.features: Dict[int, jnp.ndarray] = {}
        self.calibrate = calibrate  # int8 calibration: record per-conv activation absmax
        self.act_absmax: Dict[Tuple[str, ...], jnp.ndarray] = {}


def autopad(k, p=None, d: int = 1):
    """'same'-shape padding, int or (kh, kw) (reference conv.py:26-32)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else tuple(d * (x - 1) + 1 for x in k)
    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    return p


class KeyGen:
    """Host-side deterministic init RNG (numpy; avoids per-module device dispatch)."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)


def _kaiming_uniform(kg: "KeyGen", shape, fan_in):
    """Torch nn.Conv2d default init: kaiming_uniform with a=sqrt(5) -> U(-b, b), b=1/sqrt(fan_in)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jnp.asarray(kg.rng.uniform(-bound, bound, size=shape), dtype=jnp.float32)


def conv2d(x, w, stride=1, padding=0, groups=1, dilation=1, pet=None):
    """NHWC conv with HWIO weights; stride/padding/dilation may be int or (h, w).

    Dtype-polymorphic: weights follow the activation dtype (bf16 activations with
    fp32 master weights = mixed-precision training; the cast is differentiable so
    gradients land on the fp32 leaves). `pet` sets preferred_element_type for the
    accumulator (int32 for the int8 serving path); weights are not cast then.
    """
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    return jax.lax.conv_general_dilated(
        x,
        w if pet is not None else w.astype(x.dtype),
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=pet,
    )


def quantize_act(x, scale):
    """bf16/f32 activations -> int8 at the given scale (symmetric, saturating)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


def dequantize_act(x, scale, dtype=jnp.bfloat16):
    """int8 activations -> float at the given scale."""
    return (x.astype(jnp.float32) * scale).astype(dtype)


def batchnorm(params, state, x, ctx: Ctx, path):
    """BatchNorm2d over NHWC with torch semantics (running stats, unbiased var).

    Statistics always accumulate in fp32 (torch autocast keeps BN fp32). With
    fp32 activations the normalization matches torch bit-for-bit. With bf16
    activations the per-channel affine constants are folded to bf16 and the
    normalize runs in the activation dtype: the (B,H,W,C) tensor is never
    materialized in fp32, halving BN's HBM traffic on the amp path (the fp32
    reduction fuses into the bf16 read).
    """
    if ctx.train:
        if x.dtype == jnp.float32:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))  # two-pass: torch-exact on the fp32 path
        else:
            mean = jnp.mean(x, axis=(0, 1, 2), dtype=jnp.float32)
            var = jnp.mean(x.astype(jnp.float32) ** 2, axis=(0, 1, 2)) - mean**2
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        ctx.updates[path] = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"].astype(jnp.float32), state["var"].astype(jnp.float32)
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32) - mean * inv
    if x.dtype == jnp.float32:
        return x * inv + bias
    return x * inv.astype(x.dtype) + bias.astype(x.dtype)


class Module:
    """Base: subclasses define init(key)->(params, state) and __call__(p, s, x, ctx, path).

    `downsample` is the module's spatial reduction factor (output = input / downsample),
    consumed by parse_spec to derive Detect strides statically (the reference instead
    probes with a dummy forward, nn/tasks.py:256-267). Modules that change spatial
    size must set it; <1 means upsampling.
    """

    downsample = 1

    def init(self, key):
        raise NotImplementedError

    def __call__(self, params, state, x, ctx, path=()):
        raise NotImplementedError


class Conv(Module):
    """Conv2d(bias=False) + BatchNorm2d + SiLU (reference conv.py:35-53)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, d=1, act=True):
        if isinstance(k, (tuple, list)) and k[0] == k[1]:
            k = k[0]
        self.c1, self.c2, self.k, self.s, self.g, self.d = c1, c2, k, s, g, d
        self.kh, self.kw = (k, k) if isinstance(k, int) else tuple(k)
        self.p = autopad(k, p, d)
        self.act = act  # True -> SiLU, 'relu' -> ReLU, False -> identity
        self.downsample = s if isinstance(s, int) else int(s[0])

    def init(self, key):
        fan_in = self.c1 // self.g * self.kh * self.kw
        w = _kaiming_uniform(key, (self.kh, self.kw, self.c1 // self.g, self.c2), fan_in)
        params = {
            "conv": {"w": w},
            "bn": {"scale": jnp.ones(self.c2), "bias": jnp.zeros(self.c2)},
        }
        state = {"bn": {"mean": jnp.zeros(self.c2), "var": jnp.ones(self.c2)}}
        return params, state

    def _act(self, y):
        if self.act is True:
            return jax.nn.silu(y)
        if self.act == "relu":
            return jax.nn.relu(y)
        return y

    def __call__(self, params, state, x, ctx, path=()):
        q = params.get("q") if isinstance(params, dict) else None
        if q is not None:  # int8 serving path (weights pre-quantized by models.quant)
            if x.dtype != jnp.int8:  # bf16 island boundary: quantize on the fly
                x = quantize_act(x, q["sin"])
            acc = conv2d(x, q["w"], self.s, self.p, self.g, self.d, pet=jnp.int32)
            y = acc.astype(jnp.float32) * (q["sin"] * q["sw"]) + params["conv"]["b"]
            y = self._act(y.astype(jnp.bfloat16))
            if "sout" in q:  # consumer is a quantized conv: keep the edge int8
                y = quantize_act(y, q["sout"])
            return y
        if x.dtype == jnp.int8:  # int8 edge into an unquantized conv: dequantize
            x = dequantize_act(x, params["deq_s"])
        y = conv2d(x, params["conv"]["w"], self.s, self.p, self.g, self.d)
        if "bn" in params:
            y = batchnorm(params["bn"], state["bn"], y, ctx, path + ("bn",))
        else:  # BN folded into the conv at fuse time (reference torch_utils.py:182-209)
            y = y + params["conv"]["b"].astype(y.dtype)
        y = self._act(y)
        if getattr(ctx, "calibrate", False):  # record post-activation absmax
            ctx.act_absmax[path] = jnp.max(jnp.abs(y.astype(jnp.float32)))
        return y

    @staticmethod
    def fuse(params, state):
        """Fold BN into conv weights; returns fused params {'conv': {'w', 'b'}}."""
        scale, bias = params["bn"]["scale"], params["bn"]["bias"]
        mean, var = state["bn"]["mean"], state["bn"]["var"]
        g = scale / jnp.sqrt(var + BN_EPS)
        w = params["conv"]["w"] * g[None, None, None, :]
        b = bias - mean * g
        return {"conv": {"w": w, "b": b}}


def fuse_tree(params: Dict, state: Dict):
    """Recursively fold every Conv+BN pair in a params/state tree for inference.

    Matches subtrees shaped {'conv': {'w'}, 'bn': {...}} with running stats in the
    aligned state subtree; other BN uses (standalone BN, ConvTranspose) are left
    unfused. Returns (fused_params, fused_state).
    """
    if not isinstance(params, dict):
        return params, state
    if "conv" in params and "bn" in params and isinstance(params["conv"], dict) and "w" in params["conv"]:
        if "cv2" in params:  # Conv2: fold the parallel 1x1 into the kxk center tap first
            w = params["conv"]["w"]
            kh, kw = w.shape[0], w.shape[1]
            w = w.at[kh // 2, kw // 2].add(params["cv2"]["w"][0, 0])
            params = {"conv": {"w": w}, "bn": params["bn"]}
        return Conv.fuse(params, state), {}
    new_p, new_s = {}, {}
    for k, v in params.items():
        sv = state.get(k, {}) if isinstance(state, dict) else {}
        fp, fs = fuse_tree(v, sv)
        new_p[k] = fp
        if fs or (isinstance(state, dict) and k in state and not isinstance(v, dict)):
            new_s[k] = fs
    # keep state leaves with no params counterpart (e.g. standalone bn nodes)
    if isinstance(state, dict):
        for k, v in state.items():
            if k not in new_p and k not in new_s:
                new_s[k] = v
            elif k in new_p and k not in new_s and not isinstance(params.get(k), dict):
                new_s[k] = v
    return new_p, new_s


# NOTE: the space-to-depth stem machinery (fold_stem_s2d/fold_stem_s4d weight
# folds, stem_s2d_apply/stem_s4d_apply relayout paths, and a fused two-conv
# Pallas stem kernel) lived here through rounds 2-4. All variants were
# exactness-tested and measured SLOWER than the plain XLA stem on v5e
# (s2d 0.90x / s4d 0.92x e2e; fused kernel 13.7 vs 2.7 ms/batch at bs=128 --
# MXU lane padding dominates the 48/64-wide contractions). Removed per the
# flip-or-delete rule; numbers in docs/PERF.md round 4 + docs/r4_queue1_results.log.


class Conv2d(Module):
    """Plain Conv2d with optional bias (used as the final 1x1 in Detect branches)."""

    def __init__(self, c1, c2, k=1, s=1, p=0, g=1, bias=True):
        self.c1, self.c2, self.k, self.s, self.p, self.g = c1, c2, k, s, p, g
        self.has_bias = bias

    def init(self, key):
        fan_in = self.c1 // self.g * self.k * self.k
        params = {"w": _kaiming_uniform(key, (self.k, self.k, self.c1 // self.g, self.c2), fan_in)}
        if self.has_bias:
            params["b"] = _kaiming_uniform(key, (self.c2,), fan_in)
        return params, {}

    def __call__(self, params, state, x, ctx, path=()):
        y = conv2d(x, params["w"], self.s, self.p, self.g)
        return y + params["b"].astype(x.dtype) if self.has_bias else y


class DWConv(Conv):
    """Depthwise conv: groups = gcd(c1, c2) (reference conv.py:100-106)."""

    def __init__(self, c1, c2, k=1, s=1, d=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), d=d, act=act)


class Seq(Module):
    """Sequential container with torch-style numeric child keys '0', '1', ..."""

    def __init__(self, *mods):
        self.mods = list(mods)
        ds = 1
        for m in self.mods:
            ds *= getattr(m, "downsample", 1)
        self.downsample = ds

    def init(self, key):
        params, state = {}, {}
        for i, m in enumerate(self.mods):
            params[str(i)], state[str(i)] = m.init(key)
        return params, state

    def __call__(self, params, state, x, ctx, path=()):
        for i, m in enumerate(self.mods):
            x = m(params.get(str(i), {}), state.get(str(i), {}), x, ctx, path + (str(i),))
        return x


class _Composite(Module):
    """Helper: named children declared in self.sub = {'cv1': mod, ...}."""

    sub: Dict[str, Module]

    def init(self, key):
        params, state = {}, {}
        for name, m in self.sub.items():
            params[name], state[name] = m.init(key)
        return params, state

    def _apply(self, name, params, state, x, ctx, path):
        return self.sub[name](params.get(name, {}), state.get(name, {}), x, ctx, path + (name,))


class Bottleneck(_Composite):
    """Standard bottleneck: cv1 -> cv2 (+ residual) (reference block.py:330-352)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        c_ = int(c2 * e)
        self.sub = {"cv1": Conv(c1, c_, k[0], 1), "cv2": Conv(c_, c2, k[1], 1, g=g)}
        self.add = shortcut and c1 == c2

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv2", params, state, self._apply("cv1", params, state, x, ctx, path), ctx, path)
        if not self.add:
            return y
        if x.dtype == jnp.int8:  # int8 serving: both edges share the global scale
            return jnp.clip(x.astype(jnp.int16) + y.astype(jnp.int16), -127, 127).astype(jnp.int8)
        return x + y


class C3(_Composite):
    """CSP with 3 convs (reference block.py:245-264)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, bottleneck_k=((1, 1), (3, 3))):
        c_ = int(c2 * e)
        self.sub = {
            "cv1": Conv(c1, c_, 1, 1),
            "cv2": Conv(c1, c_, 1, 1),
            "cv3": Conv(2 * c_, c2, 1),
            "m": Seq(*(Bottleneck(c_, c_, shortcut, g, k=bottleneck_k, e=1.0) for _ in range(n))),
        }

    def __call__(self, params, state, x, ctx, path=()):
        a = self._apply("m", params, state, self._apply("cv1", params, state, x, ctx, path), ctx, path)
        b = self._apply("cv2", params, state, x, ctx, path)
        return self._apply("cv3", params, state, jnp.concatenate([a, b], axis=-1), ctx, path)


class C3k(C3):
    """C3 with square-k bottlenecks (reference block.py:731-740)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e, bottleneck_k=((k, k), (k, k)))


class ModList(Module):
    """List of modules applied one-at-a-time by the parent (torch nn.ModuleList)."""

    def __init__(self, mods):
        self.mods = list(mods)

    def init(self, key):
        params, state = {}, {}
        for i, m in enumerate(self.mods):
            params[str(i)], state[str(i)] = m.init(key)
        return params, state

    def apply_i(self, i, params, state, x, ctx, path):
        return self.mods[i](params.get(str(i), {}), state.get(str(i), {}), x, ctx, path + (str(i),))


class C2f(_Composite):
    """Split-and-grow CSP block (reference block.py:220-243)."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.n = n
        self.sub = {
            "cv1": Conv(c1, 2 * self.c, 1, 1),
            "cv2": Conv((2 + n) * self.c, c2, 1),
            "m": ModList([Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n)]),
        }

    def __call__(self, params, state, x, ctx, path=()):
        y0 = self._apply("cv1", params, state, x, ctx, path)
        ys = [y0[..., : self.c], y0[..., self.c :]]
        ml: ModList = self.sub["m"]
        for i in range(self.n):
            ys.append(ml.apply_i(i, params["m"], state.get("m", {}), ys[-1], ctx, path + ("m",)))
        return self._apply("cv2", params, state, jnp.concatenate(ys, axis=-1), ctx, path)


class C3k2(C2f):
    """C2f whose inner blocks are C3k or Bottleneck (reference block.py:720-729)."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.sub["m"] = ModList(
            [
                C3k(self.c, self.c, 2, shortcut, g) if c3k else Bottleneck(self.c, self.c, shortcut, g)
                for _ in range(n)
            ]
        )


class SPPF(_Composite):
    """Spatial pyramid pooling - fast (reference block.py:165-184)."""

    def __init__(self, c1, c2, k=5):
        c_ = c1 // 2
        self.k = k
        self.sub = {"cv1": Conv(c1, c_, 1, 1), "cv2": Conv(c_ * 4, c2, 1, 1)}

    def _pool(self, x):
        p = self.k // 2
        # Float init must be a PYTHON scalar: a jnp.array constant breaks
        # reduce_window's linearization under jit(grad(...)) on jax 0.9
        # ("Linearization failed to produce known values for all output primals").
        # Int pooling (quantized serving) is never differentiated, and its init
        # must carry the exact operand dtype.
        if jnp.issubdtype(x.dtype, jnp.floating):
            init = -jnp.inf
        else:
            init = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
        return jax.lax.reduce_window(
            x,
            init,
            jax.lax.max,
            window_dimensions=(1, self.k, self.k, 1),
            window_strides=(1, 1, 1, 1),
            padding=[(0, 0), (p, p), (p, p), (0, 0)],
        )

    def __call__(self, params, state, x, ctx, path=()):
        y = [self._apply("cv1", params, state, x, ctx, path)]
        for _ in range(3):
            y.append(self._pool(y[-1]))
        return self._apply("cv2", params, state, jnp.concatenate(y, axis=-1), ctx, path)


class Attention(_Composite):
    """Spatial MHSA with conv qkv + depthwise positional encoding (reference block.py:863-916)."""

    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.dim = dim
        self.sub = {
            "qkv": Conv(dim, h, 1, act=False),
            "proj": Conv(dim, dim, 1, act=False),
            "pe": Conv(dim, dim, 3, 1, g=dim, act=False),
        }

    def __call__(self, params, state, x, ctx, path=()):
        B, H, W, C = x.shape
        N = H * W
        qkv = self._apply("qkv", params, state, x, ctx, path)  # (B,H,W,h)
        qkv = qkv.reshape(B, N, self.num_heads, self.key_dim * 2 + self.head_dim)
        q = qkv[..., : self.key_dim]
        k = qkv[..., self.key_dim : 2 * self.key_dim]
        v = qkv[..., 2 * self.key_dim :]  # (B,N,nh,hd)
        # dtype-following attention: on the bf16 serving/amp path, keeping the
        # (B, nh, N, N) logits + softmax in bf16 halves the only O(N^2) traffic in
        # the model (measured: C2PSA 2.67 -> 1.42 ms at bs=128 on v5e); the fp32
        # path is untouched so torch-parity stays bit-comparable.
        pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=pet) * jnp.asarray(self.scale, pet)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bkhd,bhqk->bqhd", v, attn.astype(v.dtype), preferred_element_type=pet)
        out = out.astype(x.dtype).reshape(B, H, W, C)
        pe = self._apply("pe", params, state, v.reshape(B, H, W, C), ctx, path)
        return self._apply("proj", params, state, out + pe, ctx, path)


class PSABlock(_Composite):
    """Attention + conv FFN with residuals (reference block.py:919-963)."""

    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        self.add = shortcut
        self.sub = {
            "attn": Attention(c, attn_ratio=attn_ratio, num_heads=num_heads),
            "ffn": Seq(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False)),
        }

    def __call__(self, params, state, x, ctx, path=()):
        a = self._apply("attn", params, state, x, ctx, path)
        x = x + a if self.add else a
        f = self._apply("ffn", params, state, x, ctx, path)
        return x + f if self.add else f


class C2PSA(_Composite):
    """Split + stacked PSA blocks + merge (reference block.py:999-1059)."""

    def __init__(self, c1, c2, n=1, e=0.5):
        assert c1 == c2
        self.c = int(c1 * e)
        self.sub = {
            "cv1": Conv(c1, 2 * self.c, 1, 1),
            "cv2": Conv(2 * self.c, c1, 1),
            "m": Seq(*(PSABlock(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1)) for _ in range(n))),
        }

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        a, b = y[..., : self.c], y[..., self.c :]
        b = self._apply("m", params, state, b, ctx, path)
        return self._apply("cv2", params, state, jnp.concatenate([a, b], axis=-1), ctx, path)


class Concat(Module):
    """Channel concat of multiple inputs (reference conv.py:321-334)."""

    def __init__(self, dim=1):
        self.dim = dim  # torch dim 1 == NHWC axis -1

    def init(self, key):
        return {}, {}

    def __call__(self, params, state, xs, ctx, path=()):
        return jnp.concatenate(xs, axis=-1)


class Upsample(Module):
    """Nearest-neighbor 2x upsample (torch nn.Upsample(scale_factor=2, mode='nearest'))."""

    def __init__(self, size=None, scale_factor=2, mode="nearest"):
        assert mode == "nearest", "only nearest upsampling is used by YOLO11"
        self.scale = int(scale_factor)
        self.downsample = 1 / self.scale

    def init(self, key):
        return {}, {}

    def __call__(self, params, state, x, ctx, path=()):
        x = jnp.repeat(x, self.scale, axis=1)
        return jnp.repeat(x, self.scale, axis=2)


def dfl_decode(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Integral (DFL) decode: softmax over reg_max bins -> expected distance.

    box_logits: (..., 4*reg_max) channel-last with torch layout (4 groups of reg_max).
    Returns (..., 4) ltrb distances. Cf. reference block.py:51-70 (conv-with-arange trick).
    """
    shape = box_logits.shape
    x = box_logits.reshape(shape[:-1] + (4, reg_max))
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.einsum("...r,r->...", jax.nn.softmax(x, axis=-1), proj)


class Detect(Module):
    """Decoupled detect head over P3/P4/P5 (reference head.py:16-167).

    __call__ returns the raw per-level maps (B, H, W, 4*reg_max + nc); decoding to
    boxes happens in `yololite_tpu.ops.decode` so that train/val/predict paths share
    one jittable graph without branching on mode.

    end2end=True adds the NMS-free one-to-one branch pair (reference
    head.py:55-57,71-93 forward_end2end): structurally identical reg/cls
    branches run on gradient-detached inputs, trained with top-1 TAL
    assignment (E2EDetectLoss) so each gt claims exactly one anchor and
    inference needs only a top-k select, no suppression. __call__ then
    returns {"one2many": [maps], "one2one": [maps]} (a pytree, so the jitted
    train/predict graphs stay mode-free).
    """

    def __init__(self, nc=80, ch=(), end2end: bool = False):
        self.nc = nc
        self.nl = len(ch)
        self.reg_max = 16
        self.no = nc + self.reg_max * 4
        self.stride = [8, 16, 32][: self.nl]  # filled properly by the graph builder
        self.end2end = bool(end2end)
        self.max_det = 300  # reference head.py:23 (one2one top-k pool)
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.c2ch, self.c3ch = c2, c3

        def _branches():
            return (
                ModList([Seq(Conv(x, c2, 3), Conv(c2, c2, 3), Conv2d(c2, 4 * self.reg_max, 1)) for x in ch]),
                ModList(
                    [
                        Seq(
                            Seq(DWConv(x, x, 3), Conv(x, c3, 1)),
                            Seq(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                            Conv2d(c3, nc, 1),
                        )
                        for x in ch
                    ]
                ),
            )

        cv2, cv3 = _branches()
        self.sub = {"cv2": cv2, "cv3": cv3}
        if self.end2end:  # structural deepcopy of the branch pair (head.py:55-57)
            o2, o3 = _branches()
            self.sub["one2one_cv2"] = o2
            self.sub["one2one_cv3"] = o3

    def init(self, key):
        params, state = {}, {}
        for k in self.sub:
            params[k], state[k] = self.sub[k].init(key)
        return params, state

    def bias_init(self, params):
        """Prior-aware bias init (reference head.py:128-139); returns updated params.

        In end2end mode the one2one branch pair gets the same priors
        (head.py:136-139)."""
        params = dict(params)
        pairs = [("cv2", "cv3")]
        if self.end2end and "one2one_cv2" in params:
            pairs.append(("one2one_cv2", "one2one_cv3"))
        for bk, ck in pairs:
            for i, s in enumerate(self.stride):
                box_seq = dict(params[bk][str(i)])
                last = dict(box_seq["2"])
                last["b"] = jnp.ones_like(last["b"])
                box_seq["2"] = last
                cv2 = dict(params[bk])
                cv2[str(i)] = box_seq
                params[bk] = cv2

                cls_seq = dict(params[ck][str(i)])
                last = dict(cls_seq["2"])
                last["b"] = jnp.full_like(last["b"], math.log(5 / self.nc / (640 / s) ** 2))
                cls_seq["2"] = last
                cv3 = dict(params[ck])
                cv3[str(i)] = cls_seq
                params[ck] = cv3
        return params

    def _branch(self, params, state, xs, ctx, path, bk, ck):
        outs = []
        for i, x in enumerate(xs):
            box = self.sub[bk].apply_i(i, params[bk], state.get(bk, {}), x, ctx, path + (bk,))
            cls = self.sub[ck].apply_i(i, params[ck], state.get(ck, {}), x, ctx, path + (ck,))
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs

    def __call__(self, params, state, xs, ctx, path=()):
        # NOTE: a shared-input-read fold (concat cv2[i][0] with the densified
        # cv3[i][0][0] dw conv so each level's input map is read once) was
        # implemented, exactness-tested, and measured 0.949x of the default on
        # v5e (docs/r4_queue1_results.log) — the densified dw's extra MACs cost
        # more than the saved HBM read. Removed per the flip-or-delete rule.
        if self.end2end and "one2one_cv2" in params:
            # one2one sees detached features (head.py:85): its top-1 loss must
            # not fight the one2many gradients flowing into the neck
            xd = [jax.lax.stop_gradient(x) for x in xs]
            return {
                "one2many": self._branch(params, state, xs, ctx, path, "cv2", "cv3"),
                "one2one": self._branch(params, state, xd, ctx, path, "one2one_cv2", "one2one_cv3"),
            }
        return self._branch(params, state, xs, ctx, path, "cv2", "cv3")
