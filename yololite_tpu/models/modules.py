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


def fold_stem_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Fold a k3s2 stem kernel onto the 2x2 space-to-depth input layout.

    w: (3, 3, C_in, C_out) HWIO -> (2, 2, 4*C_in, C_out) for a k2s1 conv with
    asymmetric padding ((1, 0), (1, 0)) over the s2d grid of
    device_letterbox_s2d (channel layout (dy*2+dx)*C_in + c). Exact identity:
    original output row i reads input rows 2i-1..2i+1, which live in s2d
    blocks i-1 (odd row) and i (both rows) — kernel tap dy0 in {0,1,2} maps to
    (block, intra-row) = {0:(0,1), 1:(1,0), 2:(1,1)}; block position (0,0)
    never occurs and stays zero. Same math in x. Output spatial size
    (S/2 + 1) - 2 + 1 = S/2 matches the strided original.
    """
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"s2d fold expects a 3x3 kernel, got {(kh, kw)}")
    pos = {0: (0, 1), 1: (1, 0), 2: (1, 1)}  # kernel tap -> (block idx, intra-block)
    w2 = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for dy0 in range(3):
        bi, dy = pos[dy0]
        for dx0 in range(3):
            bj, dx = pos[dx0]
            ch = (dy * 2 + dx) * ci
            w2 = w2.at[bi, bj, ch:ch + ci].set(w[dy0, dx0])
    return w2


def fold_stem_s4d(w: jnp.ndarray) -> jnp.ndarray:
    """Fold a k3s2 stem kernel into s4d-in / s2d-out form.

    w: (3, 3, C, O) HWIO -> (2, 2, 16*C, 4*O) for a k2s1 conv with padding
    ((1, 0), (1, 0)) over the 4x4 space-to-depth grid (s2d applied twice:
    input channel ((dy2*2+dx2)*4 + (dy1*2+dx1))*C + c holds original pixel
    (4i + 2*dy2 + dy1, 4j + 2*dx2 + dx1); output channel (dy*2+dx)*O + o holds
    conv-output pixel (2i+dy, 2j+dx), i.e. the s2d layout fold_stem_s2d's
    consumer expects). Derivation: s2d-output row (i, dy) = conv row 2i+dy
    reads original rows 4i+2dy-1..4i+2dy+1; with input block row i-1+bi
    holding rows 4(i-1+bi)+ry, the kernel tap is t = 4*bi - 4 + ry - 2*dy,
    kept only when t is in {-1, 0, 1} (zero otherwise). Exact identity.
    """
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"s4d fold expects a 3x3 kernel, got {(kh, kw)}")
    w4 = jnp.zeros((2, 2, 16 * ci, 4 * co), w.dtype)  # trace-safe (static slices)
    for bi in range(2):
        for bj in range(2):
            for ry in range(4):
                for rx in range(4):
                    for dy in range(2):
                        for dx in range(2):
                            ty = 4 * bi - 4 + ry - 2 * dy
                            tx = 4 * bj - 4 + rx - 2 * dx
                            if ty in (-1, 0, 1) and tx in (-1, 0, 1):
                                cin = ((ry // 2) * 2 + rx // 2) * 4 + (ry % 2) * 2 + rx % 2
                                q = (dy * 2 + dx) * co
                                w4 = w4.at[bi, bj, cin * ci:(cin + 1) * ci,
                                           q:q + co].set(w[ty + 1, tx + 1])
    return w4


def stem_s4d_apply(conv0: "Conv", conv1: "Conv", p0: Dict, p1: Dict,
                   x_s4d: jnp.ndarray) -> jnp.ndarray:
    """Run fused layers 0+1 (both k3 s2 p1 g1 Conv) on the 4x4 s2d layout.

    x_s4d: (B, S/4, S/4, 48) from device_letterbox_s4d. Layer 0 runs in
    s4d-in/s2d-out folded form (fold_stem_s4d), SiLU applies to the permuted
    layout unchanged (elementwise), and layer 1 consumes the s2d intermediate
    via fold_stem_s2d — every conv is k2s1 with a wide (48/64-channel)
    contraction, and the (S, S, 3) / (S/2, S/2, 16) worst-tiling NHWC layouts
    never exist. Output (B, S/4, S/4, c2) equals layer 1's output exactly
    (within f32 accumulation order). Requires fused params.
    """
    w0 = fold_stem_s4d(p0["conv"]["w"])
    b0 = jnp.tile(p0["conv"]["b"], 4)
    y = jax.lax.conv_general_dilated(
        x_s4d, w0.astype(x_s4d.dtype), window_strides=(1, 1),
        padding=[(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = conv0._act(y + b0.astype(y.dtype))
    w1 = fold_stem_s2d(p1["conv"]["w"])
    z = jax.lax.conv_general_dilated(
        y, w1.astype(y.dtype), window_strides=(1, 1),
        padding=[(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return conv1._act(z + p1["conv"]["b"].astype(z.dtype))


def s4d_relayout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/4, W/4, 16*C) 4x4 space-to-depth: the layout
    fold_stem_s4d consumes (channel ((dy2*2+dx2)*4 + dy1*2+dx1)*C + c)."""
    b, hh, ww, cc = x.shape
    xs = x.reshape(b, hh // 4, 2, 2, ww // 4, 2, 2, cc)
    return xs.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, hh // 4, ww // 4, 16 * cc)


def stem_s4d_apply_pallas(conv0: "Conv", conv1: "Conv", p0: Dict, p1: Dict,
                          x_s4d: jnp.ndarray, th: int = 40, interpret=None,
                          sumtap: bool = False) -> jnp.ndarray:
    """stem_s4d_apply with both convs fused into one Pallas kernel (the conv0
    output never leaves VMEM — the only way to cut the stem's HBM traffic,
    docs/PERF.md round-4 note). SiLU is baked into the kernel, so both stem
    Convs must use the default act (true for every shipped yaml)."""
    if conv0.act is not True or conv1.act is not True:
        raise ValueError("fused stem kernel assumes SiLU activations")
    from yololite_tpu.ops.pallas_kernels import fused_stem_s4d_pallas

    w0 = fold_stem_s4d(p0["conv"]["w"])
    b0 = jnp.tile(p0["conv"]["b"], 4)
    w1 = fold_stem_s2d(p1["conv"]["w"])
    return fused_stem_s4d_pallas(x_s4d, w0, b0, w1, p1["conv"]["b"], th=th,
                                 interpret=interpret, sumtap=sumtap)


def stem_s2d_apply(conv: "Conv", params: Dict, x_s2d: jnp.ndarray) -> jnp.ndarray:
    """Run a fused layer-0 Conv (k3 s2 p1 g1) on the s2d letterbox layout.

    Equivalent (within f32 accumulation order) to conv(params, x) on the full
    (S, S, 3) image; requires fused params ({'conv': {'w', 'b'}}). The small
    weight fold runs per call (9 tiny scatters; XLA hoists it off the hot path).
    """
    w2 = fold_stem_s2d(params["conv"]["w"])
    y = jax.lax.conv_general_dilated(
        x_s2d, w2.astype(x_s2d.dtype), window_strides=(1, 1),
        padding=[(1, 0), (1, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + params["conv"]["b"].astype(y.dtype)
    return conv._act(y)


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
    """

    def __init__(self, nc=80, ch=()):
        self.nc = nc
        self.nl = len(ch)
        self.reg_max = 16
        self.no = nc + self.reg_max * 4
        self.stride = [8, 16, 32][: self.nl]  # filled properly by the graph builder
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.c2ch, self.c3ch = c2, c3
        self.sub = {
            "cv2": ModList(
                [Seq(Conv(x, c2, 3), Conv(c2, c2, 3), Conv2d(c2, 4 * self.reg_max, 1)) for x in ch]
            ),
            "cv3": ModList(
                [
                    Seq(
                        Seq(DWConv(x, x, 3), Conv(x, c3, 1)),
                        Seq(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                        Conv2d(c3, nc, 1),
                    )
                    for x in ch
                ]
            ),
        }

    def init(self, key):
        params, state = {}, {}
        params["cv2"], state["cv2"] = self.sub["cv2"].init(key)
        params["cv3"], state["cv3"] = self.sub["cv3"].init(key)
        return params, state

    def bias_init(self, params):
        """Prior-aware bias init (reference head.py:128-139); returns updated params."""
        params = dict(params)
        for i, s in enumerate(self.stride):
            box_seq = dict(params["cv2"][str(i)])
            last = dict(box_seq["2"])
            last["b"] = jnp.ones_like(last["b"])
            box_seq["2"] = last
            cv2 = dict(params["cv2"])
            cv2[str(i)] = box_seq
            params["cv2"] = cv2

            cls_seq = dict(params["cv3"][str(i)])
            last = dict(cls_seq["2"])
            last["b"] = jnp.full_like(last["b"], math.log(5 / self.nc / (640 / s) ** 2))
            cls_seq["2"] = last
            cv3 = dict(params["cv3"])
            cv3[str(i)] = cls_seq
            params["cv3"] = cv3
        return params

    def fold_input_convs(self, params):
        """Concat each level's first reg conv (cv2[i][0], dense 3x3) with the
        DENSIFIED first cls conv (cv3[i][0][0], depthwise 3x3) into one dense
        3x3 producing c2+ci channels, so the level's input feature map is read
        from HBM once instead of twice (docs/PERF.md round-4 note; the
        reference head.py:29-44 keeps two separate branch reads).

        Requires BN-folded params (fuse_tree). Exact up to f32 accumulation
        order (the densified kernel is zero off its diagonal, but the dense
        GEMM may sum the surviving products in a different order than the
        grouped conv — same class of noise as the stem folds). Returns new params
        with a 'fin' node per level consumed by __call__; the original cv2/cv3
        level-0 conv params stay in place (dead weight, ~0.3% of the model) so
        state_dict export and re-folding stay trivially correct.
        """
        fin = {}
        for i in range(self.nl):
            c2node = params["cv2"][str(i)]["0"]
            dwnode = params["cv3"][str(i)]["0"]["0"]
            if "bn" in c2node or "bn" in dwnode:
                raise ValueError("fold_input_convs requires BN-folded params (run fuse_tree first)")
            w2, b2 = c2node["conv"]["w"], c2node["conv"]["b"]
            wd, bd = dwnode["conv"]["w"], dwnode["conv"]["b"]
            ci = w2.shape[2]
            if wd.shape != (3, 3, 1, ci) or w2.shape[:2] != (3, 3):
                raise ValueError(f"unexpected Detect level-{i} input conv shapes: {w2.shape}, {wd.shape}")
            idx = jnp.arange(ci)
            dense = jnp.zeros((3, 3, ci, ci), wd.dtype).at[:, :, idx, idx].set(wd[:, :, 0, :])
            fin[str(i)] = {
                "w": jnp.concatenate([w2, dense], axis=-1),
                "b": jnp.concatenate([b2, bd], axis=-1),
            }
        return {**params, "fin": fin}

    @staticmethod
    def _seq_tail(seq, params, state, x, ctx, path, start):
        """Apply a Seq's children from index `start` (the fin path consumed child 0)."""
        for j in range(start, len(seq.mods)):
            sj = str(j)
            x = seq.mods[j](params.get(sj, {}), state.get(sj, {}), x, ctx, path + (sj,))
        return x

    def __call__(self, params, state, xs, ctx, path=()):
        outs = []
        fin = params.get("fin") if isinstance(params, dict) else None
        for i, x in enumerate(xs):
            if fin is not None:
                f = fin[str(i)]
                y = jax.nn.silu(conv2d(x, f["w"], 1, 1) + f["b"].astype(x.dtype))
                box_in, cls_in = y[..., : self.c2ch], y[..., self.c2ch :]
                si = str(i)
                p2i = params["cv2"][si]
                s2i = state.get("cv2", {}).get(si, {})
                box = self._seq_tail(self.sub["cv2"].mods[i], p2i, s2i, box_in, ctx,
                                     path + ("cv2", si), 1)
                p3i = params["cv3"][si]
                s3i = state.get("cv3", {}).get(si, {})
                inner = self.sub["cv3"].mods[i].mods[0]  # Seq(DWConv, Conv 1x1)
                t = inner.mods[1](p3i["0"].get("1", {}), s3i.get("0", {}).get("1", {}),
                                  cls_in, ctx, path + ("cv3", si, "0", "1"))
                cls = self._seq_tail(self.sub["cv3"].mods[i], p3i, s3i, t, ctx,
                                     path + ("cv3", si), 1)
            else:
                box = self.sub["cv2"].apply_i(i, params["cv2"], state.get("cv2", {}), x, ctx, path + ("cv2",))
                cls = self.sub["cv3"].apply_i(i, params["cv3"], state.get("cv3", {}), x, ctx, path + ("cv3",))
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs
