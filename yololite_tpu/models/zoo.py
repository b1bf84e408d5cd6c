"""Extended module zoo: every block `parse_model` can instantiate beyond the
YOLO11 path (reference nn/modules/block.py + conv.py "unused zoo", SURVEY.md §2 #35):
C1/C2/C3x/C3TR/C3Ghost/RepC3/BottleneckCSP, Ghost convs, HGNet stem/blocks,
ResNet layers, YOLOv9 ELAN/ADown/AConv/SPPELAN/CBLinear/CBFuse, YOLOv10
CIB/C2fCIB/RepVGGDW/PSA/C2fPSA/SCDown, attention CBAM pieces, Focus, Proto.

All NHWC functional modules following the same params/state contract as
models.modules. Structural param names mirror the torch originals so the .pt
importer works for any of these blocks.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from yololite_tpu.models.modules import (
    Attention,
    BN_EPS,
    Bottleneck,
    C2f,
    C3,
    Conv,
    Conv2d,
    DWConv,
    ModList,
    Module,
    PSABlock,
    Seq,
    _Composite,
    autopad,
    batchnorm,
    conv2d,
)


def _maxpool(x, k, s=1, p=0, ceil=False):
    pads = [(0, 0), (p, p), (p, p), (0, 0)]
    if ceil:  # torch ceil_mode: extra one-sided pad so the last window fits
        h, w = x.shape[1], x.shape[2]
        eh = -(-(h + 2 * p - k) // s) * s - (h + 2 * p - k)
        ew = -(-(w + 2 * p - k) // s) * s - (w + 2 * p - k)
        pads = [(0, 0), (p, p + eh), (p, p + ew), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads
    )


def _avgpool2(x):
    """F.avg_pool2d(x, 2, 1, 0, ceil_mode=False, count_include_pad=True)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), [(0, 0)] * 4)
    return s / 4.0


class MaxPool(Module):
    def __init__(self, k, s=1, p=0, ceil=False):
        self.k, self.s, self.p, self.ceil = k, s, p, ceil
        self.downsample = s

    def init(self, key):
        return {}, {}

    def __call__(self, params, state, x, ctx, path=()):
        return _maxpool(x, self.k, self.s, self.p, self.ceil)


class Identity(Module):
    def init(self, key):
        return {}, {}

    def __call__(self, params, state, x, ctx, path=()):
        return x


class Focus(_Composite):
    """Space-to-depth stem: 2x pixel-unshuffle then conv (reference conv.py:136-152)."""

    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        self.sub = {"conv": Conv(c1 * 4, c2, k, s, p, g, act=act)}
        self.downsample = 2 * s

    def __call__(self, params, state, x, ctx, path=()):
        a = x[:, ::2, ::2]
        b = x[:, 1::2, ::2]
        c = x[:, ::2, 1::2]
        d = x[:, 1::2, 1::2]
        return self._apply("conv", params, state, jnp.concatenate([a, b, c, d], -1), ctx, path)


class GhostConv(_Composite):
    """Primary + cheap depthwise conv concat (reference conv.py:155-169)."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        c_ = c2 // 2
        self.sub = {"cv1": Conv(c1, c_, k, s, None, g, act=act), "cv2": Conv(c_, c_, 5, 1, None, c_, act=act)}
        self.downsample = s

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        return jnp.concatenate([y, self._apply("cv2", params, state, y, ctx, path)], -1)


class GhostBottleneck(_Composite):
    """Ghost bottleneck w/ optional stride-2 depthwise (reference block.py:309-328)."""

    def __init__(self, c1, c2, k=3, s=1):
        c_ = c2 // 2
        self.s = s
        self.downsample = s
        conv = [GhostConv(c1, c_, 1, 1)]
        if s == 2:
            conv.append(DWConv(c_, c_, k, s, act=False))
        else:
            conv.append(Identity())
        conv.append(GhostConv(c_, c2, 1, 1, act=False))
        self.sub = {"conv": Seq(*conv)}
        if s == 2:
            self.sub["shortcut"] = Seq(DWConv(c1, c1, k, s, act=False), Conv(c1, c2, 1, 1, act=False))
        else:
            self.sub["shortcut"] = Identity()

    def __call__(self, params, state, x, ctx, path=()):
        return self._apply("conv", params, state, x, ctx, path) + self._apply("shortcut", params, state, x, ctx, path)


class LightConv(_Composite):
    """1x1 conv (no act) + depthwise (reference conv.py:83-97)."""

    def __init__(self, c1, c2, k=1, act="relu"):
        self.sub = {"conv1": Conv(c1, c2, 1, act=False), "conv2": DWConv(c2, c2, k, act=act)}

    def __call__(self, params, state, x, ctx, path=()):
        return self._apply("conv2", params, state, self._apply("conv1", params, state, x, ctx, path), ctx, path)


def conv_transpose2d(x, wt, stride, k, p):
    """Torch-equivalent transposed conv: fractionally-strided forward conv.

    wt layout: spatially-flipped HWIO (kh, kw, c_in, c_out); pad = k - 1 - p.
    Verified elementwise-equal to torch nn.ConvTranspose2d.
    """
    pad = k - 1 - p
    return jax.lax.conv_general_dilated(
        x, wt, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvTranspose2d(Module):
    """Plain transposed conv with bias (params: wt flipped-HWIO, b)."""

    def __init__(self, c1, c2, k=2, s=2, p=0, bias=True):
        self.c1, self.c2, self.k, self.s, self.p = c1, c2, k, s, p
        self.has_bias = bias
        self.downsample = 1 / s

    def init(self, key):
        from yololite_tpu.models.modules import _kaiming_uniform

        fan_in = self.c2 * self.k * self.k  # torch ConvTranspose fan_in counts c_out side
        params = {"wt": _kaiming_uniform(key, (self.k, self.k, self.c1, self.c2), fan_in)}
        if self.has_bias:
            params["b"] = jnp.zeros(self.c2)
        return params, {}

    def __call__(self, params, state, x, ctx, path=()):
        y = conv_transpose2d(x, params["wt"].astype(x.dtype), self.s, self.k, self.p)
        return y + params["b"].astype(x.dtype) if self.has_bias else y


class ConvTranspose(_Composite):
    """ConvTranspose2d + BN + SiLU (reference conv.py:115-134)."""

    def __init__(self, c1, c2, k=2, s=2, p=0, bn=True, act=True):
        self.has_bn = bn
        self.act = act
        self.c2 = c2
        self.sub = {"conv_transpose": ConvTranspose2d(c1, c2, k, s, p, bias=not bn)}
        self.downsample = 1 / s

    def init(self, key):
        params, state = _Composite.init(self, key)
        if self.has_bn:
            params["bn"] = {"scale": jnp.ones(self.c2), "bias": jnp.zeros(self.c2)}
            state["bn"] = {"mean": jnp.zeros(self.c2), "var": jnp.ones(self.c2)}
        return params, state

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("conv_transpose", params, state, x, ctx, path)
        if self.has_bn:
            y = batchnorm(params["bn"], state["bn"], y, ctx, path + ("bn",))
        return jax.nn.silu(y) if self.act is True else y


class ChannelAttention(_Composite):
    """Global-pool squeeze-excite gate (reference conv.py:262-276)."""

    def __init__(self, channels):
        self.sub = {"fc": Conv2d(channels, channels, 1)}

    def __call__(self, params, state, x, ctx, path=()):
        g = x.mean(axis=(1, 2), keepdims=True)
        return x * jax.nn.sigmoid(self._apply("fc", params, state, g, ctx, path))


class SpatialAttention(_Composite):
    """Mean/max-channel conv gate (reference conv.py:279-293)."""

    def __init__(self, kernel_size=7):
        assert kernel_size in (3, 7)
        self.k = kernel_size
        self.sub = {}

    def init(self, key):
        from yololite_tpu.models.modules import _kaiming_uniform

        return {"cv1": {"w": _kaiming_uniform(key, (self.k, self.k, 2, 1), 2 * self.k * self.k)}}, {}

    def __call__(self, params, state, x, ctx, path=()):
        g = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], -1)
        a = conv2d(g, params["cv1"]["w"], 1, self.k // 2)
        return x * jax.nn.sigmoid(a)


class CBAM(_Composite):
    """Channel then spatial attention (reference conv.py:296-310)."""

    def __init__(self, c1, kernel_size=7):
        self.sub = {"channel_attention": ChannelAttention(c1), "spatial_attention": SpatialAttention(kernel_size)}

    def __call__(self, params, state, x, ctx, path=()):
        x = self._apply("channel_attention", params, state, x, ctx, path)
        return self._apply("spatial_attention", params, state, x, ctx, path)


class RepConv(_Composite):
    """Rep-style 3x3 + 1x1 (+ optional identity BN) block (reference conv.py:172-258)."""

    def __init__(self, c1, c2, k=3, s=1, p=1, g=1, d=1, act=True, bn=False):
        assert k == 3 and p == 1
        self.act = act
        self.has_id_bn = bn and c2 == c1 and s == 1
        self.c1 = c1
        self.sub = {
            "conv1": Conv(c1, c2, k, s, p=p, g=g, act=False),
            "conv2": Conv(c1, c2, 1, s, p=(p - k // 2), g=g, act=False),
        }
        self.downsample = s

    def init(self, key):
        params, state = _Composite.init(self, key)
        if self.has_id_bn:
            params["bn"] = {"scale": jnp.ones(self.c1), "bias": jnp.zeros(self.c1)}
            state["bn"] = {"mean": jnp.zeros(self.c1), "var": jnp.ones(self.c1)}
        return params, state

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("conv1", params, state, x, ctx, path) + self._apply("conv2", params, state, x, ctx, path)
        if self.has_id_bn:
            y = y + batchnorm(params["bn"], state["bn"], x, ctx, path + ("bn",))
        return jax.nn.silu(y) if self.act is True else y


class RepVGGDW(_Composite):
    """Depthwise 7x7 + 3x3 rep block (reference block.py:742-800)."""

    def __init__(self, ed):
        self.sub = {
            "conv": Conv(ed, ed, 7, 1, 3, g=ed, act=False),
            "conv1": Conv(ed, ed, 3, 1, 1, g=ed, act=False),
        }

    def __call__(self, params, state, x, ctx, path=()):
        return jax.nn.silu(
            self._apply("conv", params, state, x, ctx, path) + self._apply("conv1", params, state, x, ctx, path)
        )


# ---- CSP family ----


class C1(_Composite):
    """CSP with 1 conv (reference block.py:187-199)."""

    def __init__(self, c1, c2, n=1):
        self.sub = {"cv1": Conv(c1, c2, 1, 1), "m": Seq(*(Conv(c2, c2, 3) for _ in range(n)))}

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        return self._apply("m", params, state, y, ctx, path) + y


class C2(_Composite):
    """CSP with 2 convs (reference block.py:202-217)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        self.c = int(c2 * e)
        self.sub = {
            "cv1": Conv(c1, 2 * self.c, 1, 1),
            "cv2": Conv(2 * self.c, c2, 1),
            "m": Seq(*(Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n))),
        }

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        a, b = y[..., : self.c], y[..., self.c :]
        a = self._apply("m", params, state, a, ctx, path)
        return self._apply("cv2", params, state, jnp.concatenate([a, b], -1), ctx, path)


class C3x(C3):
    """C3 with cross (1,3)/(3,1) kernels (reference block.py: C3x)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e, bottleneck_k=((1, 3), (3, 1)))


class C3Ghost(C3):
    """C3 with GhostBottlenecks (reference block.py:365-372)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.sub["m"] = Seq(*(GhostBottleneck(c_, c_) for _ in range(n)))


class RepC3(_Composite):
    """Rep C3 for RT-DETR necks (reference block.py:377-392)."""

    def __init__(self, c1, c2, n=3, e=1.0):
        c_ = int(c2 * e)
        self.sub = {
            "cv1": Conv(c1, c2, 1, 1),
            "cv2": Conv(c1, c2, 1, 1),
            "m": Seq(*(RepConv(c_, c_) for _ in range(n))),
            "cv3": Conv(c_, c2, 1, 1) if c_ != c2 else Identity(),
        }

    def __call__(self, params, state, x, ctx, path=()):
        a = self._apply("m", params, state, self._apply("cv1", params, state, x, ctx, path), ctx, path)
        b = self._apply("cv2", params, state, x, ctx, path)
        return self._apply("cv3", params, state, a + b, ctx, path)


class BottleneckCSP(_Composite):
    """Original CSP bottleneck (reference block.py:352-366-ish)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        c_ = int(c2 * e)
        self.c_ = c_
        self.sub = {
            "cv1": Conv(c1, c_, 1, 1),
            "cv2": Conv2d(c1, c_, 1),
            "cv3": Conv2d(c_, c_, 1),
            "cv4": Conv(2 * c_, c2, 1, 1),
            "m": Seq(*(Bottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n))),
        }

    def init(self, key):
        params, state = _Composite.init(self, key)
        # cv2/cv3 are bias-free plain convs in the reference
        params["cv2"].pop("b", None)
        params["cv3"].pop("b", None)
        params["bn"] = {"scale": jnp.ones(2 * self.c_), "bias": jnp.zeros(2 * self.c_)}
        state["bn"] = {"mean": jnp.zeros(2 * self.c_), "var": jnp.ones(2 * self.c_)}
        return params, state

    def __call__(self, params, state, x, ctx, path=()):
        y1 = self._apply("m", params, state, self._apply("cv1", params, state, x, ctx, path), ctx, path)
        y1 = conv2d(y1, params["cv3"]["w"])
        y2 = conv2d(x, params["cv2"]["w"])
        y = batchnorm(params["bn"], state["bn"], jnp.concatenate([y1, y2], -1), ctx, path + ("bn",))
        return self._apply("cv4", params, state, jax.nn.silu(y), ctx, path)


class SPP(_Composite):
    """Spatial pyramid pooling, parallel kernels (reference block.py:148-162)."""

    def __init__(self, c1, c2, k=(5, 9, 13)):
        c_ = c1 // 2
        self.k = k
        self.sub = {"cv1": Conv(c1, c_, 1, 1), "cv2": Conv(c_ * (len(k) + 1), c2, 1, 1)}

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        ys = [y] + [_maxpool(y, k, 1, k // 2) for k in self.k]
        return self._apply("cv2", params, state, jnp.concatenate(ys, -1), ctx, path)


class Proto(_Composite):
    """Segmentation mask prototypes head (reference block.py:73-90)."""

    def __init__(self, c1, c_=256, c2=32):
        self.sub = {
            "cv1": Conv(c1, c_, 3),
            "upsample": ConvTranspose2d(c_, c_, 2, 2, 0, bias=True),
            "cv2": Conv(c_, c_, 3),
            "cv3": Conv(c_, c2),
        }

    def __call__(self, params, state, x, ctx, path=()):
        x = self._apply("cv1", params, state, x, ctx, path)
        x = self._apply("upsample", params, state, x, ctx, path)
        return self._apply("cv3", params, state, self._apply("cv2", params, state, x, ctx, path), ctx, path)


# ---- HGNetV2 ----


class HGStem(_Composite):
    """PPHGNetV2 stem (reference block.py:93-122)."""

    def __init__(self, c1, cm, c2):
        self.downsample = 4
        self.sub = {
            "stem1": Conv(c1, cm, 3, 2, act="relu"),
            "stem2a": Conv(cm, cm // 2, 2, 1, 0, act="relu"),
            "stem2b": Conv(cm // 2, cm, 2, 1, 0, act="relu"),
            "stem3": Conv(cm * 2, cm, 3, 2, act="relu"),
            "stem4": Conv(cm, c2, 1, 1, act="relu"),
        }

    def __call__(self, params, state, x, ctx, path=()):
        x = self._apply("stem1", params, state, x, ctx, path)
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x2 = self._apply("stem2a", params, state, x, ctx, path)
        x2 = jnp.pad(x2, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x2 = self._apply("stem2b", params, state, x2, ctx, path)
        x1 = _maxpool(x, 2, 1, 0, ceil=True)
        x = jnp.concatenate([x1, x2], -1)
        x = self._apply("stem3", params, state, x, ctx, path)
        return self._apply("stem4", params, state, x, ctx, path)


class HGBlock(_Composite):
    """PPHGNetV2 block (reference block.py:125-145)."""

    def __init__(self, c1, cm, c2, k=3, n=6, lightconv=False, shortcut=False, act="relu"):
        block = LightConv if lightconv else Conv
        self.n = n
        self.add = shortcut and c1 == c2
        self.sub = {
            "m": ModList([block(c1 if i == 0 else cm, cm, k=k, act=act) for i in range(n)]),
            "sc": Conv(c1 + n * cm, c2 // 2, 1, 1, act=act),
            "ec": Conv(c2 // 2, c2, 1, 1, act=act),
        }

    def __call__(self, params, state, x, ctx, path=()):
        ys = [x]
        ml: ModList = self.sub["m"]
        for i in range(self.n):
            ys.append(ml.apply_i(i, params["m"], state.get("m", {}), ys[-1], ctx, path + ("m",)))
        y = self._apply("sc", params, state, jnp.concatenate(ys, -1), ctx, path)
        y = self._apply("ec", params, state, y, ctx, path)
        return y + x if self.add else y


# ---- ResNet ----


class ResNetBlock(_Composite):
    """Standard bottleneck residual block (reference block.py:385-400)."""

    def __init__(self, c1, c2, s=1, e=4):
        c3 = e * c2
        self.sub = {
            "cv1": Conv(c1, c2, 1, 1, act=True),
            "cv2": Conv(c2, c2, 3, s, p=1, act=True),
            "cv3": Conv(c2, c3, 1, act=False),
        }
        self.has_shortcut = s != 1 or c1 != c3
        if self.has_shortcut:
            self.sub["shortcut"] = Seq(Conv(c1, c3, 1, s, act=False))

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        y = self._apply("cv2", params, state, y, ctx, path)
        y = self._apply("cv3", params, state, y, ctx, path)
        sc = self._apply("shortcut", params, state, x, ctx, path) if self.has_shortcut else x
        return jax.nn.relu(y + sc)


class ResNetLayer(_Composite):
    """Stack of ResNet blocks or the 7x7 stem (reference block.py:403-428)."""

    def __init__(self, c1, c2, s=1, is_first=False, n=1, e=4):
        self.is_first = is_first
        if is_first:
            self.sub = {"layer": Seq(Conv(c1, c2, 7, 2, p=3, act=True), MaxPool(3, 2, 1))}
        else:
            blocks = [ResNetBlock(c1, c2, s, e=e)] + [ResNetBlock(e * c2, c2, 1, e=e) for _ in range(n - 1)]
            self.sub = {"layer": Seq(*blocks)}

    def __call__(self, params, state, x, ctx, path=()):
        return self._apply("layer", params, state, x, ctx, path)


# ---- YOLOv9 ----


class RepBottleneck(Bottleneck):
    """Bottleneck whose cv1 is a RepConv (reference block.py:558-565)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__(c1, c2, shortcut, g, k, e)
        c_ = int(c2 * e)
        self.sub = dict(self.sub)
        self.sub["cv1"] = RepConv(c1, c_, k[0] if isinstance(k[0], int) else 3, 1)


class RepCSP(C3):
    """C3 with RepBottlenecks (reference block.py:568-575)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.sub["m"] = Seq(*(RepBottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)))


class RepNCSPELAN4(_Composite):
    """CSP-ELAN aggregation (reference block.py:578-600)."""

    def __init__(self, c1, c2, c3, c4, n=1):
        self.c = c3 // 2
        self.sub = {
            "cv1": Conv(c1, c3, 1, 1),
            "cv2": Seq(RepCSP(c3 // 2, c4, n), Conv(c4, c4, 3, 1)),
            "cv3": Seq(RepCSP(c4, c4, n), Conv(c4, c4, 3, 1)),
            "cv4": Conv(c3 + 2 * c4, c2, 1, 1),
        }

    def __call__(self, params, state, x, ctx, path=()):
        y0 = self._apply("cv1", params, state, x, ctx, path)
        ys = [y0[..., : self.c], y0[..., self.c :]]
        ys.append(self._apply("cv2", params, state, ys[-1], ctx, path))
        ys.append(self._apply("cv3", params, state, ys[-1], ctx, path))
        return self._apply("cv4", params, state, jnp.concatenate(ys, -1), ctx, path)


class ELAN1(RepNCSPELAN4):
    """Plain-conv ELAN (reference block.py:604-614)."""

    def __init__(self, c1, c2, c3, c4):
        self.c = c3 // 2
        self.sub = {
            "cv1": Conv(c1, c3, 1, 1),
            "cv2": Conv(c3 // 2, c4, 3, 1),
            "cv3": Conv(c4, c4, 3, 1),
            "cv4": Conv(c3 + 2 * c4, c2, 1, 1),
        }


class AConv(_Composite):
    """Avg-pool + stride-2 conv downsample (reference block.py:617-629)."""

    def __init__(self, c1, c2):
        self.sub = {"cv1": Conv(c1, c2, 3, 2, 1)}
        self.downsample = 2

    def __call__(self, params, state, x, ctx, path=()):
        return self._apply("cv1", params, state, _avgpool2(x), ctx, path)


class ADown(_Composite):
    """Split avg/max downsample (reference block.py:632-650)."""

    def __init__(self, c1, c2):
        self.c = c2 // 2
        self.c1h = c1 // 2
        self.sub = {"cv1": Conv(c1 // 2, self.c, 3, 2, 1), "cv2": Conv(c1 // 2, self.c, 1, 1, 0)}
        self.downsample = 2

    def __call__(self, params, state, x, ctx, path=()):
        x = _avgpool2(x)
        x1, x2 = x[..., : self.c1h], x[..., self.c1h :]
        x1 = self._apply("cv1", params, state, x1, ctx, path)
        x2 = _maxpool(x2, 3, 2, 1)
        x2 = self._apply("cv2", params, state, x2, ctx, path)
        return jnp.concatenate([x1, x2], -1)


class SPPELAN(_Composite):
    """SPP-ELAN (reference block.py:653-672)."""

    def __init__(self, c1, c2, c3, k=5):
        self.k = k
        self.sub = {"cv1": Conv(c1, c3, 1, 1), "cv5": Conv(4 * c3, c2, 1, 1)}

    def __call__(self, params, state, x, ctx, path=()):
        ys = [self._apply("cv1", params, state, x, ctx, path)]
        for _ in range(3):
            ys.append(_maxpool(ys[-1], self.k, 1, self.k // 2))
        return self._apply("cv5", params, state, jnp.concatenate(ys, -1), ctx, path)


class CBLinear(_Composite):
    """Conv splitting into multiple channel groups (reference block.py:675-686)."""

    def __init__(self, c1, c2s, k=1, s=1, p=None, g=1):
        self.c2s = list(c2s)
        self.sub = {"conv": Conv2d(c1, sum(c2s), k, s, autopad(k, p), g)}

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("conv", params, state, x, ctx, path)
        outs = []
        start = 0
        for c in self.c2s:
            outs.append(y[..., start : start + c])
            start += c
        return outs


class CBFuse(Module):
    """Nearest-upsample + sum fusion across levels (reference block.py:689-700)."""

    def __init__(self, idx):
        self.idx = list(idx)

    def init(self, key):
        return {}, {}

    def __call__(self, params, state, xs, ctx, path=()):
        target_h, target_w = xs[-1].shape[1], xs[-1].shape[2]
        res = []
        for i, x in enumerate(xs[:-1]):
            t = x[self.idx[i]]
            fh, fw = target_h // t.shape[1], target_w // t.shape[2]
            t = jnp.repeat(jnp.repeat(t, fh, axis=1), fw, axis=2)
            res.append(t)
        return sum(res) + xs[-1]


# ---- YOLOv10 ----


class CIB(_Composite):
    """Conditional identity block (reference block.py:803-840)."""

    def __init__(self, c1, c2, shortcut=True, e=0.5, lk=False):
        c_ = int(c2 * e)
        self.add = shortcut and c1 == c2
        self.sub = {
            "cv1": Seq(
                Conv(c1, c1, 3, g=c1),
                Conv(c1, 2 * c_, 1),
                RepVGGDW(2 * c_) if lk else Conv(2 * c_, 2 * c_, 3, g=2 * c_),
                Conv(2 * c_, c2, 1),
                Conv(c2, c2, 3, g=c2),
            )
        }

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        return x + y if self.add else y


class C2fCIB(C2f):
    """C2f with CIB inner blocks (reference block.py:843-860)."""

    def __init__(self, c1, c2, n=1, shortcut=False, lk=False, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.sub["m"] = ModList([CIB(self.c, self.c, shortcut, e=1.0, lk=lk) for _ in range(n)])


class PSA(_Composite):
    """Position-sensitive attention block (reference block.py:966-996)."""

    def __init__(self, c1, c2, e=0.5):
        assert c1 == c2
        self.c = int(c1 * e)
        self.sub = {
            "cv1": Conv(c1, 2 * self.c, 1, 1),
            "cv2": Conv(2 * self.c, c1, 1),
            "attn": Attention(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1)),
            "ffn": Seq(Conv(self.c, self.c * 2, 1), Conv(self.c * 2, self.c, 1, act=False)),
        }

    def __call__(self, params, state, x, ctx, path=()):
        y = self._apply("cv1", params, state, x, ctx, path)
        a, b = y[..., : self.c], y[..., self.c :]
        b = b + self._apply("attn", params, state, b, ctx, path)
        b = b + self._apply("ffn", params, state, b, ctx, path)
        return self._apply("cv2", params, state, jnp.concatenate([a, b], -1), ctx, path)


class C2fPSA(C2f):
    """C2f with PSABlock inner blocks (reference block.py:1062-1090)."""

    def __init__(self, c1, c2, n=1, e=0.5):
        assert c1 == c2
        super().__init__(c1, c2, n=n, shortcut=False, e=e)
        self.sub["m"] = ModList([PSABlock(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1)) for _ in range(n)])


class SCDown(_Composite):
    """Separable downsample conv (reference block.py:1093-1105)."""

    def __init__(self, c1, c2, k, s):
        self.sub = {"cv1": Conv(c1, c2, 1, 1), "cv2": Conv(c2, c2, k=k, s=s, g=c2, act=False)}
        self.downsample = s

    def __call__(self, params, state, x, ctx, path=()):
        return self._apply("cv2", params, state, self._apply("cv1", params, state, x, ctx, path), ctx, path)


class C3f(_Composite):
    """C3-style split with list growth (reference block.py:700-718)."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        c_ = int(c2 * e)
        self.n = n
        self.sub = {
            "cv1": Conv(c1, c_, 1, 1),
            "cv2": Conv(c1, c_, 1, 1),
            "cv3": Conv((2 + n) * c_, c2, 1),
            "m": ModList([Bottleneck(c_, c_, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n)]),
        }

    def __call__(self, params, state, x, ctx, path=()):
        ys = [self._apply("cv2", params, state, x, ctx, path), self._apply("cv1", params, state, x, ctx, path)]
        ml: ModList = self.sub["m"]
        for i in range(self.n):
            ys.append(ml.apply_i(i, params["m"], state.get("m", {}), ys[-1], ctx, path + ("m",)))
        return self._apply("cv3", params, state, jnp.concatenate(ys, -1), ctx, path)


class Conv2(Module):
    """Conv with a parallel 1x1 branch sharing BN+act (RepConv-lite, reference conv.py:55-79).

    fuse_tree folds the 1x1 into the kxk center tap, then folds BN (fuse_convs
    semantics, reference conv.py:71-79).
    """

    def __init__(self, c1, c2, k=3, s=1, p=None, g=1, d=1, act=True):
        self.c1, self.c2, self.k, self.s, self.g, self.d = c1, c2, k, s, g, d
        self.p = autopad(k, p, d)
        self.act = act
        self.downsample = s

    def init(self, key):
        from yololite_tpu.models.modules import _kaiming_uniform

        fan_in = self.c1 // self.g * self.k * self.k
        params = {
            "conv": {"w": _kaiming_uniform(key, (self.k, self.k, self.c1 // self.g, self.c2), fan_in)},
            "cv2": {"w": _kaiming_uniform(key, (1, 1, self.c1 // self.g, self.c2), self.c1 // self.g)},
            "bn": {"scale": jnp.ones(self.c2), "bias": jnp.zeros(self.c2)},
        }
        return params, {"bn": {"mean": jnp.zeros(self.c2), "var": jnp.ones(self.c2)}}

    def __call__(self, params, state, x, ctx, path=()):
        y = conv2d(x, params["conv"]["w"], self.s, self.p, self.g, self.d)
        if "cv2" in params:  # unfused
            y = y + conv2d(x, params["cv2"]["w"], self.s, 0, self.g, self.d)
            y = batchnorm(params["bn"], state["bn"], y, ctx, path + ("bn",))
        else:  # fused by fuse_tree: single conv + bias under the conv node
            y = y + params["conv"]["b"].astype(y.dtype)
        if self.act is True:
            y = jax.nn.silu(y)
        elif self.act == "relu":
            y = jax.nn.relu(y)
        return y


class DWConvTranspose2d(Module):
    """Depthwise transposed conv, groups = gcd(c1, c2) (reference conv.py:108-113).

    Param 'wt' is stored 5-dim as flipped (kh, kw, c_in//g, g, c_out//g) and
    reshaped to the HWIO grouped kernel (kh, kw, c_in//g, c_out) at call time
    (g-major output channels, matching feature_group_count semantics). Keeping
    the group axis explicit lets the checkpoint mapper detect g from the
    template shape alone, in both import and export directions.
    """

    def __init__(self, c1, c2, k=1, s=1, p1=0, p2=0):
        assert p2 == 0, "output_padding unsupported"
        self.c1, self.c2, self.k, self.s, self.p = c1, c2, k, s, p1
        self.g = math.gcd(c1, c2)
        self.downsample = 1 / s

    def init(self, key):
        from yololite_tpu.models.modules import _kaiming_uniform

        fan_in = (self.c2 // self.g) * self.k * self.k
        shape = (self.k, self.k, self.c1 // self.g, self.g, self.c2 // self.g)
        return {"wt": _kaiming_uniform(key, shape, fan_in)}, {}

    def __call__(self, params, state, x, ctx, path=()):
        pad = self.k - 1 - self.p
        wt = params["wt"].reshape(self.k, self.k, self.c1 // self.g, self.c2)
        return jax.lax.conv_general_dilated(
            x, wt.astype(x.dtype), window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)], lhs_dilation=(self.s, self.s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=self.g,
        )


def _adaptive_max_pool(x, k):
    """torch AdaptiveMaxPool2d((k, k)) on NHWC with static H, W."""
    B, H, W, C = x.shape
    rows = [(i * H // k, -(-(i + 1) * H // k)) for i in range(k)]
    cols = [(j * W // k, -(-(j + 1) * W // k)) for j in range(k)]
    out = [[jnp.max(x[:, r0:r1, c0:c1, :], axis=(1, 2)) for c0, c1 in cols] for r0, r1 in rows]
    return jnp.stack([jnp.stack(r, axis=1) for r in out], axis=1)  # (B, k, k, C)


class MaxSigmoidAttnBlock(_Composite):
    """Guide-conditioned max-sigmoid spatial gate (reference block.py:407-439).

    Input: [x (B,H,W,c1), guide (B,N,gc)].
    """

    def __init__(self, c1, c2, nh=1, ec=128, gc=512, scale=False):
        from yololite_tpu.models.transformer import Linear

        self.nh, self.hc = nh, c2 // nh
        self.has_scale = scale
        self.sub = {"gl": Linear(gc, ec), "proj_conv": Conv(c1, c2, 3, 1, act=False)}
        if c1 != ec:
            self.sub["ec"] = Conv(c1, ec, 1, act=False)

    def init(self, key):
        params, state = _Composite.init(self, key)
        params["bias"] = jnp.zeros(self.nh)
        if self.has_scale:
            params["scale"] = jnp.ones((1, self.nh, 1, 1))
        return params, state

    def __call__(self, params, state, x, ctx, path=()):
        x, guide = x
        B, H, W, _ = x.shape
        guide = self._apply("gl", params, state, guide, ctx, path)  # (B, N, ec)
        guide = guide.reshape(B, -1, self.nh, self.hc)
        embed = self._apply("ec", params, state, x, ctx, path) if "ec" in self.sub else x
        embed = embed.reshape(B, H, W, self.nh, self.hc)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", embed, guide).max(axis=-1)  # (B,H,W,nh)
        aw = aw / (self.hc**0.5) + params["bias"].astype(aw.dtype)
        aw = jax.nn.sigmoid(aw)
        if self.has_scale:
            aw = aw * params["scale"].reshape(1, 1, 1, self.nh).astype(aw.dtype)
        y = self._apply("proj_conv", params, state, x, ctx, path).reshape(B, H, W, self.nh, self.hc)
        return (y * aw[..., None]).reshape(B, H, W, self.nh * self.hc)


class C2fAttn(_Composite):
    """C2f with a guide-attention tail branch (reference block.py:442-467).

    Input: [x, guide]."""

    def __init__(self, c1, c2, n=1, ec=128, nh=1, gc=512, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.n = n
        self.sub = {
            "cv1": Conv(c1, 2 * self.c, 1, 1),
            "cv2": Conv((3 + n) * self.c, c2, 1),
            "m": ModList([Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n)]),
            "attn": MaxSigmoidAttnBlock(self.c, self.c, gc=gc, ec=ec, nh=nh),
        }

    def __call__(self, params, state, x, ctx, path=()):
        x, guide = x
        y = self._apply("cv1", params, state, x, ctx, path)
        ys = [y[..., : self.c], y[..., self.c :]]
        ml: ModList = self.sub["m"]
        for i in range(self.n):
            ys.append(ml.apply_i(i, params["m"], state.get("m", {}), ys[-1], ctx, path + ("m",)))
        ys.append(self._apply("attn", params, state, [ys[-1], guide], ctx, path))
        return self._apply("cv2", params, state, jnp.concatenate(ys, -1), ctx, path)


class ImagePoolingAttn(_Composite):
    """Text embeddings attending over pooled image features (reference block.py:470-515).

    Input: [*feats, text (B, N, ct)]."""

    def __init__(self, ec=256, ch=(), ct=512, nh=8, k=3, scale=False):
        from yololite_tpu.models.transformer import LayerNorm, Linear

        self.ec, self.nh, self.nf, self.hc, self.k = ec, nh, len(ch), ec // nh, k
        self.has_scale = scale
        self.sub = {
            "query": Seq(LayerNorm(ct), Linear(ct, ec)),
            "key": Seq(LayerNorm(ec), Linear(ec, ec)),
            "value": Seq(LayerNorm(ec), Linear(ec, ec)),
            "proj": Linear(ec, ct),
            "projections": ModList([Conv2d(c, ec, 1) for c in ch]),
        }

    def init(self, key):
        params, state = _Composite.init(self, key)
        if self.has_scale:
            params["scale"] = jnp.zeros(1)
        return params, state

    def __call__(self, params, state, x, ctx, path=()):
        *feats, text = x
        assert len(feats) == self.nf
        B = feats[0].shape[0]
        pl: ModList = self.sub["projections"]
        pooled = []
        for i, f in enumerate(feats):
            p = pl.apply_i(i, params["projections"], state.get("projections", {}), f, ctx, path + ("projections",))
            pooled.append(_adaptive_max_pool(p, self.k).reshape(B, self.k * self.k, self.ec))
        kv = jnp.concatenate(pooled, axis=1)  # (B, nf*k*k, ec)
        q = self._apply("query", params, state, text, ctx, path).reshape(B, -1, self.nh, self.hc)
        k = self._apply("key", params, state, kv, ctx, path).reshape(B, -1, self.nh, self.hc)
        v = self._apply("value", params, state, kv, ctx, path).reshape(B, -1, self.nh, self.hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, k) / (self.hc**0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, -1, self.ec)
        out = self._apply("proj", params, state, out, ctx, path)
        scale = params["scale"].astype(out.dtype) if self.has_scale else 1.0
        return out * scale + text


class ContrastiveHead(Module):
    """Region-text similarity logits (reference block.py:518-535). Input: [x, w]."""

    def init(self, key):
        return {"bias": jnp.full((1,), -10.0), "logit_scale": jnp.asarray(math.log(1 / 0.07))}, {}

    def __call__(self, params, state, x, ctx, path=()):
        x, w = x
        # torch F.normalize clamps the norm at eps=1e-12
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)  # NHWC: channel last
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        y = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return y * jnp.exp(params["logit_scale"]).astype(y.dtype) + params["bias"].astype(y.dtype)


class BNContrastiveHead(Module):
    """ContrastiveHead with BN on region features (reference block.py:538-556)."""

    def __init__(self, embed_dims):
        self.c = embed_dims

    def init(self, key):
        params = {
            "norm": {"scale": jnp.ones(self.c), "bias": jnp.zeros(self.c)},
            "bias": jnp.full((1,), -10.0),
            "logit_scale": jnp.asarray(-1.0),
        }
        return params, {"norm": {"mean": jnp.zeros(self.c), "var": jnp.ones(self.c)}}

    def __call__(self, params, state, x, ctx, path=()):
        x, w = x
        x = batchnorm(params["norm"], state["norm"], x, ctx, path + ("norm",))
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        y = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return y * jnp.exp(params["logit_scale"]).astype(y.dtype) + params["bias"].astype(y.dtype)
