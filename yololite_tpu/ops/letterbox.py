"""Letterbox preprocessing (host side, cv2) with exact reference geometry.

Mirrors reference data/augment.py:612-700: aspect-preserving resize with
INTER_LINEAR, dual-side padding with the round(d - 0.1)/round(d + 0.1) split and
114-gray fill. The batched device path (resize on TPU) lives in
yololite_tpu.ops.pallas_kernels once shapes are uniform.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


class LetterBox:
    """Resize + pad an HWC uint8 image to new_shape preserving aspect ratio."""

    def __init__(self, new_shape=(640, 640), auto=False, scale_fill=False, scaleup=True, center=True, stride=32):
        self.new_shape = (new_shape, new_shape) if isinstance(new_shape, int) else tuple(new_shape)
        self.auto = auto
        self.scale_fill = scale_fill
        self.scaleup = scaleup
        self.center = center
        self.stride = stride

    def params(self, shape: Tuple[int, int], new_shape: Optional[Tuple[int, int]] = None):
        """Compute (ratio, new_unpad(w,h), (dw, dh)) for an input (h, w)."""
        new_shape = new_shape or self.new_shape
        r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
        if not self.scaleup:
            r = min(r, 1.0)
        new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
        dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
        if self.auto:
            dw, dh = dw % self.stride, dh % self.stride
        elif self.scale_fill:
            dw, dh = 0.0, 0.0
            new_unpad = (new_shape[1], new_shape[0])
            r = None  # anisotropic
        if self.center:
            dw /= 2
            dh /= 2
        return r, new_unpad, (dw, dh)

    def __call__(self, image: np.ndarray, new_shape: Optional[Tuple[int, int]] = None) -> np.ndarray:
        shape = image.shape[:2]
        new_shape = new_shape or self.new_shape
        r, new_unpad, (dw, dh) = self.params(shape, new_shape)
        if shape[::-1] != new_unpad:
            image = cv2.resize(image, new_unpad, interpolation=cv2.INTER_LINEAR)
        top = int(round(dh - 0.1)) if self.center else 0
        bottom = int(round(dh + 0.1))
        left = int(round(dw - 0.1)) if self.center else 0
        right = int(round(dw + 0.1))
        return cv2.copyMakeBorder(image, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(114, 114, 114))


def preprocess_batch(images, imgsz: int = 640, stride: int = 32, auto: bool = False) -> np.ndarray:
    """Letterbox a list of HWC BGR uint8 images and stack to (B, S, S, 3) RGB float32 in [0,1].

    NHWC output feeds the TPU model directly (no CHW transpose as in the
    reference predictor.py:67-87).
    """
    same = len({im.shape for im in images}) == 1
    lb = LetterBox((imgsz, imgsz), auto=auto and same, stride=stride)
    out = np.stack([lb(im) for im in images])
    out = out[..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(out, dtype=np.float32) / 255.0


def scale_img(img, ratio: float = 1.0, same_shape: bool = False, gs: int = 32):
    """Scale + zero-ish-pad an NHWC image batch for TTA (reference torch_utils.py:255-264).

    Resizes bilinearly by `ratio`; unless same_shape, pads out to the next
    gs-multiple of the ORIGINAL size with the ImageNet-mean fill 0.447.
    """
    import jax
    import jax.numpy as jnp
    import math

    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    hs, ws = int(h * ratio), int(w * ratio)
    out = jax.image.resize(img, (b, hs, ws, c), "bilinear")
    if not same_shape:
        h, w = (math.ceil(x * ratio / gs) * gs for x in (h, w))
    return jnp.pad(out, ((0, 0), (0, h - hs), (0, w - ws), (0, 0)), constant_values=0.447)
