"""Box algebra: format conversion, IoU family, anchor geometry.

JAX versions operate on device inside jitted graphs; `*_np` variants serve the
host-side Results/metrics path. Math mirrors the reference exactly
(utils/ops.py:352-484, utils/metrics.py:51-128, utils/tal.py:326-357).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---- format conversion ----


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2); works for jnp and np arrays."""
    lib = jnp if isinstance(x, jnp.ndarray) else np
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return lib.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    lib = jnp if isinstance(x, jnp.ndarray) else np
    p1, p2 = x[..., :2], x[..., 2:4]
    return lib.concatenate([(p1 + p2) / 2, p2 - p1], axis=-1)


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2) with optional pad offset (numpy)."""
    y = np.empty_like(x)
    xc, yc, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    y[..., 0] = w * (xc - bw / 2) + padw
    y[..., 1] = h * (yc - bh / 2) + padh
    y[..., 2] = w * (xc + bw / 2) + padw
    y[..., 3] = h * (yc + bh / 2) + padh
    return y


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    """Pixel (x1,y1,x2,y2) -> normalized (cx,cy,w,h) (numpy)."""
    if clip:
        x = clip_boxes_np(x.copy(), (h - eps, w - eps))
    y = np.empty_like(x)
    y[..., 0] = ((x[..., 0] + x[..., 2]) / 2) / w
    y[..., 1] = ((x[..., 1] + x[..., 3]) / 2) / h
    y[..., 2] = (x[..., 2] - x[..., 0]) / w
    y[..., 3] = (x[..., 3] - x[..., 1]) / h
    return y


# ---- clipping / rescaling (host path) ----


def clip_boxes_np(boxes: np.ndarray, shape) -> np.ndarray:
    """Clip xyxy boxes to image shape (h, w) in place."""
    boxes[..., 0] = boxes[..., 0].clip(0, shape[1])
    boxes[..., 1] = boxes[..., 1].clip(0, shape[0])
    boxes[..., 2] = boxes[..., 2].clip(0, shape[1])
    boxes[..., 3] = boxes[..., 3].clip(0, shape[0])
    return boxes


def scale_image_np(masks: np.ndarray, im0_shape, ratio_pad=None) -> np.ndarray:
    """Un-letterbox an image/mask array back to the original shape (reference ops.py scale_image).

    masks: (H, W[, C]) array in letterboxed space -> resized (h0, w0[, C]).
    """
    import cv2

    im1_shape = masks.shape
    if im1_shape[:2] == tuple(im0_shape[:2]):
        return masks
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = (im1_shape[1] - im0_shape[1] * gain) / 2, (im1_shape[0] - im0_shape[0] * gain) / 2
    else:
        pad = ratio_pad[1]
    top, left = int(pad[1]), int(pad[0])
    bottom, right = int(im1_shape[0] - pad[1]), int(im1_shape[1] - pad[0])
    masks = masks[top:bottom, left:right]
    masks = cv2.resize(masks, (im0_shape[1], im0_shape[0]))
    if masks.ndim == 2:
        masks = masks[:, :, None]
    return masks


def convert_batch2numpy(batch) -> list:
    """Normalized NHWC float batch -> list of BGR uint8 images for Results
    (reference ops.py:487 convert_torch2numpy_batch; there the batch is NCHW
    torch -- here it is the framework-native NHWC array, device or host)."""
    arr = np.asarray(batch, np.float32)
    return [np.ascontiguousarray((np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)[..., ::-1]) for a in arr]


def scale_boxes_np(img1_shape, boxes, img0_shape, ratio_pad=None, padding=True, xywh=False):
    """Rescale boxes from letterboxed img1_shape back to original img0_shape.

    Mirrors reference ops.py:66-99 including the round(pad - 0.1) asymmetry.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    boxes = np.array(boxes, dtype=np.float64 if boxes.dtype == np.float64 else np.float32)
    if padding:
        boxes[..., 0] -= pad[0]
        boxes[..., 1] -= pad[1]
        if not xywh:
            boxes[..., 2] -= pad[0]
            boxes[..., 3] -= pad[1]
    boxes[..., :4] /= gain
    return clip_boxes_np(boxes, img0_shape)


def xywh2ltwh(x):
    """[cx, cy, w, h] -> [x1, y1, w, h] (reference ops.py:392-405)."""
    lib = jnp if isinstance(x, jnp.ndarray) else np
    return lib.concatenate([x[..., :2] - x[..., 2:4] / 2, x[..., 2:4]], axis=-1)


def xyxy2ltwh(x):
    """[x1, y1, x2, y2] -> [x1, y1, w, h] (reference ops.py:408-421)."""
    lib = jnp if isinstance(x, jnp.ndarray) else np
    return lib.concatenate([x[..., :2], x[..., 2:4] - x[..., :2]], axis=-1)


def ltwh2xywh(x):
    """[x1, y1, w, h] -> [cx, cy, w, h] (reference ops.py:424-437)."""
    lib = jnp if isinstance(x, jnp.ndarray) else np
    return lib.concatenate([x[..., :2] + x[..., 2:4] / 2, x[..., 2:4]], axis=-1)


def ltwh2xyxy(x):
    """[x1, y1, w, h] -> [x1, y1, x2, y2]."""
    lib = jnp if isinstance(x, jnp.ndarray) else np
    return lib.concatenate([x[..., :2], x[..., :2] + x[..., 2:4]], axis=-1)


def clip_coords(coords, shape):
    """Clip point coordinates to image bounds (h, w) in place (reference ops.py:298-315)."""
    coords[..., 0] = coords[..., 0].clip(0, shape[1])
    coords[..., 1] = coords[..., 1].clip(0, shape[0])
    return coords


# ---- IoU ----


def box_iou(box1, box2, eps=1e-7):
    """Pairwise IoU of xyxy boxes: (N,4) x (M,4) -> (N,M). JAX or numpy."""
    lib = jnp if isinstance(box1, jnp.ndarray) or isinstance(box2, jnp.ndarray) else np
    a1, a2 = box1[..., None, :2], box1[..., None, 2:4]  # (N,1,2)
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]  # (1,M,2)
    inter = (lib.minimum(a2, b2) - lib.maximum(a1, b1)).clip(0).prod(-1)
    area1 = (a2 - a1).prod(-1)
    area2 = (b2 - b1).prod(-1)
    return inter / (area1 + area2 - inter + eps)


def bbox_ioa(box1, box2, iou=False, eps=1e-7):
    """Intersection over box2's area, xyxy (N,4) x (M,4) -> (N,M) (reference metrics.py:9-48)."""
    lib = jnp if isinstance(box1, jnp.ndarray) or isinstance(box2, jnp.ndarray) else np
    a1, a2 = box1[..., None, :2], box1[..., None, 2:4]  # (N,1,2)
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]  # (1,M,2)
    inter = (lib.minimum(a2, b2) - lib.maximum(a1, b1)).clip(0).prod(-1)
    area = (b2 - b1).prod(-1)
    if iou:
        area = area + (a2 - a1).prod(-1) - inter
    return inter / (area + eps)


def bbox_iou(box1, box2, xywh=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """Elementwise IoU / CIoU of broadcastable box arrays (reference metrics.py:73-135).

    JAX implementation: the CIoU aspect term's alpha uses stop_gradient, matching
    torch's `with torch.no_grad()` on alpha.
    """
    if xywh:
        (x1, y1, w1, h1) = (box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3])
        (x2, y2, w2, h2) = (box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3])
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = (jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1)).clip(0) * (
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1)
    ).clip(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (CIoU or DIoU or GIoU):
        return iou
    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


# ---- anchors / distance-box conversion ----


def make_anchors(feat_shapes: Sequence[Tuple[int, int]], strides: Sequence[int], offset: float = 0.5):
    """Static anchor grid for given (h, w) per level -> (anchors (A,2), strides (A,1)).

    Computed at trace time (shapes are static under jit), unlike the reference's
    shape-keyed runtime cache (head.py:100-102, tal.py:326-338).
    """
    pts, strs = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + offset
        sy = jnp.arange(h, dtype=jnp.float32) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        strs.append(jnp.full((h * w, 1), s, dtype=jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def dist2bbox(distance, anchor_points, xywh=True):
    """ltrb distances -> boxes around anchor points (reference tal.py:341-351)."""
    lt, rb = distance[..., :2], distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points, bbox, reg_max):
    """xyxy boxes -> clamped ltrb distances (reference tal.py:353-356)."""
    x1y1, x2y2 = bbox[..., :2], bbox[..., 2:4]
    d = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return d.clip(0, reg_max - 0.01)
