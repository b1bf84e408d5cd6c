"""Training augmentation pipeline (host-side numpy/cv2).

Behavioral counterpart of reference data/augment.py:20-1006: Compose, Mosaic,
MixUp, CopyPaste(flip), RandomPerspective (affine M = T@S@R@P@C), RandomHSV (LUT),
RandomFlip, label-aware LetterBox, Format, and the v8_transforms factory.
Each transform owns an np.random.Generator so runs are seedable per-worker.
"""

from __future__ import annotations

import math
import random
from copy import deepcopy
from typing import Dict, List, Optional

import cv2
import numpy as np

from yololite_tpu.ops.letterbox import LetterBox as _ImgLetterBox
from yololite_tpu.utils import LOGGER
from yololite_tpu.utils.instance import Instances


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, labels):
        for t in self.transforms:
            labels = t(labels)
        return labels

    def append(self, t):
        self.transforms.append(t)

    def insert(self, i, t):
        self.transforms.insert(i, t)


class BaseMixTransform:
    """Base for transforms that mix several dataset images (mosaic/mixup)."""

    def __init__(self, dataset, pre_transform=None, p=0.0):
        self.dataset, self.pre_transform, self.p = dataset, pre_transform, p

    def __call__(self, labels):
        if random.uniform(0, 1) > self.p:
            return labels
        idx = self.get_indexes()
        extra = [self.dataset.get_image_and_label(i) for i in ([idx] if isinstance(idx, int) else idx)]
        if self.pre_transform is not None:
            extra = [self.pre_transform(d) for d in extra]
        labels["mix_labels"] = extra  # key name is part of the transform contract
        labels = self._mix_transform(labels)
        labels.pop("mix_labels", None)
        return labels

    def get_indexes(self):
        return random.randint(0, len(self.dataset) - 1)

    def _mix_transform(self, labels):
        raise NotImplementedError


class Mosaic(BaseMixTransform):
    """3/4/9-image mosaic on a 2x-imgsz canvas (reference augment.py:189-380).

    n=3 is the reference's _mosaic3 1x3 strip (augment.py:235-267) — unreachable
    there (its __init__ asserts n in {4, 9}) but implemented, so we allow it.
    """

    def __init__(self, dataset, imgsz=640, p=1.0, n=4):
        assert n in (3, 4, 9)
        super().__init__(dataset=dataset, p=p)
        self.imgsz = imgsz
        self.border = (-imgsz // 2, -imgsz // 2)
        self.n = n

    def get_indexes(self, buffer=True):
        """Companion tiles come from the dataset's rolling RAM buffer (with
        replacement), matching reference augment.py:226-229 — the buffer holds
        recently loaded images, so mosaic companions correlate with the current
        stream position rather than being uniform over the dataset."""
        buf = getattr(self.dataset, "buffer", None)
        if buffer and buf:
            return random.choices(list(buf), k=self.n - 1)
        return [random.randint(0, len(self.dataset) - 1) for _ in range(self.n - 1)]

    def _mix_transform(self, labels):
        assert labels.get("rect_shape") is None, "rect and mosaic are mutually exclusive"
        if self.n == 3:
            return self._mosaic3(labels)
        return self._mosaic4(labels) if self.n == 4 else self._mosaic9(labels)

    def _mosaic3(self, labels):
        """1x3 horizontal strip on a 3s canvas, center-cropped to 2s
        (reference augment.py:235-267: center, right, left placement)."""
        mosaic_labels = []
        s = self.imgsz
        img3 = None
        h0 = w0 = 0
        for i in range(3):
            patch = labels if i == 0 else labels["mix_labels"][i - 1]
            img = patch["img"]
            h, w = patch.pop("resized_shape")
            if i == 0:  # center
                img3 = np.full((s * 3, s * 3, img.shape[2]), 114, dtype=np.uint8)
                h0, w0 = h, w
                box = s, s, s + w, s + h
            elif i == 1:  # right of center
                box = s + w0, s, s + w0 + w, s + h
            else:  # left of center, bottom-aligned
                box = s - w, s + h0 - h, s, s + h0
            padw, padh = box[:2]
            x1, y1, x2, y2 = (max(v, 0) for v in box)
            img3[y1:y2, x1:x2] = img[y1 - padh:, x1 - padw:]
            # labels in the 2s cropped frame (same border shift as _mosaic9)
            mosaic_labels.append(self._update_labels(patch, padw + self.border[0], padh + self.border[1]))
        final = self._cat_labels(mosaic_labels)
        final["img"] = img3[-self.border[0]: self.border[0], -self.border[1]: self.border[1]]
        return final

    def _mosaic4(self, labels):
        mosaic_labels = []
        s = self.imgsz
        yc, xc = (int(random.uniform(-x, 2 * s + x)) for x in self.border)
        img4 = None
        for i in range(4):
            patch = labels if i == 0 else labels["mix_labels"][i - 1]
            img = patch["img"]
            h, w = patch.pop("resized_shape")
            if img4 is None:
                img4 = np.full((s * 2, s * 2, img.shape[2]), 114, dtype=np.uint8)
            # canvas window (c*) anchored at the shared center (xc, yc); source
            # window (s*) is whatever of the tile fits (identical arithmetic to
            # reference augment.py:243-258, canvas/source names for a/b)
            if i == 0:  # top-left
                cx1, cy1, cx2, cy2 = max(xc - w, 0), max(yc - h, 0), xc, yc
                sx1, sy1, sx2, sy2 = w - (cx2 - cx1), h - (cy2 - cy1), w, h
            elif i == 1:  # top-right
                cx1, cy1, cx2, cy2 = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                sx1, sy1, sx2, sy2 = 0, h - (cy2 - cy1), min(w, cx2 - cx1), h
            elif i == 2:  # bottom-left
                cx1, cy1, cx2, cy2 = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                sx1, sy1, sx2, sy2 = w - (cx2 - cx1), 0, w, min(cy2 - cy1, h)
            else:  # bottom-right
                cx1, cy1, cx2, cy2 = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                sx1, sy1, sx2, sy2 = 0, 0, min(w, cx2 - cx1), min(cy2 - cy1, h)
            img4[cy1:cy2, cx1:cx2] = img[sy1:sy2, sx1:sx2]
            padw, padh = cx1 - sx1, cy1 - sy1
            mosaic_labels.append(self._update_labels(patch, padw, padh))
        final = self._cat_labels(mosaic_labels)
        final["img"] = img4
        return final

    def _mosaic9(self, labels):
        mosaic_labels = []
        s = self.imgsz
        hp, wp = -1, -1
        img9 = None
        for i in range(9):
            patch = labels if i == 0 else labels["mix_labels"][i - 1]
            img = patch["img"]
            h, w = patch.pop("resized_shape")
            # spiral placement box on the 3s canvas (identical arithmetic to
            # reference augment.py:304-324; h0/w0 = first tile, hp/wp = previous)
            if i == 0:
                img9 = np.full((s * 3, s * 3, img.shape[2]), 114, dtype=np.uint8)
                h0, w0 = h, w
                box = s, s, s + w, s + h
            elif i == 1:
                box = s, s - h, s + w, s
            elif i == 2:
                box = s + wp, s - h, s + wp + w, s
            elif i == 3:
                box = s + w0, s, s + w0 + w, s + h
            elif i == 4:
                box = s + w0, s + hp, s + w0 + w, s + hp + h
            elif i == 5:
                box = s + w0 - w, s + h0, s + w0, s + h0 + h
            elif i == 6:
                box = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
            elif i == 7:
                box = s - w, s + h0 - h, s, s + h0
            else:
                box = s - w, s + h0 - hp - h, s, s + h0 - hp
            padw, padh = box[:2]
            x1, y1, x2, y2 = (max(v, 0) for v in box)
            img9[y1:y2, x1:x2] = img[y1 - padh :, x1 - padw :]
            hp, wp = h, w
            # labels live in the 2s center-cropped frame, so the (negative)
            # border shifts into the pad offsets (reference augment.py:340-341)
            mosaic_labels.append(self._update_labels(patch, padw + self.border[0], padh + self.border[1]))
        final = self._cat_labels(mosaic_labels)
        final["img"] = img9[-self.border[0] : self.border[0], -self.border[1] : self.border[1]]
        return final

    @staticmethod
    def _update_labels(labels, padw, padh):
        nh, nw = labels["img"].shape[:2]
        labels["instances"].convert_bbox(format="xyxy")
        labels["instances"].denormalize(nw, nh)
        labels["instances"].add_padding(padw, padh)
        return labels

    def _cat_labels(self, mosaic_labels):
        if not mosaic_labels:
            return {}
        imgsz = self.imgsz * 2
        cls = np.concatenate([lb["cls"] for lb in mosaic_labels], 0)
        instances = Instances.concatenate([lb["instances"] for lb in mosaic_labels], axis=0)
        instances.clip(imgsz, imgsz)
        good = instances.remove_zero_area_boxes()
        final = {
            "im_file": mosaic_labels[0]["im_file"],
            "ori_shape": mosaic_labels[0]["ori_shape"],
            "resized_shape": (imgsz, imgsz),
            "cls": cls[good],
            "instances": instances,
            "mosaic_border": self.border,
        }
        return final


class MixUp(BaseMixTransform):
    """Beta(32, 32) image blending (reference augment.py:382-410)."""

    def _mix_transform(self, labels):
        r = np.random.beta(32.0, 32.0)
        labels2 = labels["mix_labels"][0]
        labels["img"] = (labels["img"] * r + labels2["img"] * (1 - r)).astype(np.uint8)
        labels["instances"] = Instances.concatenate([labels["instances"], labels2["instances"]], axis=0)
        labels["cls"] = np.concatenate([labels["cls"], labels2["cls"]], 0)
        return labels


class CopyPaste:
    """Flip-mode copy-paste: mirror instances and paste them back (augment.py:702-788)."""

    def __init__(self, p=0.5, mode="flip"):
        self.p = p
        self.mode = mode

    def __call__(self, labels):
        if self.p == 0 or len(labels["instances"]) == 0:
            return labels
        im = labels["img"]
        cls = labels["cls"]
        h, w = im.shape[:2]
        instances = labels.pop("instances")
        instances.convert_bbox(format="xyxy")
        instances.denormalize(w, h)
        ins_flip = deepcopy(instances)
        ins_flip.fliplr(w)
        from yololite_tpu.ops.boxes import bbox_ioa

        # intersection over the EXISTING box's area, like reference CopyPaste (augment.py:726)
        ioa = bbox_ioa(ins_flip.bboxes, instances.bboxes)  # (N, N)
        idx = np.nonzero((ioa < 0.30).all(1))[0]
        n = len(idx)
        sel = random.sample(list(idx), k=round(self.p * n)) if n else []
        if sel:
            cls = np.concatenate((cls, cls[sel]), axis=0)
            instances = Instances.concatenate((instances, ins_flip[sel]), axis=0)
            im_new = np.zeros(im.shape, np.uint8)
            for j in sel:
                x1, y1, x2, y2 = ins_flip.bboxes[j].astype(int)
                cv2.rectangle(im_new, (x1, y1), (x2, y2), (1, 1, 1), cv2.FILLED)
            result = cv2.flip(im, 1)
            i = cv2.flip(im_new, 1).astype(bool)
            im[i] = result[i]
        labels["img"] = im
        labels["cls"] = cls
        labels["instances"] = instances
        return labels


class RandomPerspective:
    """Affine warp (translate/scale/rotate/shear/perspective) with box transform
    and candidate filtering (reference augment.py:448-543)."""

    def __init__(self, degrees=0.0, translate=0.1, scale=0.5, shear=0.0, perspective=0.0,
                 border=(0, 0), pre_transform=None):
        self.degrees, self.translate, self.scale = degrees, translate, scale
        self.shear, self.perspective = shear, perspective
        self.border, self.pre_transform = border, pre_transform

    def affine_transform(self, img, border):
        """Compose M = T@S@R@P@C. The draw ORDER (perspective, angle, scale,
        shear x2, translate x2) is part of the seeded-stream contract."""
        u = random.uniform
        eye3 = lambda: np.eye(3, dtype=np.float32)

        C = eye3()  # center to origin
        C[:2, 2] = -img.shape[1] / 2, -img.shape[0] / 2
        P = eye3()  # perspective
        P[2, :2] = u(-self.perspective, self.perspective), u(-self.perspective, self.perspective)
        R = eye3()  # rotation+scale
        a, s = u(-self.degrees, self.degrees), u(1 - self.scale, 1 + self.scale)
        R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
        S = eye3()  # shear (degrees -> tangent)
        S[0, 1], S[1, 0] = (math.tan(u(-self.shear, self.shear) * math.pi / 180) for _ in range(2))
        T = eye3()  # translate, in output-canvas units
        T[:2, 2] = [u(0.5 - self.translate, 0.5 + self.translate) * d for d in self.size]
        M = T @ S @ R @ P @ C
        if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
            warp = cv2.warpPerspective if self.perspective else cv2.warpAffine
            img = warp(img, M if self.perspective else M[:2], dsize=self.size,
                       borderValue=(114, 114, 114))
        return img, M, s

    def apply_bboxes(self, bboxes, M):
        n = len(bboxes)
        if n == 0:
            return bboxes
        xy = np.ones((n * 4, 3), dtype=bboxes.dtype)
        xy[:, :2] = bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if self.perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        return np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1)), dtype=bboxes.dtype).reshape(4, n).T

    def __call__(self, labels):
        if self.pre_transform and "mosaic_border" not in labels:
            labels = self.pre_transform(labels)
        labels.pop("ratio_pad", None)
        img = labels["img"]
        cls = labels["cls"]
        instances = labels.pop("instances")
        instances.convert_bbox(format="xyxy")
        instances.denormalize(*img.shape[:2][::-1])

        border = labels.pop("mosaic_border", self.border)
        self.size = img.shape[1] + border[1] * 2, img.shape[0] + border[0] * 2
        img, M, scale = self.affine_transform(img, border)
        bboxes = self.apply_bboxes(instances.bboxes, M)
        new_instances = Instances(bboxes, bbox_format="xyxy", normalized=False)
        new_instances.clip(*self.size)

        instances.scale(scale_w=scale, scale_h=scale, bbox_only=True)
        i = self.box_candidates(box1=instances.bboxes.T, box2=new_instances.bboxes.T, area_thr=0.10)
        labels["instances"] = new_instances[i]
        labels["cls"] = cls[i]
        labels["img"] = img
        labels["resized_shape"] = img.shape[:2]
        return labels

    @staticmethod
    def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
        w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
        w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
        ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
        return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


class RandomHSV:
    """LUT-based hue/sat/value jitter (reference augment.py:545-576)."""

    def __init__(self, hgain=0.5, sgain=0.5, vgain=0.5):
        self.hgain, self.sgain, self.vgain = hgain, sgain, vgain

    def __call__(self, labels):
        img = labels["img"]
        if self.hgain or self.sgain or self.vgain:
            r = np.random.uniform(-1, 1, 3) * [self.hgain, self.sgain, self.vgain] + 1
            hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
            dtype = img.dtype
            x = np.arange(0, 256, dtype=r.dtype)
            luts = (((x * r[0]) % 180).astype(dtype),          # hue wraps at 180
                    np.clip(x * r[1], 0, 255).astype(dtype),   # sat
                    np.clip(x * r[2], 0, 255).astype(dtype))   # val
            im_hsv = cv2.merge(tuple(cv2.LUT(ch, lut) for ch, lut in zip((hue, sat, val), luts)))
            cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=img)
        return labels


class RandomFlip:
    """Horizontal/vertical flip with box update (reference augment.py:578-610)."""

    def __init__(self, p=0.5, direction="horizontal"):
        assert direction in ("horizontal", "vertical")
        self.p, self.direction = p, direction

    def __call__(self, labels):
        img = labels["img"]
        instances = labels.pop("instances")
        instances.convert_bbox(format="xywh")
        h, w = (1, 1) if instances.normalized else img.shape[:2]
        if self.direction == "vertical" and random.random() < self.p:
            img = np.flipud(img)
            instances.flipud(h)
        if self.direction == "horizontal" and random.random() < self.p:
            img = np.fliplr(img)
            instances.fliplr(w)
        labels["img"] = np.ascontiguousarray(img)
        labels["instances"] = instances
        return labels


class LetterBox:
    """Label-aware letterbox wrapping the image-only implementation."""

    def __init__(self, new_shape=(640, 640), auto=False, scale_fill=False, scaleup=True, center=True, stride=32):
        self.lb = _ImgLetterBox(new_shape, auto=auto, scale_fill=scale_fill, scaleup=scaleup, center=center,
                                stride=stride)
        self.new_shape = self.lb.new_shape
        self.center = center

    def __call__(self, labels=None, image=None):
        if labels is None:
            labels = {}
        img = labels.get("img") if image is None else image
        shape = img.shape[:2]
        new_shape = labels.pop("rect_shape", self.new_shape)
        if isinstance(new_shape, int):
            new_shape = (new_shape, new_shape)
        r, new_unpad, (dw, dh) = self.lb.params(shape, tuple(new_shape))
        ratio = (r, r) if r is not None else (new_shape[1] / shape[1], new_shape[0] / shape[0])
        if shape[::-1] != new_unpad:
            img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
        top = int(round(dh - 0.1)) if self.center else 0
        bottom = int(round(dh + 0.1))
        left = int(round(dw - 0.1)) if self.center else 0
        right = int(round(dw + 0.1))
        img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(114, 114, 114))
        if labels.get("ratio_pad"):
            labels["ratio_pad"] = (labels["ratio_pad"], (left, top))
        if len(labels):
            labels["instances"].convert_bbox(format="xyxy")
            labels["instances"].denormalize(*shape[::-1])
            labels["instances"].scale(*ratio)
            labels["instances"].add_padding(left, top)
            labels["img"] = img
            labels["resized_shape"] = tuple(new_shape)
            return labels
        return img


class Format:
    """Final packaging: HWC BGR uint8 -> RGB uint8, normalized xywh boxes.

    TPU variant of reference augment.py:904-956: images stay NHWC (no CHW
    transpose) since the model consumes channel-last, and stay uint8 — the
    /255 float normalization runs ON DEVICE fused into the train/val step's
    first cast (reference does img.float()/255 on device too, trainer.py:424),
    so host->device transfers move 1 byte/px instead of 4. Bit-identical:
    the augmentation pipeline is uint8 end-to-end, and f32(v)/255 rounds the
    same whether the division runs on host or device.
    """

    def __init__(self, bbox_format="xywh", normalize=True, batch_idx=True, bgr=0.0):
        self.bbox_format, self.normalize = bbox_format, normalize
        self.batch_idx, self.bgr = batch_idx, bgr

    def __call__(self, labels):
        img, cls, instances = (labels.pop(k) for k in ("img", "cls", "instances"))
        h, w = img.shape[:2]
        instances.convert_bbox(format=self.bbox_format)
        instances.denormalize(w, h)
        nl = len(instances)

        keep_bgr = self.bgr and random.random() < self.bgr
        im = img if keep_bgr else img[..., ::-1]  # BGR -> RGB
        labels["img"] = np.ascontiguousarray(im)
        labels["cls"] = np.asarray(cls, np.float32).reshape(nl, -1)[:, :1] if nl else np.zeros((0, 1), np.float32)
        bboxes = instances.bboxes.astype(np.float32) if nl else np.zeros((0, 4), np.float32)
        if self.normalize and nl:
            bboxes = bboxes.copy()
            bboxes[:, [0, 2]] /= w
            bboxes[:, [1, 3]] /= h
        labels["bboxes"] = bboxes
        if self.batch_idx:
            labels["batch_idx"] = np.zeros(nl, np.float32)
        return labels


class Albumentations:
    """Optional albumentations pixel/spatial augmentations (reference augment.py:790-901).

    Degrades to a no-op when the package is absent (it is not bundled in this
    environment). When available, applies the reference's default recipe: Blur,
    MedianBlur, ToGray, CLAHE at p=0.01 (brightness/gamma/compression at p=0).
    """

    _SPATIAL = frozenset({
        "Affine", "BBoxSafeRandomCrop", "CenterCrop", "CoarseDropout", "Crop", "CropAndPad",
        "CropNonEmptyMaskIfExists", "D4", "ElasticTransform", "Flip", "GridDistortion",
        "GridDropout", "HorizontalFlip", "Lambda", "LongestMaxSize", "MaskDropout", "MixUp",
        "Morphological", "NoOp", "OpticalDistortion", "PadIfNeeded", "Perspective",
        "PiecewiseAffine", "PixelDropout", "RandomCrop", "RandomCropFromBorders",
        "RandomGridShuffle", "RandomResizedCrop", "RandomRotate90", "RandomScale",
        "RandomSizedBBoxSafeCrop", "RandomSizedCrop", "Resize", "Rotate", "SafeRotate",
        "ShiftScaleRotate", "SmallestMaxSize", "Transpose", "VerticalFlip", "XYMasking",
    })

    def __init__(self, p=1.0):
        self.p = p
        self.transform = None
        self.contains_spatial = False
        try:
            import albumentations as A
        except ImportError:
            return  # optional dependency absent: no-op
        try:
            recipe = [t(p=0.01) for t in (A.Blur, A.MedianBlur, A.ToGray, A.CLAHE)]
            recipe += [A.RandomBrightnessContrast(p=0.0), A.RandomGamma(p=0.0),
                       A.ImageCompression(quality_lower=75, p=0.0)]
            self.contains_spatial = any(t.__class__.__name__ in self._SPATIAL for t in recipe)
            if self.contains_spatial:
                self.transform = A.Compose(
                    recipe, bbox_params=A.BboxParams(format="yolo", label_fields=["class_labels"])
                )
            else:
                self.transform = A.Compose(recipe)
            LOGGER.info("albumentations: " + ", ".join(str(t) for t in recipe if t.p))
        except Exception as e:  # version/API mismatch: degrade to no-op
            LOGGER.info(f"albumentations: {e}")

    def __call__(self, labels):
        if self.transform is None or random.random() > self.p:
            return labels
        if not self.contains_spatial:
            labels["img"] = self.transform(image=labels["img"])["image"]
            return labels
        cls = labels["cls"]
        if len(cls):
            im = labels["img"]
            labels["instances"].convert_bbox("xywh")
            labels["instances"].normalize(*im.shape[:2][::-1])
            bboxes = labels["instances"].bboxes
            new = self.transform(image=im, bboxes=bboxes, class_labels=cls)
            if len(new["class_labels"]) > 0:
                labels["img"] = new["image"]
                labels["cls"] = np.array(new["class_labels"])
                bboxes = np.array(new["bboxes"], dtype=np.float32)
            labels["instances"].update(bboxes=bboxes)
        return labels


def v8_transforms(dataset, imgsz, hyp, stretch=False):
    """Standard YOLO training pipeline (reference augment.py:958-1006)."""
    mosaic = Mosaic(dataset, imgsz=imgsz, p=hyp.mosaic)
    affine = RandomPerspective(
        degrees=hyp.degrees, translate=hyp.translate, scale=hyp.scale, shear=hyp.shear,
        perspective=hyp.perspective,
        pre_transform=None if stretch else LetterBox(new_shape=(imgsz, imgsz)),
    )
    pre_transform = Compose([mosaic, affine])
    if hyp.copy_paste_mode == "flip":
        pre_transform.insert(1, CopyPaste(p=hyp.copy_paste, mode=hyp.copy_paste_mode))
    return Compose(
        [
            pre_transform,
            MixUp(dataset, pre_transform=pre_transform, p=hyp.mixup),
            Albumentations(p=1.0),
            RandomHSV(hgain=hyp.hsv_h, sgain=hyp.hsv_s, vgain=hyp.hsv_v),
            RandomFlip(direction="vertical", p=hyp.flipud),
            RandomFlip(direction="horizontal", p=hyp.fliplr),
        ]
    )
