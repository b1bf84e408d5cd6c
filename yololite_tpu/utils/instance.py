"""Numpy box containers used by the data/augmentation pipeline.

Behavioral counterpart of reference utils/instance.py:27-271 (detection subset:
horizontal boxes, no segments/keypoints).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from yololite_tpu.ops.boxes import ltwh2xyxy, xywh2xyxy, xyxy2ltwh, xyxy2xywh

_FORMATS = ("xyxy", "xywh", "ltwh")


class Bboxes:
    """A set of boxes in one of xyxy / xywh / ltwh formats."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if self.format == format:
            return
        if self.format == "xyxy":
            func = xyxy2xywh if format == "xywh" else xyxy2ltwh
        elif self.format == "xywh":
            func = xywh2xyxy if format == "xyxy" else lambda b: xyxy2ltwh(xywh2xyxy(b))
        else:
            func = ltwh2xyxy if format == "xyxy" else lambda b: xyxy2xywh(ltwh2xyxy(b))
        self.bboxes = func(self.bboxes)
        self.format = format

    def areas(self) -> np.ndarray:
        b = self.bboxes
        if self.format == "xyxy":
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return b[:, 2] * b[:, 3]

    def mul(self, scale):
        """Scale coords by (sx, sy, sx2, sy2) or a scalar."""
        if not isinstance(scale, (tuple, list)):
            scale = (scale,) * 4
        self.bboxes[:, 0] *= scale[0]
        self.bboxes[:, 1] *= scale[1]
        self.bboxes[:, 2] *= scale[2]
        self.bboxes[:, 3] *= scale[3]

    def add(self, offset):
        """Offset coords by (ox, oy, ox2, oy2) or a scalar."""
        if not isinstance(offset, (tuple, list)):
            offset = (offset,) * 4
        self.bboxes[:, 0] += offset[0]
        self.bboxes[:, 1] += offset[1]
        self.bboxes[:, 2] += offset[2]
        self.bboxes[:, 3] += offset[3]

    def __len__(self):
        return len(self.bboxes)

    @classmethod
    def concatenate(cls, boxes_list: Sequence["Bboxes"], axis=0) -> "Bboxes":
        assert boxes_list
        fmt = boxes_list[0].format
        for b in boxes_list:
            b.convert(fmt)
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis=axis), fmt)

    def __getitem__(self, index) -> "Bboxes":
        b = self.bboxes[index]
        return Bboxes(b if b.ndim == 2 else b[None], self.format)


class Instances:
    """Boxes + normalization flag, with the geometry ops augmentation needs."""

    def __init__(self, bboxes: np.ndarray, segments=None, keypoints=None, bbox_format="xywh", normalized=True):
        self._bboxes = Bboxes(np.asarray(bboxes, dtype=np.float32).reshape(-1, 4), format=bbox_format)
        self.normalized = normalized
        self.segments = np.zeros((len(self._bboxes), 0, 2), np.float32) if segments is None else segments
        self.keypoints = keypoints

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format):
        self._bboxes.convert(format)

    def scale(self, scale_w, scale_h, bbox_only=False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))

    def denormalize(self, w, h):
        if not self.normalized:
            return
        self._bboxes.mul((w, h, w, h))
        self.normalized = False

    def normalize(self, w, h):
        if self.normalized:
            return
        self._bboxes.mul((1 / w, 1 / h, 1 / w, 1 / h))
        self.normalized = True

    def add_padding(self, padw, padh):
        assert not self.normalized, "denormalize before adding padding"
        if self._bboxes.format == "xyxy":
            self._bboxes.add((padw, padh, padw, padh))
        else:  # xywh/ltwh: offset center/corner only
            self._bboxes.add((padw, padh, 0, 0))

    def clip(self, w, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        self.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)

    def flipud(self, h):
        if self._bboxes.format == "xyxy":
            y1 = self.bboxes[:, 1].copy()
            y2 = self.bboxes[:, 3].copy()
            self.bboxes[:, 1] = h - y2
            self.bboxes[:, 3] = h - y1
        else:
            self.bboxes[:, 1] = h - self.bboxes[:, 1]

    def fliplr(self, w):
        if self._bboxes.format == "xyxy":
            x1 = self.bboxes[:, 0].copy()
            x2 = self.bboxes[:, 2].copy()
            self.bboxes[:, 0] = w - x2
            self.bboxes[:, 2] = w - x1
        else:
            self.bboxes[:, 0] = w - self.bboxes[:, 0]

    def remove_zero_area_boxes(self) -> np.ndarray:
        """Drop boxes with zero area after clipping; returns the keep mask."""
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
        return good

    def update(self, bboxes, segments=None, keypoints=None):
        self._bboxes = Bboxes(bboxes, format=self._bboxes.format)

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, index) -> "Instances":
        return Instances(
            self.bboxes[index] if np.ndim(self.bboxes[index]) == 2 else self.bboxes[index][None],
            bbox_format=self._bboxes.format,
            normalized=self.normalized,
        )

    @classmethod
    def concatenate(cls, instances_list: Sequence["Instances"], axis=0) -> "Instances":
        assert instances_list
        norm = instances_list[0].normalized
        fmt = instances_list[0]._bboxes.format
        for ins in instances_list:
            ins.convert_bbox(fmt)
            assert ins.normalized == norm
        cat = np.concatenate([ins.bboxes for ins in instances_list], axis=axis)
        return cls(cat, bbox_format=fmt, normalized=norm)
