"""Dataset utilities: yaml validation, label file verification, cache IO.

Counterpart of reference data/utils.py:51-198 (YOLO-txt label parsing semantics)
and check_det_dataset:121-176.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Dict, List, Tuple

import cv2
import numpy as np

from yololite_tpu.utils import LOGGER, yaml_load

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm", "heic"}


def img2label_paths(img_paths: List[str]) -> List[str]:
    """/images/ -> /labels/ and suffix -> .txt (reference data/utils.py:41-45)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def get_hash(paths: List[str]) -> str:
    """Size+name hash of a list of files (cache invalidation key)."""
    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.sha256(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def verify_image_label(im_file: str, lb_file: str, num_cls: int) -> Tuple:
    """Validate one image/label pair -> (im_file, cls (n,1), bboxes (n,4), shape, msg).

    Same checks as reference data/utils.py:51-96: image readability, min size,
    label 5-column float format, normalized 0-1 coords, class range, dedup.
    """
    msg = ""
    im = cv2.imread(im_file)
    if im is None:
        raise FileNotFoundError(f"cannot read image {im_file}")
    shape = im.shape[:2]  # (h, w)
    if shape[0] < 10 or shape[1] < 10:
        raise ValueError(f"image size {shape} <10 pixels: {im_file}")

    if os.path.isfile(lb_file):
        with open(lb_file, encoding="utf-8") as f:
            lb = [x.split() for x in f.read().strip().splitlines() if len(x)]
        lb = np.array(lb, dtype=np.float32) if lb else np.zeros((0, 5), np.float32)
    else:
        lb = np.zeros((0, 5), np.float32)
        msg = f"label missing: {lb_file}"

    nl = len(lb)
    if nl:
        if lb.shape[1] != 5:
            raise ValueError(f"labels require 5 columns, got {lb.shape[1]}: {lb_file}")
        if lb.min() < 0:
            raise ValueError(f"negative label values in {lb_file}")
        if lb[:, 1:].max() > 1:
            raise ValueError(f"non-normalized coordinates in {lb_file}")
        if int(lb[:, 0].max()) >= num_cls:
            raise ValueError(f"class {int(lb[:, 0].max())} exceeds nc={num_cls} in {lb_file}")
        _, idx = np.unique(lb, axis=0, return_index=True)
        if len(idx) < nl:
            lb = lb[np.sort(idx)]
            msg = f"removed {nl - len(idx)} duplicate labels: {lb_file}"
    return im_file, lb[:, 0:1], lb[:, 1:5], shape, msg


def check_det_dataset(dataset: str) -> Dict:
    """Resolve and validate a detection dataset yaml -> dict with abs paths.

    Mirrors reference data/utils.py:121-176 (path resolution relative to the yaml
    file, names dict, nc consistency) without the download machinery.
    """
    path = Path(dataset)
    candidates = [path, Path("/root/reference") / path.name, Path("/root/reference") / path]
    # also support "coco8/coco8.yaml"-style relative refs against the reference mount
    for c in list(candidates):
        if str(c).count("/") and not c.exists():
            candidates.append(Path("/root/reference") / Path(*Path(dataset).parts[-2:]))
    yaml_path = next((c for c in candidates if c.exists()), None)
    if yaml_path is None:
        raise FileNotFoundError(f"dataset yaml '{dataset}' not found (searched {candidates})")
    data = yaml_load(yaml_path, append_filename=True)

    if "val" not in data and "validation" not in data:
        raise SyntaxError("dataset yaml missing 'val' key")
    if "names" not in data and "nc" not in data:
        raise SyntaxError("dataset yaml must define 'names' or 'nc'")
    if isinstance(data.get("names"), (list, tuple)):
        data["names"] = dict(enumerate(data["names"]))
    if "names" not in data:
        data["names"] = {i: f"class_{i}" for i in range(data["nc"])}
    data["nc"] = len(data["names"])

    root = Path(data.get("path") or Path(data["yaml_file"]).parent)
    if not root.is_absolute():
        root = (Path(data["yaml_file"]).parent / root).resolve()
    data["path"] = root
    for k in ("train", "val", "test"):
        if data.get(k):
            data[k] = str(root / data[k]) if not Path(data[k]).is_absolute() else data[k]
    for k in ("train", "val"):
        if data.get(k) and not Path(data[k]).exists():
            raise FileNotFoundError(f"dataset '{k}' path does not exist: {data[k]}")
    return data
