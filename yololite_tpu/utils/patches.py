"""Unicode-safe cv2 image IO (counterpart of reference utils/patches.py:14-55).

`cv2.imread`/`cv2.imwrite` take the path through OpenCV's own C fopen, which
breaks on non-UTF8 locales and Windows wide paths. The reference routes the
bytes through numpy (`np.fromfile` / `ndarray.tofile`) and only hands cv2 an
in-memory buffer (`imdecode`/`imencode`); these helpers do the same. Unlike
the reference we do not monkey-patch the cv2 module globally — call sites
import these explicitly (no import-time side effects on third-party modules).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def imread(filename, flags: int = cv2.IMREAD_COLOR):
    """Read an image from any path cv2's C-side fopen might reject.

    Returns the decoded BGR array, or None on unreadable/undecodable input
    (matching cv2.imread's contract so existing None-checks keep working).
    """
    try:
        buf = np.fromfile(str(filename), np.uint8)
    except (OSError, FileNotFoundError):
        return None
    if buf.size == 0:
        return None
    return cv2.imdecode(buf, flags)


def imwrite(filename, img: np.ndarray, params=None) -> bool:
    """Write an image via imencode + tofile; returns success like cv2.imwrite."""
    try:
        ok, buf = cv2.imencode(Path(str(filename)).suffix, img, params or [])
        if not ok:
            return False
        buf.tofile(str(filename))
        return True
    except Exception:
        return False


def imshow(winname: str, mat: np.ndarray) -> None:
    """Display with a unicode-escaped window title (reference patches.py:48-55)."""
    cv2.imshow(winname.encode("unicode_escape").decode(), mat)
