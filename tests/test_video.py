"""Video source -> predict -> annotated video output (full media pipeline)."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
def test_video_predict_writes_mp4(tmp_path):
    import cv2
    import sys
    import torch

    sys.path.insert(0, str(REFERENCE))
    from tests.test_model_parity import _build_reference_model

    # tiny 6-frame video
    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(6):
        vw.write(rng.integers(0, 255, (96, 128, 3), np.uint8))
    vw.release()
    assert vid.exists()

    tm = _build_reference_model("n")
    tm.args = {"imgsz": 160}
    pt = tmp_path / "yolo11n.pt"
    torch.save({"model": tm, "train_args": {"imgsz": 160}}, str(pt))

    from yololite_tpu import YOLOLite

    m = YOLOLite(str(pt))
    results = m.predict(str(vid), conf=0.5, imgsz=160, verbose=False, save=True,
                        project=str(tmp_path / "runs"), name="vid", exist_ok=True)
    assert len(results) == 6
    out = tmp_path / "runs" / "vid" / "clip.mp4"
    assert out.exists() and out.stat().st_size > 0

    # stream=True generator API
    gen = m.predict(str(vid), conf=0.5, imgsz=160, verbose=False, save=False, stream=True)
    count = sum(1 for _ in gen)
    assert count == 6
