"""Train the coco8 overfit checkpoint used by tools/parity_eval.py.

Produces /tmp/tpu_runs/overfit/weights/last.npz: yolo11n trained on the bundled
coco8 set (the only labeled data in the sandbox — reference ships it at
/root/reference/coco8) in the overfit regime, so the exported weights produce
real detections for the end-to-end mAP-parity comparison against the reference
val stack (/root/reference/yololite/engine/validator.py:93-179).

Usage: python tools/train_parity.py [epochs] [imgsz]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(epochs: int = 250, imgsz: int = 320):
    from yololite_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(overrides={
        "model": "yolo11n.yaml", "data": "/root/reference/coco8/coco8.yaml",
        "epochs": epochs, "imgsz": imgsz, "batch": 8, "workers": 0,
        "mode": "train", "project": "/tmp/tpu_runs", "name": "overfit",
        "exist_ok": True, "val": False, "plots": False, "save": True,
        "close_mosaic": epochs, "mosaic": 0.0, "amp": True,
        "save_period": -1,
    })
    t.train()
    print("saved:", t.save_dir / "weights" / "last.npz", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a))
