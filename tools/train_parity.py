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


def main(epochs: int = 600, imgsz: int = 320):
    from yololite_tpu.engine.trainer import DetectionTrainer

    # Hard-overfit recipe: the auto-optimizer rule lands on AdamW at
    # lr=0.002*5/84=1.2e-4 (reference trainer.py:642-645), far too cold to
    # memorize 4 images in a one-batch epoch — the r5 first attempt finished
    # 250 epochs with box loss ~6 and ZERO detections on either val stack.
    # Explicit AdamW lr0=2e-3, constant-ish decay, and every geometric/color
    # augmentation off so each epoch descends the same 4-image batch.
    t = DetectionTrainer(overrides={
        "model": "yolo11n.yaml", "data": "/root/reference/coco8/coco8.yaml",
        "epochs": epochs, "imgsz": imgsz, "batch": 8, "workers": 0,
        "mode": "train", "project": "/tmp/tpu_runs", "name": "overfit",
        "exist_ok": True, "val": False, "plots": False, "save": True,
        "close_mosaic": epochs, "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0,
        "translate": 0.0, "scale": 0.0, "fliplr": 0.0, "flipud": 0.0,
        "degrees": 0.0, "shear": 0.0, "perspective": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
        # warmup_bias_lr MUST be zeroed with an explicit Adam-family pick: the
        # reference zeroes it only on the auto path (trainer.py:645), and 100
        # warmup iters of bias-lr 0.1 under AdamW drive the cls biases to -inf
        # -> all scores ~0 -> the TAL metric grid goes all-zero -> zero
        # foreground -> box/dfl loss exactly 0.000 (the r5 collapsed run).
        "optimizer": "AdamW", "lr0": 0.002, "lrf": 0.2, "warmup_epochs": 5.0,
        "warmup_bias_lr": 0.0, "amp": True, "save_period": -1,
    })
    t.train()
    print("saved:", t.save_dir / "weights" / "last.npz", flush=True)
    try:
        last = (t.save_dir / "results.csv").read_text().strip().splitlines()[-1]
        box = float(last.split(",")[1])
        if box == 0.0:
            print("WARNING: final box loss is exactly 0.0 — zero-foreground collapse, "
                  "checkpoint is background-only", flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a))
