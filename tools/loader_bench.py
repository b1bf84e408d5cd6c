"""Host data-pipeline throughput: images/sec out of the train DataLoader.

The jitted train step is targeting >=1,000 img/s at bs=64 (VERDICT r3 #3); the
host augmentation pipeline (mosaic + affine + HSV + flip + format, reference
data/augment.py) must sustain that rate or the device starves. coco8 is tiny so
every image is cache/RAM-buffer hot -- this measures pure transform + collate
cost, which is the steady-state regime (the RAM buffer covers coco-scale too).

Usage: python tools/loader_bench.py [batch] [imgsz] [workers] [nbatches]
Runs entirely on host (no jax device use).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch=64, imgsz=640, workers=8, nbatches=40):
    batch, imgsz, workers, nbatches = int(batch), int(imgsz), int(workers), int(nbatches)
    from yololite_tpu.cfg import get_cfg
    from yololite_tpu.data.dataset import build_yolo_dataset, build_dataloader
    from yololite_tpu.data.utils import check_det_dataset

    args = get_cfg(overrides={"mode": "train", "imgsz": imgsz, "workers": workers})
    data = check_det_dataset("/root/reference/coco8/coco8.yaml")
    ds = build_yolo_dataset(args, data["train"], batch, data, mode="train")
    dl = build_dataloader(ds, batch, workers, shuffle=True, seed=0)

    def batches():
        while True:  # coco8 is 1 batch/epoch at bs>=4: loop epochs
            yield from dl

    it = batches()
    # warm: first batches pay cv2 thread spin-up + RAM buffer fill
    for _ in range(4):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(nbatches):
        b = next(it)
        n += b["img"].shape[0]
    dt = time.perf_counter() - t0
    print(f"loader: {n / dt:.1f} img/s (bs={batch}, imgsz={imgsz}, workers={workers}, "
          f"{dt / nbatches * 1e3:.1f} ms/batch)")
    return n / dt


if __name__ == "__main__":
    main(*sys.argv[1:])
