"""End-to-end mAP parity harness: our validator vs the reference's, same weights.

The BASELINE.json headline: "coco8 mAP50-95 within 1e-3 of the PyTorch reference".
The pretrained yolo11n.pt is absent from the mount, so weights come from a
checkpoint trained by THIS framework (tools-level flow):

  1. load a native .npz checkpoint (e.g. /tmp/tpu_runs/overfit/weights/last.npz)
  2. export to a reference-format .pt via pytree_to_state_dict
  3. run the REFERENCE val stack end-to-end (its dataloader, letterbox, NMS --
     torchvision.ops.nms is absent from this image, so a semantics-exact greedy
     torch implementation is injected)
  4. run OUR validator with the same weights
  5. compare mAP

Usage: python tools/parity_eval.py [ckpt.npz] [imgsz]
"""

from __future__ import annotations

import os
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REFERENCE = Path("/root/reference")


def install_torchvision_stub():
    """Provide torchvision.ops.nms with exact torchvision semantics (greedy,
    score-descending, suppress IoU strictly greater than the threshold)."""
    import torch

    def nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou_threshold: float) -> "torch.Tensor":
        idx = scores.argsort(descending=True)
        keep = []
        while idx.numel() > 0:
            i = idx[0]
            keep.append(int(i))
            if idx.numel() == 1:
                break
            rest = idx[1:]
            b1 = boxes[i]
            b2 = boxes[rest]
            lt = torch.maximum(b1[:2], b2[:, :2])
            rb = torch.minimum(b1[2:], b2[:, 2:])
            inter = (rb - lt).clamp(min=0).prod(dim=1)
            area1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
            iou = inter / (area1 + area2 - inter + 1e-7)
            idx = rest[iou <= iou_threshold]
        return torch.tensor(keep, dtype=torch.long)

    tv = types.ModuleType("torchvision")
    tv.ops = types.SimpleNamespace(nms=nms)
    tv.__version__ = "0.0-stub"
    sys.modules["torchvision"] = tv
    return tv


def stage_coco8() -> str:
    """Copy coco8 to a writable dir with an absolute-path yaml (the reference
    resolves relative dataset paths against cwd and writes label caches)."""
    import shutil

    work = Path("/tmp/coco8_work")
    if not (work / "coco8.yaml").exists():
        shutil.copytree(REFERENCE / "coco8", work, dirs_exist_ok=True)
        y = (work / "coco8.yaml").read_text()
        y = y.replace("path: ../coco8", f"path: {work}")
        (work / "coco8.yaml").write_text(y)
        for stale in work.rglob("*.cache*"):  # shipped caches predate the reference's cache version
            stale.unlink()
    return str(work / "coco8.yaml")


def main(ckpt="/tmp/tpu_runs/overfit/weights/last.npz", imgsz=320, split="val",
         artifact=None):
    imgsz = int(imgsz)
    import numpy as np

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    if os.environ.get("PARITY_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    import torch

    install_torchvision_stub()
    sys.path.insert(0, str(REFERENCE))

    from yololite_tpu.models.checkpoint import attempt_load_one_weight, pytree_to_state_dict

    model, params, state, meta = attempt_load_one_weight(ckpt)
    sd = pytree_to_state_dict(params, state)

    # ---- reference stack ----
    from tests.test_model_parity import _build_reference_model

    cfg = meta.get("cfg", "yolo11n.yaml")
    if isinstance(cfg, dict):  # trainer meta stores the full yaml dict (trainer._train_meta)
        scale = cfg.get("scale") or "n"
    else:
        scale = cfg.replace("yolo11", "").replace(".yaml", "") or "n"
    tm = _build_reference_model(scale)
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, strict=False
    )
    real_missing = [m for m in missing if "num_batches" not in m and "dfl" not in m]
    assert not real_missing, f"missing keys: {real_missing[:5]}"
    tm.args = {"imgsz": imgsz}
    tm.names = model.names
    pt = "/tmp/parity_export.pt"
    data_yaml = stage_coco8()
    torch.save({"model": tm, "train_args": {"imgsz": imgsz, "data": data_yaml}}, pt)

    # Latent reference bug: AutoBackend calls model.fuse() (autobackend.py:74) but
    # YOLO-Lite's DetectionModel never defines fuse/is_fused (stripped from
    # Ultralytics) -- standalone .pt val crashes upstream. Patch no-op fuse so the
    # reference stack can actually run.
    from yololite.nn.tasks import DetectionModel as RefDetectionModel

    if not hasattr(RefDetectionModel, "fuse"):
        RefDetectionModel.fuse = lambda self, verbose=False: self

    # Second latent reference bug: cache_labels (dataset.py:167-210) never writes a
    # "version" key, but get_labels (dataset.py:310) pops it unconditionally --
    # any freshly built label cache crashes. Patch version into fresh caches.
    from yololite.data.dataset import YOLODataset as RefDS

    _orig_cache = RefDS.cache_labels

    def _patched_cache(self, path=Path("./labels.cache")):
        x = _orig_cache(self, path)
        x.setdefault("version", "parity-patch")
        return x

    RefDS.cache_labels = _patched_cache

    import yololite.data.dataset as ref_dataset_mod

    _orig_load = ref_dataset_mod.load_dataset_cache_file

    def _patched_load(path):
        x = _orig_load(path)
        x.setdefault("version", "parity-patch")  # on-disk caches written by the buggy saver
        return x

    ref_dataset_mod.load_dataset_cache_file = _patched_load

    from yololite.engine.model import YOLOLite as RefYOLO

    ref_metrics = RefYOLO(pt).val(
        data=data_yaml, imgsz=imgsz, batch=4, plots=False, verbose=False, split=split,
        save_json=False, project="/tmp/parity_runs", name="ref", exist_ok=True, device="cpu",
    )
    ref_map = float(ref_metrics.box.map)
    ref_map50 = float(ref_metrics.box.map50)

    # ---- our stack ----
    from yololite_tpu import YOLOLite

    ours = YOLOLite(ckpt)
    my_metrics = ours.val(
        data=data_yaml, imgsz=imgsz, batch=4, rect=True, split=split,
        plots=False, verbose=False, project="/tmp/parity_runs", name="tpu", exist_ok=True,
    )
    my_map = float(my_metrics.box.map)
    my_map50 = float(my_metrics.box.map50)

    # bf16 bound: same weights through our half (bf16) predict path
    half_metrics = YOLOLite(ckpt).val(
        data=data_yaml, imgsz=imgsz, batch=4, rect=True, split=split, half=True,
        plots=False, verbose=False, project="/tmp/parity_runs", name="tpu_half", exist_ok=True,
    )
    half_map = float(half_metrics.box.map)
    half_map50 = float(half_metrics.box.map50)

    print(f"reference: mAP50-95={ref_map:.5f}  mAP50={ref_map50:.5f}")
    print(f"ours:      mAP50-95={my_map:.5f}  mAP50={my_map50:.5f}")
    print(f"ours bf16: mAP50-95={half_map:.5f}  mAP50={half_map50:.5f}")
    print(f"delta:     mAP50-95={abs(ref_map - my_map):.5f}  mAP50={abs(ref_map50 - my_map50):.5f}")
    print(f"delta b16: mAP50-95={abs(ref_map - half_map):.5f}  mAP50={abs(ref_map50 - half_map50):.5f}")
    if artifact:
        import json

        Path(artifact).write_text(json.dumps({
            "ckpt": str(ckpt), "imgsz": imgsz, "split": split,
            "reference": {"map50_95": ref_map, "map50": ref_map50},
            "ours_fp32": {"map50_95": my_map, "map50": my_map50},
            "ours_bf16": {"map50_95": half_map, "map50": half_map50},
            "delta_fp32": {"map50_95": abs(ref_map - my_map), "map50": abs(ref_map50 - my_map50)},
            "delta_bf16": {"map50_95": abs(ref_map - half_map), "map50": abs(ref_map50 - half_map50)},
            "target": "|delta fp32 mAP50-95| <= 1e-3 (BASELINE.json headline)",
            "pass_fp32": abs(ref_map - my_map) <= 1e-3,
        }, indent=1) + "\n")
        print(f"artifact: {artifact}")
    return ref_map, my_map


if __name__ == "__main__":
    args = sys.argv[1:]
    if args:
        main(*args)
    else:
        main(artifact=str(Path(__file__).resolve().parents[1] / "PARITY_r05.json"))
