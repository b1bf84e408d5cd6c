"""Data layer: datasets, dataloaders, augmentation, inference sources."""

from yololite_tpu.data.build import Prefetcher, check_source, load_inference_source
from yololite_tpu.data.dataset import DataLoader, YOLODataset, build_dataloader, build_yolo_dataset
from yololite_tpu.data.utils import check_det_dataset, img2label_paths, verify_image_label

__all__ = (
    "YOLODataset",
    "DataLoader",
    "build_yolo_dataset",
    "build_dataloader",
    "load_inference_source",
    "check_source",
    "Prefetcher",
    "check_det_dataset",
    "img2label_paths",
    "verify_image_label",
)
