"""yololite_tpu: a TPU-native (JAX/XLA/Pallas) YOLO11 detection framework.

Same public API surface as the reference YOLO-Lite (predict/val/train via a
single facade class), re-designed TPU-first: NHWC functional model, on-device
decode + NMS, jitted train step, mesh-sharded data parallelism.
"""

__version__ = "0.1.0"

from yololite_tpu.engine.model import YOLOLite

YOLO = YOLOLite  # convenience alias

__all__ = ("YOLOLite", "YOLO", "__version__")
