"""Ahead-of-time export of the fused predict graph (jax.export / StableHLO).

Serializes forward + DFL decode + NMS — the exact graph the predictor ships
(engine/predictor.py) — into a self-contained artifact with the weights
embedded as constants, deployable without this package or the checkpoint.
The reference has no export path (Ultralytics' exporters were stripped); this
is the TPU-serving equivalent: one file a serving binary can `deserialize`
and `.call(images)`.

Artifacts are written as `<path>` (serialized jax.export bytes) plus
`<path>.json` (names/shape/threshold metadata for the host post-processing).
Multi-platform by default: the artifact lowers for both 'cpu' and 'tpu', so
the same file integration-tests on CPU and serves on TPU.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from yololite_tpu.utils import LOGGER


def export_predict(model, params, state, path, imgsz: int = 640, batch: int = 1,
                   half: bool = True, fuse: bool = True, conf: float = 0.25,
                   iou: float = 0.7, max_det: int = 300,
                   platforms: Tuple[str, ...] = ("cpu", "tpu"),
                   int8_calib: Optional[list] = None) -> Path:
    """Serialize the fused predict graph with weights baked in.

    Contract: input is a normalized float32 NHWC batch (batch, imgsz, imgsz, 3)
    (letterbox + /255 on the host or via ops.pallas_kernels.device_letterbox);
    output is (batch, max_det, 6) xyxy+conf+cls rows in input-pixel space,
    zero-padded — identical to the predictor's in-process graph.

    int8_calib: optional list of normalized NHWC float batches; when given the
    graph is post-training-quantized on them first (w8a8, models/quant.py) and
    the int8 weights are what gets baked in — the serving artifact for the
    predictor's `int8=True` path.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.nms import nms_from_feats

    if int8_calib is not None:
        from yololite_tpu.models.quant import quantize_model

        params, state, _ = quantize_model(model, params, state, int8_calib)  # fuses + bf16 state
    else:
        if fuse:
            params, state = fuse_tree(params, state)
        if half:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if np.issubdtype(np.asarray(x).dtype, np.floating) else x, t)
            params, state = cast(params), cast(state)
    # the predictor's candidate-pool rule (engine/predictor.py)
    max_cand = max(256 if conf >= 0.25 else 512, max_det)

    def fn(images):
        x = images.astype(jnp.bfloat16) if half else images
        feats = model.apply(params, state, x, train=False)
        return nms_from_feats(feats, model.strides, model.nc, model.reg_max,
                              conf_thres=conf, iou_thres=iou, max_det=max_det,
                              max_cand=max_cand, half=half)

    spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    blob = exported.serialize()

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(bytes(blob))
    meta = {
        "format": "jax.export/stablehlo",
        "platforms": list(platforms),
        "imgsz": imgsz, "batch": batch, "half": half, "int8": int8_calib is not None,
        "conf": conf, "iou": iou, "max_det": max_det,
        "nc": model.nc, "names": model.names,
        "input": f"float32[{batch},{imgsz},{imgsz},3] normalized NHWC",
        "output": f"float32[{batch},{max_det},6] xyxy+conf+cls, zero-padded",
    }
    Path(f"{path}.json").write_text(json.dumps(meta, indent=2))
    LOGGER.info(f"exported predict graph to {path} ({len(blob) / 1e6:.1f} MB) + {path}.json")
    return path


def load_exported(path) -> Tuple[callable, Dict]:
    """Load an exported artifact; returns (callable(images) -> (B, max_det, 6), meta)."""
    from jax import export as jexport

    path = Path(path)
    exported = jexport.deserialize(bytearray(path.read_bytes()))
    meta_path = Path(f"{path}.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return exported.call, meta
