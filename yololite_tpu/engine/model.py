"""YOLOLite facade: load / predict / val / train, same surface as the reference.

Counterpart of reference engine/model.py:17-146. Weights live in explicit pytrees
(params, state) owned by this object; engines receive them functionally.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Union

from yololite_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
from yololite_tpu.models.checkpoint import load_native, load_pt, save_native
from yololite_tpu.models.model import DetectionModel
from yololite_tpu.utils import LOGGER


class YOLOLite:
    """Facade: `YOLOLite('yolo11n.pt')(['img.jpg'])` / `.train(data=...)` / `.val()`."""

    def __init__(self, model: Union[str, Path] = "yolo11n.pt", task: str = "detect", verbose: bool = False):
        assert task == "detect", "only detection is supported"
        self.task = task
        self.overrides: Dict = {}
        self.metrics = None
        self.trainer = None
        self.predictor = None
        model = str(model).strip()
        self.ckpt_path = model
        if model.endswith((".yaml", ".yml")):
            self._new(model, verbose=verbose)
        elif model.endswith(".npz"):
            self._load_native(model)
        else:
            self._load(model)

    # ---- construction ----

    def _new(self, cfg: str, verbose: bool = False):
        self.model = DetectionModel(cfg, verbose=verbose)
        self.params, self.state = self.model.init(0)
        self.ckpt = None
        self.overrides["model"] = cfg
        self.overrides["task"] = self.task

    def _load(self, weights: str):
        if not Path(weights).exists():
            raise FileNotFoundError(
                f"checkpoint '{weights}' not found. Pass a yolo11[nslmx].yaml to build from scratch, "
                f"or a .pt/.npz checkpoint path."
            )
        if weights.endswith(".pt"):
            self.model, self.params, self.state, meta = load_pt(weights)
            self.ckpt = meta
            args = {k: v for k, v in (meta.get("args") or {}).items() if k in DEFAULT_CFG_DICT}
            args["model"] = weights
            args["task"] = self.task
            self.overrides = args
        else:
            raise ValueError(f"unsupported checkpoint format: {weights}")

    def _load_native(self, path: str):
        params, state, meta = load_native(path)
        if "model_state" in state:  # trainer checkpoints nest BN stats under model_state
            state = state["model_state"]
        cfg = meta.get("cfg", "yolo11n.yaml")
        self.model = DetectionModel(cfg, nc=meta.get("nc"))
        if meta.get("names"):
            self.model.names = {int(k): v for k, v in meta["names"].items()}
        self.params, self.state = params, state
        self.ckpt = meta
        self.overrides = {k: v for k, v in (meta.get("args") or {}).items() if k in DEFAULT_CFG_DICT}
        self.overrides.update({"model": path, "task": self.task})

    # ---- API ----

    @property
    def names(self):
        return self.model.names

    def __call__(self, source=None, stream: bool = False, **kwargs):
        return self.predict(source, stream, **kwargs)

    def predict(self, source=None, stream: bool = False, predictor=None, **kwargs):
        if source is None:
            raise ValueError("predict() requires a source (path, list, or array)")
        custom = {"conf": 0.25, "batch": 1, "save": True, "mode": "predict"}  # reference model.py:95
        args = {**self.overrides, **custom, **kwargs}
        from yololite_tpu.engine.predictor import DetectionPredictor

        # NMS/forward settings are baked into the compiled graph; rebuild when they change
        sig = tuple(args.get(k) if not isinstance(args.get(k), list) else tuple(args.get(k))
                    for k in ("conf", "iou", "max_det", "agnostic_nms", "augment", "half", "classes"))
        if self.predictor is None or predictor is not None or getattr(self.predictor, "_sig", None) != sig:
            self.predictor = (predictor or DetectionPredictor)(overrides=args)
            self.predictor.setup_model(self.model, self.params, self.state)
            self.predictor._sig = sig
        else:
            self.predictor.args = get_cfg(self.predictor.args, kwargs)
        return self.predictor(source=source, stream=stream)

    def embed(self, source, layers=None, imgsz: int = 640):
        """Return mean-pooled feature embeddings from the given layer indices.

        Counterpart of the reference's `embed` predict argument (predictor returns
        pooled feature tensors instead of detections).
        """
        import numpy as np
        import jax.numpy as jnp

        from yololite_tpu.models.modules import Ctx
        from yololite_tpu.ops.letterbox import preprocess_batch
        from yololite_tpu.data.build import load_inference_source

        layers = layers or [max(self.model.save)]
        dataset = load_inference_source(source, batch=1)
        out = []
        for paths, im0s, infos in dataset:
            im = preprocess_batch(im0s, imgsz=imgsz)
            ctx = Ctx(train=False, capture=layers)
            self.model.apply(self.params, self.state, jnp.asarray(im), ctx=ctx)
            pooled = [np.asarray(ctx.features[i].mean(axis=(1, 2))) for i in sorted(ctx.features)]
            out.append(np.concatenate(pooled, axis=-1))
        return out

    def val(self, validator=None, **kwargs):
        # rect=True mirrors the reference val default (model.py:101); shape buckets
        # compile once each and then cache
        custom = {"rect": True, "mode": "val"}
        args = {**self.overrides, **custom, **kwargs}
        from yololite_tpu.engine.validator import DetectionValidator

        v = (validator or DetectionValidator)(args=args)
        v(model=self.model, params=self.params, state=self.state)
        self.metrics = v.metrics
        return v.metrics

    def train(self, trainer=None, **kwargs):
        custom = {"mode": "train"}
        args = {**self.overrides, **custom, **kwargs}
        if args.get("resume"):
            args["resume"] = self.ckpt_path
        from yololite_tpu.engine.trainer import DetectionTrainer

        self.trainer = (trainer or DetectionTrainer)(overrides=args)
        if not args.get("resume"):
            self.trainer.set_model(self.model, self.params, self.state)
        self.trainer.train()
        # reload best weights after training (reference model.py:133-141)
        best = getattr(self.trainer, "best", None)
        if best and Path(best).exists():
            self._load_native(str(best))
        self.metrics = getattr(self.trainer, "metrics", None)
        return self.metrics

    def save(self, path: Union[str, Path]):
        """Save weights to the native .npz format."""
        meta = {
            # full yaml dict, not a stock-name guess: a custom architecture must
            # reload as itself (json-safe; DetectionModel accepts dicts)
            "cfg": dict(self.model.yaml),
            "nc": self.model.nc,
            "names": self.model.names,
            "args": self.overrides,
        }
        save_native(path, self.params, self.state, meta)
        return path

    def export(self, path: Union[str, Path] = None, imgsz: int = 640, batch: int = 1,
               half: bool = True, **kwargs):
        """Export the fused predict graph (forward+decode+NMS, weights baked in)
        as a serialized jax.export/StableHLO artifact for serving. See
        runtime/export.py for the input/output contract; reload with
        `yololite_tpu.runtime.load_exported(path)`."""
        from yololite_tpu.runtime.export import export_predict

        if path is None:
            path = Path(self.ckpt_path).with_suffix(".shlo").name
        return export_predict(self.model, self.params, self.state, path,
                              imgsz=imgsz, batch=batch, half=half, **kwargs)

    def info(self, imgsz: int = 640):
        n = self.model.num_params(self.params)
        g = self.model.gflops(self.params, self.state, imgsz)
        LOGGER.info(
            f"yolo11{self.model.yaml.get('scale', '?')}: {n:,} parameters, "
            f"{g:.1f} GFLOPs @{imgsz}, strides {self.model.strides}"
        )
        return {"params": n, "gflops": g, "strides": self.model.strides}
