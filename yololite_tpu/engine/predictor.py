"""Streaming detection predictor: batched, double-buffered TPU pipeline.

TPU-first redesign of reference engine/predictor.py:21-323. The per-batch flow is
host letterbox (cv2) -> one jitted device graph (forward + DFL decode + NMS) ->
padded (B, max_det, 6) detections back to host -> rescale + Results. There is no
per-image Python NMS loop and no mid-graph host sync; incomplete batches are
padded to a fixed shape so the graph compiles once per (batch, imgsz).
"""

from __future__ import annotations

import functools
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.cfg import get_cfg, get_save_dir
from yololite_tpu.data.build import Prefetcher, load_inference_source
from yololite_tpu.data.loaders import VID_FORMATS
from yololite_tpu.engine.results import Results
from yololite_tpu.ops.decode import decode_detections
from yololite_tpu.ops.letterbox import preprocess_batch
from yololite_tpu.ops.nms import non_max_suppression
from yololite_tpu.ops.boxes import scale_boxes_np
from yololite_tpu.utils import LOGGER, colorstr
from yololite_tpu.utils.checks import check_imgsz
from yololite_tpu.utils.profile import Profile


# NOTE on deleted perf levers (flip-or-delete discipline, docs/PERF.md round 4):
# a fused Pallas decode+select, s2d/s4d space-to-depth stem relayouts, a fused
# two-conv stem kernel (both im2col-concat and sum-of-taps variants), and a
# Detect shared-input-read fold were each implemented, exactness-tested, and
# measured SLOWER than the plain XLA graph on v5e (decode: VPU-pass-bound;
# s2d 0.90x / s4d 0.92x e2e; fused stem 13.7 vs 2.7 ms/batch — MXU lane
# padding on the 48/64-wide contractions; detect fold 0.949x). Measurements:
# docs/r4_queue1_results.log + docs/PERF.md. The code was removed, not gated.


class DetectionPredictor:
    """Holds the jitted inference graph and the streaming loop state."""

    def __init__(self, cfg=None, overrides: Optional[Dict] = None):
        self.args = get_cfg(cfg or {}, None) if isinstance(cfg, dict) and not overrides else get_cfg(overrides=overrides)
        if self.args.conf is None:
            self.args.conf = 0.25
        self.save_dir = get_save_dir(self.args)
        self.model = None  # DetectionModel
        self.params = None
        self.state = None
        self.mesh = None
        self._quantized = False
        self.dataset = None
        self.results = None
        self.seen = 0
        self.windows = []
        self.speed = {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}
        self._lock = threading.Lock()
        self._infer = None
        self.done_warmup = False

    # ---- setup ----

    def setup_model(self, model, params, state, half: Optional[bool] = None, fuse: bool = True):
        """Bind a DetectionModel + weight pytrees; build the fused jitted graph."""
        self.model = model
        from yololite_tpu.models.model import EnsembleModel

        is_ens = isinstance(model, EnsembleModel)
        if fuse:  # fold Conv+BN for inference (reference autobackend.py:34 fuse=True)
            from yololite_tpu.models.modules import fuse_tree

            params, state = fuse_tree(params, state)
        half = self.args.half if half is None else half
        if half:
            cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
            params, state = cast(params), cast(state)
        # multi-chip: replicate weights over a data mesh and batch-shard inputs
        # (the trainer auto-shards the same way, trainer.py; VERDICT r1 #8)
        from yololite_tpu.parallel.mesh import make_mesh, replicate_tree

        self.mesh = make_mesh() if len(jax.devices()) > 1 else None
        self.params = replicate_tree(self.mesh, params)
        self.state = replicate_tree(self.mesh, state)

        nc, strides, reg_max = model.nc, model.strides, model.reg_max
        conf, iou = float(self.args.conf), float(self.args.iou)
        max_det = int(self.args.max_det)
        agnostic = bool(self.args.agnostic_nms)
        augment = bool(self.args.augment)
        class_mask = None
        if self.args.classes is not None:
            cm = np.zeros(nc, bool)
            cm[np.asarray(self.args.classes, int)] = True
            class_mask = jnp.asarray(cm)

        def _forward_decode(params, state, x):
            if is_ens:  # members' decoded outputs concat along the anchor axis
                return model.decode_concat(params, state, x, half=half)
            feats = model.apply(params, state, x, train=False)
            if not half:  # half path keeps bf16 scores through decode+NMS (boxes fp32)
                feats = [f.astype(jnp.float32) for f in feats]
            boxes, scores = decode_detections(feats, strides, nc, reg_max, xywh=False)
            return boxes.astype(jnp.float32), scores

        def _forward_tta(params, state, x):
            """Test-time augmentation: multi-scale + horizontal flip, merged pre-NMS
            (counterpart of reference tasks.py:278-316 _predict_augment): each view
            goes through scale_img (resize by the ratio, pad to the /32 grid with
            the 0.447 fill, reference torch_utils.py:255-264) and its boxes
            unscale by the plain ratio."""
            from yololite_tpu.ops.letterbox import scale_img

            w = x.shape[2]
            outs = []
            for s, flip in ((1.0, False), (0.83, True), (0.67, False)):
                xi = scale_img(x[:, :, ::-1, :] if flip else x, s, gs=32)
                boxes, scores = _forward_decode(params, state, xi)
                boxes = boxes / s
                if flip:  # un-flip x coords (xyxy)
                    x1 = w - boxes[..., 2]
                    x2 = w - boxes[..., 0]
                    boxes = jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], -1)
                outs.append((boxes, scores))
            return jnp.concatenate([o[0] for o in outs], 1), jnp.concatenate([o[1] for o in outs], 1)

        # NMS-free end2end heads (Detect end2end=True): inference decodes the
        # one2one maps and takes a plain top-k — no suppression pass at all
        # (reference head.py:91-93 forward_end2end -> postprocess)
        end2end = bool(getattr(model.detect, "end2end", False)) if not is_ens else False

        # top-K candidate pool for the single-label predict path: 256 covers any
        # realistic above-conf count at the 0.25 default (measured sweep,
        # docs/PERF.md round 3), but never cap below the user's max_det, and
        # widen to 512 when the user lowers conf below the default (more
        # candidates survive the gate there)
        pred_max_cand = max(256 if conf >= 0.25 else 512, max_det)

        def _single_label(params, state, x):
            """Non-TTA predict graph: fused select-first NMS over the raw maps."""
            from yololite_tpu.ops.nms import nms_from_feats

            if is_ens:  # ensemble: decode-all concat pre-NMS (reference tasks.py:448-459)
                boxes, scores = model.decode_concat(params, state, x, half=half)
                return non_max_suppression(
                    boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det,
                    max_cand=512, multi_label=False, agnostic=agnostic, class_mask=class_mask,
                )
            feats = model.apply(params, state, x, train=False)
            if end2end:
                from yololite_tpu.ops.decode import postprocess_end2end

                return postprocess_end2end(
                    feats["one2one"], strides, nc, reg_max,
                    max_det=min(max_det, model.detect.max_det), conf_thres=conf,
                )
            return nms_from_feats(
                feats, strides, nc, reg_max, conf_thres=conf, iou_thres=iou,
                max_det=max_det, max_cand=pred_max_cand, agnostic=agnostic,
                class_mask=class_mask, half=half,
            )

        @jax.jit
        def _infer(params, state, images):
            x = images.astype(jnp.bfloat16) if half else images
            if not augment or end2end:  # end2end: no TTA (one2one top-k is the whole tail)
                return _single_label(params, state, x)
            boxes, scores = _forward_tta(params, state, x)
            return non_max_suppression(
                boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det,
                max_cand=512, multi_label=False, agnostic=agnostic, class_mask=class_mask,
            )

        @functools.partial(jax.jit, static_argnames=("imgsz",))
        def _infer_device_preproc(params, state, raw_uint8, imgsz):
            """uint8 RGB batch -> device letterbox -> forward -> NMS, one graph.

            Uploads 1 byte/px instead of 4 (host float letterbox), and fuses the
            resize (two MXU matmuls) with the network (ops/pallas_kernels.py).
            """
            from yololite_tpu.ops.pallas_kernels import device_letterbox

            x = device_letterbox(raw_uint8, imgsz=imgsz, out_dtype_name="bfloat16" if half else "float32")
            if not augment or end2end:
                return _single_label(params, state, x)
            boxes, scores = _forward_tta(params, state, x)
            return non_max_suppression(
                boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det,
                max_cand=512, multi_label=False, agnostic=agnostic, class_mask=class_mask,
            )

        self._infer = _infer
        self._infer_device_preproc = _infer_device_preproc

    def setup_source(self, source):
        self.imgsz = check_imgsz(self.args.imgsz, stride=32, min_dim=2)
        self.dataset = load_inference_source(
            source, batch=self.args.batch, vid_stride=self.args.vid_stride, buffer=self.args.stream_buffer
        )

    def _maybe_quantize(self, im0s):
        """int8 serving: calibrate on the first real batch, then swap in quantized weights.

        Activation scales come from this batch's post-SiLU absmax per conv (global
        symmetric scale); weights get per-output-channel scales. Pays off at m/l/x
        channel widths (yolo11m forward: 1278 -> 1807 img/s on v5e, docs/PERF.md);
        at n-scale the narrow convs are layout-bound and int8 is neutral.
        """
        if not bool(self.args.int8) or self._quantized:
            return
        from yololite_tpu.models.model import EnsembleModel

        if isinstance(self.model, EnsembleModel):
            LOGGER.warning("int8 serving is not supported for ensembles; running bf16/fp32")
            self._quantized = True  # don't re-warn per batch
            return
        from yololite_tpu.ops.letterbox import preprocess_batch

        self._quantize_from(preprocess_batch(im0s, imgsz=self.imgsz[0]))

    def _quantize_from(self, calib: np.ndarray):
        """Quantize weights using `calib` (preprocessed NHWC float batch) for activation scales."""
        from yololite_tpu.models.quant import quantize_model
        from yololite_tpu.parallel.mesh import replicate_tree

        host_p = jax.tree.map(np.asarray, self.params)
        host_s = jax.tree.map(np.asarray, self.state)
        qp, qs, _ = quantize_model(self.model, host_p, host_s, [calib])
        self.params = replicate_tree(self.mesh, qp)
        self.state = replicate_tree(self.mesh, qs)
        self._quantized = True
        LOGGER.info("int8 serving: weights quantized (per-channel), activations calibrated on first batch")

    def _put(self, arr):
        """Host batch -> device(s): batch-sharded over the mesh when divisible."""
        from yololite_tpu.parallel.mesh import mesh_size, shard_batch

        if self.mesh is not None and arr.shape[0] % mesh_size(self.mesh) == 0:
            return shard_batch(self.mesh, jnp.asarray(arr))
        return jnp.asarray(arr)

    def warmup(self, batch: int):
        imgs = np.zeros((batch, self.imgsz[0], self.imgsz[1], 3), np.float32)
        jax.block_until_ready(self._infer(self.params, self.state, self._put(imgs)))
        self.done_warmup = True

    # ---- inference ----

    def __call__(self, source=None, stream: bool = False, **kwargs):
        if stream:
            return self.stream_inference(source)
        return list(self.stream_inference(source))

    def stream_inference(self, source):
        """Generator yielding per-image Results; the hot loop is host-prefetched."""
        if self.args.verbose:
            LOGGER.info("")
        self.setup_source(source)
        if self.args.save or self.args.save_txt:
            self.save_dir.mkdir(parents=True, exist_ok=True)
        if not self.done_warmup:
            self.warmup(batch=self.args.batch)

        profilers = (Profile(), Profile(), Profile())
        batch_size = int(self.args.batch)
        with self._lock:
            is_tensor = getattr(getattr(self.dataset, "source_type", None), "tensor", False)
            for paths, im0s, infos in Prefetcher(self.dataset, depth=2):
                n = len(im0s)
                if is_tensor:
                    # pre-normalized NHWC float batch: no letterbox needed
                    im = np.asarray(im0s, np.float32)
                    if bool(self.args.int8) and not self._quantized:
                        # calibrate directly on this batch (already normalized imagery)
                        self._quantize_from(im)
                    from yololite_tpu.ops.boxes import convert_batch2numpy

                    orig = convert_batch2numpy(im)  # BGR uint8 for Results (ref ops.py:487)
                    with profilers[0]:
                        if n < batch_size:
                            im = np.concatenate([im, np.zeros((batch_size - n, *im.shape[1:]), im.dtype)])
                    with profilers[1]:
                        dets = self._infer(self.params, self.state, self._put(im))
                        dets = np.asarray(jax.block_until_ready(dets))
                    with profilers[2]:
                        results = self.postprocess(dets[:n], im.shape[1:3], orig, paths)
                    for i, result in enumerate(results):
                        self.seen += 1
                        result.speed = {
                            "preprocess": profilers[0].dt * 1e3 / n,
                            "inference": profilers[1].dt * 1e3 / n,
                            "postprocess": profilers[2].dt * 1e3 / n,
                        }
                        if self.args.verbose:
                            LOGGER.info(f"{infos[i]}{result.verbose()}{profilers[1].dt * 1e3 / n:.1f}ms")
                        yield result
                    continue
                self._maybe_quantize(im0s)
                same_shape = len({im.shape for im in im0s}) == 1
                with profilers[0]:
                    if same_shape:
                        # device path: ship raw uint8, letterbox on the MXU
                        raw = np.ascontiguousarray(np.stack(im0s)[..., ::-1])  # BGR -> RGB
                        if n < batch_size:
                            raw = np.concatenate([raw, np.zeros((batch_size - n, *raw.shape[1:]), raw.dtype)])
                        input_hw = (self.imgsz[0], self.imgsz[1])
                    else:
                        im = preprocess_batch(im0s, imgsz=self.imgsz[0])
                        if n < batch_size:  # pad tail batch to the compiled shape
                            im = np.concatenate([im, np.zeros((batch_size - n, *im.shape[1:]), im.dtype)])
                        input_hw = im.shape[1:3]
                with profilers[1]:
                    if same_shape:
                        dets = self._infer_device_preproc(self.params, self.state, self._put(raw), self.imgsz[0])
                    else:
                        dets = self._infer(self.params, self.state, self._put(im))
                    dets = np.asarray(jax.block_until_ready(dets))
                with profilers[2]:
                    results = self.postprocess(dets[:n], input_hw, im0s, paths)

                if self.args.visualize:
                    vis = preprocess_batch(im0s[:1], imgsz=self.imgsz[0])
                    self._visualize_features(vis)

                for i, result in enumerate(results):
                    self.seen += 1
                    result.speed = {
                        "preprocess": profilers[0].dt * 1e3 / n,
                        "inference": profilers[1].dt * 1e3 / n,
                        "postprocess": profilers[2].dt * 1e3 / n,
                    }
                    if self.args.verbose:
                        LOGGER.info(f"{infos[i]}{result.verbose()}{profilers[1].dt * 1e3 / n:.1f}ms")
                    is_video = (
                        Path(paths[i]).suffix.lower().lstrip(".") in VID_FORMATS
                        or getattr(self.dataset, "mode", "image") == "stream"
                    )
                    if self.args.save and is_video:
                        self._write_video_frame(paths[i], result.plot())
                    elif self.args.save:
                        result.save(str(self.save_dir / Path(paths[i]).name))
                    if self.args.save_txt:
                        result.save_txt(str(self.save_dir / "labels" / (Path(paths[i]).stem + ".txt")),
                                        save_conf=self.args.save_conf)
                    if self.args.save_crop:
                        result.save_crop(self.save_dir / "crops", Path(paths[i]).name)
                    yield result

        for vw in getattr(self, "_vid_writers", {}).values():
            vw.release()
        self._vid_writers = {}

        if self.args.verbose and self.seen:
            t = tuple(p.t / self.seen * 1e3 for p in profilers)
            LOGGER.info(
                f"Speed: {t[0]:.1f}ms preprocess, {t[1]:.1f}ms inference, {t[2]:.1f}ms postprocess "
                f"per image at shape (1, {self.imgsz[0]}, {self.imgsz[1]}, 3)"
            )
        if self.args.save or self.args.save_txt:
            LOGGER.info(f"Results saved to {colorstr('bold', self.save_dir)}")

    def _write_video_frame(self, path, frame):
        """Append an annotated frame to a per-source mp4 writer."""
        import cv2

        if not hasattr(self, "_vid_writers"):
            self._vid_writers = {}
        if path not in self._vid_writers:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            out = str(self.save_dir / (Path(path).stem + ".mp4"))
            fps = 30
            cap = getattr(self.dataset, "cap", None)
            if cap is not None:
                fps = int(cap.get(cv2.CAP_PROP_FPS)) or 30
            h, w = frame.shape[:2]
            self._vid_writers[path] = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        self._vid_writers[path].write(frame)

    def _visualize_features(self, im: np.ndarray):
        """Save feature maps of the backbone tap layers (reference tasks.py:139-140)."""
        from yololite_tpu.models.modules import Ctx
        from yololite_tpu.utils.plotting import feature_visualization

        capture = sorted(self.model.save)[:6]
        ctx = Ctx(train=False, capture=capture)
        self.model.apply(self.params, self.state, jnp.asarray(im), ctx=ctx)
        for idx, feat in ctx.features.items():
            feature_visualization(np.asarray(feat), self.model.rows[idx].name, idx, save_dir=self.save_dir)

    def postprocess(self, dets: np.ndarray, input_hw, orig_imgs: List[np.ndarray], paths) -> List[Results]:
        """Strip padding rows, rescale to original frames, wrap in Results."""
        results = []
        for det, im0, path in zip(dets, orig_imgs, paths):
            det = det[det[:, 4] > 0]
            if len(det):
                det = det.copy()
                det[:, :4] = scale_boxes_np(input_hw, det[:, :4], im0.shape[:2])
            results.append(Results(im0, path, self.model.names, det.astype(np.float32)))
        return results
