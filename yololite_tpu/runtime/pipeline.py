"""Sustained-inference serving pipeline: double-buffered host->device streaming.

Addresses BASELINE.json config "sustained stream inference: double-buffered input
pipeline + on-device NMS at fixed p50 latency". Submission is non-blocking: a
host thread letterboxes and enqueues device dispatches (async through the jit
queue) while results drain on a second thread; per-request latency percentiles
are tracked continuously.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from yololite_tpu.ops.letterbox import preprocess_batch


@dataclass
class PipelineStats:
    latencies_ms: List[float] = field(default_factory=list)
    submitted: int = 0
    completed: int = 0

    def percentile(self, q: float) -> float:
        return float(np.percentile(self.latencies_ms, q)) if self.latencies_ms else float("nan")

    def summary(self) -> Dict[str, float]:
        return {
            "completed": self.completed,
            "p50_ms": self.percentile(50),
            "p90_ms": self.percentile(90),
            "p99_ms": self.percentile(99),
            "throughput_img_s": None,
        }


class InferencePipeline:
    """Two-stage pipeline: [host preprocess] -> [device infer] with depth-2 buffering.

    Built on a DetectionPredictor's compiled graph; `submit` returns a ticket id,
    `results()` yields (ticket, detections ndarray) in completion order.
    """

    def __init__(self, predictor, imgsz: Optional[int] = None, depth: int = 2):
        import jax

        self.jax = jax
        self.predictor = predictor
        self.imgsz = imgsz or (predictor.args.imgsz if isinstance(predictor.args.imgsz, int)
                               else predictor.args.imgsz[0])
        self.batch = int(predictor.args.batch)
        self._pre_q: queue.Queue = queue.Queue(maxsize=depth)
        self._disp_q: queue.Queue = queue.Queue(maxsize=depth)
        self._out_q: queue.Queue = queue.Queue()
        self.stats = PipelineStats()
        self._stop = object()
        self._threads: List[threading.Thread] = []
        self._started = False

    # ---- stage workers ----

    def _preprocess_worker(self):
        while True:
            item = self._pre_q.get()
            if item is self._stop:
                self._disp_q.put(self._stop)
                return
            ticket, images, t0 = item
            im = preprocess_batch(images, imgsz=self.imgsz)
            n = im.shape[0]
            if n < self.batch:
                im = np.concatenate([im, np.zeros((self.batch - n, *im.shape[1:]), im.dtype)])
            self._disp_q.put((ticket, im, n, t0))

    def _dispatch_worker(self):
        import jax.numpy as jnp

        p = self.predictor
        while True:
            item = self._disp_q.get()
            if item is self._stop:
                self._out_q.put(self._stop)
                return
            ticket, im, n, t0 = item
            dets = p._infer(p.params, p.state, jnp.asarray(im))  # async dispatch
            dets = np.asarray(self.jax.block_until_ready(dets))[:n]
            lat = (time.perf_counter() - t0) * 1e3
            self.stats.latencies_ms.append(lat)
            self.stats.completed += n
            self._out_q.put((ticket, dets))

    # ---- API ----

    def start(self):
        if self._started:
            return self
        self.predictor.imgsz = (self.imgsz, self.imgsz)
        if not self.predictor.done_warmup:
            self.predictor.warmup(self.batch)
        for fn in (self._preprocess_worker, self._dispatch_worker):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)
        self._started = True
        return self

    def submit(self, images: List[np.ndarray]) -> int:
        """Non-blocking (bounded) submission of a batch of BGR uint8 frames."""
        ticket = self.stats.submitted
        self.stats.submitted += len(images)
        self._pre_q.put((ticket, images, time.perf_counter()))
        return ticket

    def results(self):
        """Yield (ticket, dets) in completion order until close() drains."""
        while True:
            item = self._out_q.get()
            if item is self._stop:
                return
            yield item

    def close(self):
        self._pre_q.put(self._stop)
        for t in self._threads:
            t.join(timeout=30)
        self._started = False

    def summary(self, wall_s: Optional[float] = None) -> Dict:
        s = self.stats.summary()
        if wall_s:
            s["throughput_img_s"] = self.stats.completed / wall_s
        return s
