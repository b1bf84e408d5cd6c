"""Source dispatch + dataset/dataloader builders.

`load_inference_source` mirrors reference data/build.py:119-176; the training
dataloader is a host-side prefetching loader feeding fixed-shape padded batches
(reference uses torch DataLoader; we use a thread-pool prefetcher, data/build.py:27-116).
"""

from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from yololite_tpu.data.loaders import (
    IMG_FORMATS,
    VID_FORMATS,
    LoadImagesAndVideos,
    LoadPilAndNumpy,
    LoadScreenshots,
    LoadStreams,
    SourceTypes,
    autocast_list,
)


def check_source(source):
    """Classify a source -> (source, stream, screenshot, from_img, in_memory, tensor)."""
    webcam, screenshot, from_img, in_memory, tensor = False, False, False, False, False
    if isinstance(source, (str, int, Path)):
        s = str(source)
        is_file = s.rpartition(".")[-1].lower() in (IMG_FORMATS | VID_FORMATS)
        is_url = s.lower().startswith(("https://", "http://", "rtsp://", "rtmp://", "tcp://"))
        webcam = s.isnumeric() or s.endswith(".streams") or (is_url and not is_file)
        screenshot = s.lower().startswith("screen")
    elif isinstance(source, (list, tuple)):
        if all(isinstance(x, (str, Path)) for x in source):
            pass  # list of files
        else:
            source = autocast_list(source)
            from_img = True
    elif isinstance(source, np.ndarray):
        # a batched float array is a pre-normalized tensor source (our NHWC
        # analogue of the reference's torch BCHW LoadTensor, loaders.py:480-546)
        if source.ndim == 4 and np.issubdtype(source.dtype, np.floating):
            tensor = True
        elif source.ndim == 4:
            source = list(source)  # uint8 (B,H,W,3) batch -> list of HWC images
            from_img = True
        else:
            from_img = True
    elif type(source).__module__.startswith("jax"):  # device array -> tensor source
        source = np.asarray(source)
        tensor = True
    else:  # PIL image or anything array-like
        from_img = True
    return source, webcam, screenshot, from_img, in_memory, tensor


def load_inference_source(source, batch: int = 1, vid_stride: int = 1, buffer: bool = False):
    """Build the right loader for the given source; attaches .source_type flags."""
    source, stream, screenshot, from_img, _, tensor = check_source(source)
    if tensor:
        from yololite_tpu.data.loaders import LoadTensor

        dataset = LoadTensor(source)
    elif stream:
        dataset = LoadStreams(source, vid_stride=vid_stride, buffer=buffer)
    elif screenshot:
        dataset = LoadScreenshots(source)
    elif from_img:
        dataset = LoadPilAndNumpy(source)
    else:
        dataset = LoadImagesAndVideos(source, batch=batch, vid_stride=vid_stride)
    dataset.source_type = SourceTypes(stream=stream, screenshot=screenshot, from_img=from_img, tensor=tensor)
    return dataset


class Prefetcher:
    """Background-thread batch prefetcher (double buffering host->device feed)."""

    _DONE = object()

    def __init__(self, iterable, depth: int = 2):
        self.iterable = iterable
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.thread: Optional[threading.Thread] = None

    def _work(self):
        try:
            for item in self.iterable:
                self.q.put(item)
        except BaseException as e:  # surfaced in the consumer, not swallowed
            self.q.put(e)
        finally:
            self.q.put(self._DONE)

    def __iter__(self):
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.thread.start()
        while True:
            item = self.q.get()
            if item is self._DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
