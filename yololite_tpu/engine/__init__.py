"""Engines: predictor, trainer, validator, results."""

from yololite_tpu.engine.model import YOLOLite
from yololite_tpu.engine.results import Boxes, Results

__all__ = ("YOLOLite", "Results", "Boxes")
