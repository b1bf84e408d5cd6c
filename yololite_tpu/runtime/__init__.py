"""Serving runtime: sustained double-buffered inference pipeline."""

from yololite_tpu.runtime.export import export_predict, load_exported
from yololite_tpu.runtime.pipeline import InferencePipeline, PipelineStats

__all__ = ("InferencePipeline", "PipelineStats", "export_predict", "load_exported")
