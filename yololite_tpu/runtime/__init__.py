"""Serving runtime: sustained double-buffered inference pipeline."""

from yololite_tpu.runtime.pipeline import InferencePipeline, PipelineStats

__all__ = ("InferencePipeline", "PipelineStats")
