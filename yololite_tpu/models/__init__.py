"""Model layer: functional JAX modules, graph builder, checkpoint IO."""

from yololite_tpu.models.model import DetectionModel, parse_spec, yaml_model_load, guess_model_scale
from yololite_tpu.models import modules
from yololite_tpu.models.checkpoint import (
    attempt_load_one_weight,
    load_native,
    load_pt,
    save_native,
    state_dict_to_pytree,
    strip_optimizer,
)

__all__ = (
    "DetectionModel",
    "parse_spec",
    "yaml_model_load",
    "guess_model_scale",
    "modules",
    "load_pt",
    "save_native",
    "load_native",
    "state_dict_to_pytree",
    "strip_optimizer",
    "attempt_load_one_weight",
)
