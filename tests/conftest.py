"""Test config: force JAX to a virtual 8-device CPU mesh before jax imports.

This is the fake-backend facility the reference lacks (SURVEY.md §4): all sharding
tests exercise the real pjit/shard_map code paths on host CPU devices.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must configure before any other module imports jax)

jax.config.update("jax_platforms", "cpu")  # the sandbox force-sets JAX_PLATFORMS=axon (TPU tunnel)

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "yololite").exists()
