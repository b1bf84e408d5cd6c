"""Device mesh + sharding helpers: data-parallel scale-out via jax.sharding.

The reference has no distributed runtime (SURVEY.md §2.14: DDP stripped). Here
data parallelism is a mesh-shape change, not a rewrite: the jitted train/infer
steps take batch arrays sharded over the 'data' axis and replicated weight
pytrees; XLA inserts the gradient all-reduce (psum) over ICI automatically.
A second 'model' axis is reserved for tensor-parallel experiments at larger
scales (unused by the 2.6M-57M param YOLO11 family).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def select_device(device="", batch: int = 0, newline: bool = False, verbose: bool = True):
    """Parse a reference-style device string into a list of jax devices.

    Counterpart of reference torch_utils.py:92-172 select_device: accepts '',
    'cpu', 'tpu', an index '0', or a comma list '0,1,2,3' (CUDA-era spellings
    like 'cuda:0' normalize to their indices); '' means all accelerators.
    Enforces the reference's multi-device rules — batch must be a positive
    multiple of the device count — and logs a device summary line. Returns the
    selected devices (feed them to make_mesh for the data-parallel axis).
    """
    import sys

    from yololite_tpu.utils import LOGGER

    s = f"YOLOLite-TPU 🚀 Python-{sys.version.split()[0]} jax-{jax.__version__} "
    dev = str(device).lower()
    for remove in ("cuda:", "tpu:", "none", "(", ")", "[", "]", "'", " "):
        dev = dev.replace(remove, "")
    explicit = False
    if dev == "cpu":
        devs = jax.devices("cpu")
    else:
        devs = jax.devices()  # accelerator if present, else CPU backend
        if dev and dev not in ("tpu", "cuda", "gpu"):
            explicit = True
            idx = [int(x) for x in dev.split(",") if x]
            if max(idx) >= len(devs):
                raise ValueError(
                    f"Invalid 'device={device}' requested: only {len(devs)} device(s) visible. "
                    f"Use 'device=cpu' or valid indices, i.e. 'device=0' or 'device=0,1,2,3'."
                )
            devs = [devs[i] for i in idx]
    n = len(devs)
    # reference multi-device batch rules (torch_utils.py:145-158); the reference
    # only hits these for an explicit '0,1' list ('' selects one GPU there —
    # here '' means the whole mesh, which inference handles at any batch)
    if n > 1 and explicit:
        if batch < 1:
            raise ValueError("batch<1 is not supported for multi-device training; specify a valid batch size.")
        if batch % n != 0:
            raise ValueError(
                f"'batch={batch}' must be a multiple of device count {n}. Try 'batch={batch // n * n}' or "
                f"'batch={batch // n * n + n}', the nearest batch sizes evenly divisible by {n}."
            )
    space = " " * (len(s) + 1)
    for i, d in enumerate(devs):
        s += f"{'' if i == 0 else space}{d.platform.upper()}:{d.id} ({getattr(d, 'device_kind', '?')})\n"
    if verbose:
        LOGGER.info(s if newline else s.rstrip())
    return devs


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], tree):
    """device_put a batch pytree with leading-dim sharding (no-op without mesh).

    Tail batches whose leading dim is not divisible by the mesh size (e.g. the
    last dataloader batch) fall back to default placement: a different batch
    shape recompiles the step anyway, so the stragglers run unsharded rather
    than crash on the divisibility requirement.
    """
    if mesh is None:
        return jax.device_put(tree)
    n = int(np.prod(mesh.devices.shape))
    leaves = jax.tree.leaves(tree)
    if leaves and any(l.shape[0] % n for l in leaves):
        return jax.device_put(tree)
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate_tree(mesh: Optional[Mesh], tree):
    """device_put a weight pytree replicated across the mesh."""
    if mesh is None:
        return jax.device_put(tree)
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def mesh_size(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
