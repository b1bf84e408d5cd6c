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
