"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference is strictly single-process single-device (no torch.distributed
/ NCCL anywhere; SURVEY.md §2 "Parallelism strategies: NONE").  The
TPU-native equivalent is JAX collectives over ICI: one `jax.sharding.Mesh`,
batch sharded over the ``data`` axis, parameters replicated, gradient
all-reduce inserted automatically by XLA when a jitted step consumes sharded
batches and replicated params (SURVEY.md §5).

The mesh abstraction is first-class so model/tensor axes can be added later
without touching call sites: `create_mesh((4, 2), ("data", "model"))` works
today; everything here only assumes a ``data`` axis exists.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
                axis_names: Tuple[str, ...] = ("data",),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh; default is all local devices on a 1-D ``data`` axis."""
    devs = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; everything else local."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch with its leading dim sharded over ``axis``."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch_size: int, mesh: Mesh,
                     axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"mesh axis '{axis}' size {n}")
    return global_batch_size // n
