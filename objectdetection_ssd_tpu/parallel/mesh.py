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


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the batch's leading dim shards over.

    Every non-trivial axis named ``data`` or ``fsdp`` carries batch rows:
    the fsdp axis gathers params at use (ZeRO-3), but each device along it
    still computes DISTINCT examples — sharding the batch over ``data``
    only would replicate work (and double per-chip activation memory)
    across the fsdp axis.
    """
    return tuple(a for a in ("data", "fsdp")
                 if a in mesh.axis_names and mesh.shape[a] > 1)


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) dim over the mesh's batch axes (or one
    explicit ``axis``); everything else local."""
    axes = (axis,) if axis is not None else batch_axes(mesh)
    return NamedSharding(mesh, P(axes) if axes else P())


def spatial_ways(mesh: Mesh) -> int:
    """Size of the ``spatial`` mesh axis (1 when absent/trivial).

    Spatial partitioning is the CNN analog of sequence parallelism: image
    HEIGHT rows shard over the axis and GSPMD partitions every convolution
    spatially, inserting the kernel-halo exchanges (collective-permutes of
    the boundary rows) automatically.  Params replicate over the axis and —
    like the ``model`` axis — it carries NO batch rows: each device computes
    an H-slice of every example's feature maps.  Use it when per-example
    activation memory (not batch size) is the wall: activations split N
    ways at full batch.  The reference has nothing comparable (single
    device; SURVEY.md §2 "Parallelism strategies: NONE").
    """
    if "spatial" in mesh.axis_names:
        return int(mesh.shape["spatial"])
    return 1


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC image batches: leading dim over the batch axes,
    H (dim 1) over ``spatial`` when that axis is non-trivial."""
    axes = batch_axes(mesh)
    lead = axes if axes else None
    if spatial_ways(mesh) > 1:
        return NamedSharding(mesh, P(lead, "spatial"))
    return NamedSharding(mesh, P(lead) if lead else P())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: Optional[str] = None) -> Any:
    """Put a host batch on the mesh with its leading dim sharded.

    With a non-trivial ``spatial`` mesh axis, 4-D (NHWC image) leaves
    additionally shard their H dim over it (`image_sharding`); label
    leaves (boxes/classes/mask) stay batch-sharded only.

    Multi-host aware: with ``jax.process_count() > 1`` the input is this
    process's LOCAL rows (see `parallel.distributed.local_shard_bounds`)
    and the global array is assembled from every process's contribution
    via `jax.make_array_from_process_local_data`; on one process it is a
    plain device_put of the full batch.
    """
    sharding = batch_sharding(mesh, axis)
    img = (image_sharding(mesh)
           if axis is None and spatial_ways(mesh) > 1 else sharding)

    def put(x):
        s = img if np.ndim(x) == 4 else sharding
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch_size: int, mesh: Mesh,
                     axis: Optional[str] = None) -> int:
    axes = (axis,) if axis is not None else batch_axes(mesh)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"batch mesh axes {axes} (total {n} ways)")
    return global_batch_size // n


def fsdp_sharding_for(x: jax.Array, mesh: Mesh,
                      axis: str = "fsdp") -> NamedSharding:
    """Pick an FSDP sharding for one param leaf: shard the largest dim that
    divides the axis size; replicate if none does (tiny biases/scales).

    This is parameter sharding in the ZeRO-3/FSDP sense: each device holds
    1/N of every (large) weight; XLA inserts the all-gather before use and
    the reduce-scatter on the gradient automatically because the jitted
    step's in_shardings pin the param layout.  The batch is sharded over
    the fsdp axis too (`batch_axes`) — the standard ZeRO-3 arrangement
    where every device computes distinct examples and params are gathered
    over fsdp — so --fsdp trades a little gather/scatter traffic for
    1/N param+momentum bytes per chip at the same per-chip batch.  For
    this model family (~0.8 GB state) that saving is modest; data-parallel
    remains the default (SURVEY.md §5); the axis exists so the mesh layer
    scales to models where it is essential.
    """
    n = mesh.shape[axis]
    if n == 1:
        return NamedSharding(mesh, P())
    dims = list(x.shape)
    if not dims:
        return NamedSharding(mesh, P())
    order = sorted(range(len(dims)), key=lambda i: dims[i], reverse=True)
    for i in order:
        if dims[i] % n == 0 and dims[i] >= n:
            spec = [None] * len(dims)
            spec[i] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params_fsdp(tree: Any, mesh: Mesh, axis: str = "fsdp") -> Any:
    """Device-put a param/optimizer pytree with every leaf FSDP-sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, fsdp_sharding_for(x, mesh, axis)), tree)


def state_fsdp_shardings(state: Any, mesh: Mesh, axis: str = "fsdp") -> Any:
    """Sharding pytree for a TrainState: params/opt leaves FSDP-sharded,
    scalars (step) replicated — suitable for jit in/out_shardings."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_sharding_for(x, mesh, axis), state)


def tp_sharding_for(x: jax.Array, mesh: Mesh,
                    axis: str = "model") -> NamedSharding:
    """Tensor-parallel sharding for one param leaf: the OUTPUT-CHANNEL dim
    — last dim of HWIO conv kernels / (in, out) dense kernels, dim 0 of
    per-channel vectors (biases, BN stats, L2Norm scales) — shards over
    the ``model`` axis when it divides; replicate otherwise (scalars, odd
    widths like the 21k conf-head channels under big meshes).

    This differs from FSDP in WHERE the collective lands, not in the
    annotation machinery: FSDP also shards the batch over its axis, so
    GSPMD's cheapest plan is gather-params-at-use (ZeRO-3).  A TP axis
    carries NO batch rows (`batch_axes` excludes it), so the cheapest plan
    partitions the convolution itself — each device computes its channel
    slice of every output feature map for the full per-data-shard batch.
    Conv FLOPs and param/momentum memory both split N ways over ``model``;
    activations live channel-sharded between consecutive convs.  This is
    the Megatron column-parallel arrangement expressed as GSPMD
    annotations (the reference has no model parallelism at all —
    SURVEY.md §2 "Parallelism strategies: NONE").
    """
    n = mesh.shape[axis]
    dims = list(x.shape)
    if n == 1 or not dims:
        return NamedSharding(mesh, P())
    d = len(dims) - 1 if len(dims) > 1 else 0
    if dims[d] % n == 0 and dims[d] >= n:
        spec = [None] * len(dims)
        spec[d] = axis
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def state_tp_shardings(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Sharding pytree for a TrainState under tensor parallelism: every
    param/momentum/EMA leaf channel-sharded per `tp_sharding_for`, scalars
    replicated — suitable for jit in/out_shardings."""
    return jax.tree_util.tree_map(
        lambda x: tp_sharding_for(x, mesh, axis), state)
