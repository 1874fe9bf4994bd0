"""Multi-host (multi-slice / DCN) support.

The reference is strictly single-process (SURVEY.md §2); this module is the
framework's multi-host entry point: call `initialize()` once per host before
any device use, then `create_global_mesh` spans every chip in the job — the
data axis rides ICI within a slice and DCN across slices, with XLA placing
the collectives (SURVEY.md §5).

On a single host everything is a no-op passthrough, so the same training
script runs unchanged from 1 chip to a full pod:

    from objectdetection_ssd_tpu.parallel import distributed, mesh
    distributed.initialize()                  # no-op on one host
    m = distributed.create_global_mesh()      # all chips on axis "data"
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from objectdetection_ssd_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with environment auto-detection.

    On TPU pods the arguments are discovered from the runtime (pass
    nothing); explicit values are for CPU/GPU clusters or tests.  A plain
    (non-TPU, non-SLURM) cluster can configure the job through env vars
    instead of code: COORDINATOR_ADDRESS + NUM_PROCESSES + PROCESS_ID —
    the same `cli.py train` invocation then runs unchanged on 1 or N
    hosts.  Safe to call on a single host: if no coordinator is configured
    and the environment carries no multi-process hints, this is a no-op.
    """
    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("COORDINATOR_ADDRESS")
    if num_processes is None and env.get("NUM_PROCESSES"):
        num_processes = int(env["NUM_PROCESSES"])
    if process_id is None and env.get("PROCESS_ID"):
        process_id = int(env["PROCESS_ID"])
    # TPU_WORKER_HOSTNAMES counts as a multi-process hint only when it
    # names MORE THAN ONE host: single-host TPU runtimes (including the
    # axon relay) set it to one hostname, and auto-detecting there would
    # call jax.distributed.initialize with no coordinator and fail.
    multi_process_env = (
        any(env.get(k) for k in ("JAX_COORDINATOR_ADDRESS",
                                 "MEGASCALE_COORDINATOR_ADDRESS"))
        or "," in env.get("TPU_WORKER_HOSTNAMES", ""))
    if coordinator_address is None and not multi_process_env:
        if num_processes is not None or process_id is not None:
            # Half-configured env (NUM_PROCESSES/PROCESS_ID without a
            # coordinator) must not silently run as an independent
            # single-process job next to a real multi-host one — the
            # orphan would train on the FULL dataset and race the shared
            # checkpoint dir while the other hosts hang in rendezvous.
            raise ValueError(
                "NUM_PROCESSES/PROCESS_ID are set but no COORDINATOR_ADDRESS"
                " — set all three (or none, for single-host)")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def create_global_mesh(axis_names: Tuple[str, ...] = ("data",),
                       mesh_shape: Optional[Tuple[int, ...]] = None):
    """Mesh over ALL devices in the job (every process's chips)."""
    return mesh_lib.create_mesh(mesh_shape, axis_names,
                                devices=jax.devices())


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_shard_bounds(global_batch: int) -> Tuple[int, int]:
    """[start, end) rows of the global batch this host should load.

    Each host feeds only its slice of the global batch; jax.device_put with
    a NamedSharding assembles the global array.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    i = jax.process_index()
    return i * per, (i + 1) * per
