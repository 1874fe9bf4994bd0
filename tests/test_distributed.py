"""Multi-host helper tests (single-process semantics on the CPU mesh)."""

import jax
import numpy as np
import pytest

from objectdetection_ssd_tpu.parallel import distributed, mesh as mesh_lib


def test_initialize_noop_single_host(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    distributed.initialize()  # must not raise or block


def test_global_mesh_covers_all_devices():
    m = distributed.create_global_mesh()
    assert m.shape["data"] == len(jax.devices()) == 8


def test_primary_and_shard_bounds():
    assert distributed.is_primary()
    assert distributed.process_index() == 0
    lo, hi = distributed.local_shard_bounds(64)
    assert (lo, hi) == (0, 64)


def test_shard_bounds_multi_process(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert distributed.local_shard_bounds(64) == (32, 48)
    with pytest.raises(ValueError):
        distributed.local_shard_bounds(63)


def test_mesh_multi_axis():
    m = mesh_lib.create_mesh((4, 2), ("data", "model"))
    assert m.shape["data"] == 4 and m.shape["model"] == 2
    assert mesh_lib.local_batch_size(32, m) == 8
    with pytest.raises(ValueError):
        mesh_lib.local_batch_size(30, m)
