"""REAL multi-process smoke test for parallel/distributed.py.

Round-1 weakness: `initialize()`/`local_shard_bounds` were only exercised
with monkeypatched process_index/count.  Here two actual Python processes
rendezvous through `jax.distributed.initialize` on CPU (2 local virtual
devices each -> a 4-device global mesh spanning both processes), build the
global mesh, partition a global batch, assemble a process-local-data global
array, and run a jitted global reduction whose result both processes must
agree on.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])
from objectdetection_ssd_tpu.parallel import distributed, mesh as mesh_lib

distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert distributed.process_index() == pid
assert distributed.is_primary() == (pid == 0)

m = distributed.create_global_mesh()
assert m.shape["data"] == 4, m.shape          # 2 procs x 2 local devices

lo, hi = distributed.local_shard_bounds(8)
assert (lo, hi) == (pid * 4, pid * 4 + 4), (lo, hi)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

local = np.arange(lo, hi, dtype=np.float32)   # this host's batch rows
arr = jax.make_array_from_process_local_data(
    NamedSharding(m, P("data")), local, (8,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(m, P()))(arr)
assert float(total) == float(sum(range(8))), float(total)
print(f"proc {pid} ok total={float(total)}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_mesh():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(port), str(pid), REPO],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed rendezvous timed out; outputs so far: "
                    + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok total=28.0" in out, out
