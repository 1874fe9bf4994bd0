"""Tensor parallelism over a 2-D (data x model) mesh.

The reference has no model parallelism of any kind (SURVEY.md §2
"Parallelism strategies: NONE").  These tests pin the TP axis: conv params
live channel-sharded over ``model`` (parallel/mesh.py:tp_sharding_for), the
model axis carries NO batch rows (GSPMD therefore partitions the conv
compute itself rather than gathering params ZeRO-style), and one train step
is numerically equivalent to the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from objectdetection_ssd_tpu.config import LossConfig, OptimConfig
from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
from objectdetection_ssd_tpu.train import loop as loop_lib
from objectdetection_ssd_tpu.train.state import create_train_state

from tests.test_train import TinySSD, _tiny_batch, _tiny_priors


def _tp_mesh():
    assert len(jax.devices()) >= 8
    return mesh_lib.create_mesh((4, 2), ("data", "model"))


def test_tp_sharding_picks_output_channel_dim():
    mesh = _tp_mesh()
    # HWIO conv kernel: output channels = last dim
    s = mesh_lib.tp_sharding_for(jnp.zeros((3, 3, 8, 16)), mesh)
    assert s.spec == P(None, None, None, "model")
    # per-channel vector (bias / BN stat / L2Norm scale): dim 0
    s = mesh_lib.tp_sharding_for(jnp.zeros((8,)), mesh)
    assert s.spec == P("model")
    # odd output width (21-class conf head under a wide axis) -> replicated
    s = mesh_lib.tp_sharding_for(jnp.zeros((3, 3, 8, 21)), mesh)
    assert s.spec == P()
    # scalars replicated
    s = mesh_lib.tp_sharding_for(jnp.zeros(()), mesh)
    assert s.spec == P()


def test_model_axis_carries_no_batch_rows():
    """The semantic line between FSDP and TP: a ``model`` axis must NOT
    shard the batch — with distinct examples per device GSPMD would pick
    the gather-params plan (that's what the fsdp axis is for); with the
    same examples it partitions the convolution's channels instead."""
    mesh = _tp_mesh()
    assert mesh_lib.batch_axes(mesh) == ("data",)
    assert mesh_lib.batch_sharding(mesh).spec == P(("data",))
    assert mesh_lib.local_batch_size(8, mesh) == 2


def test_tp_step_matches_single_device():
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=8)
    state = create_train_state(
        model, jax.random.PRNGKey(1), batch["images"][:1],
        OptimConfig(lr=0.01, use_lr_schedule=False))

    single_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                                mesh=None, donate=False)
    s1, m1 = single_step(state, batch)

    mesh = _tp_mesh()
    shardings = mesh_lib.state_tp_shardings(state, mesh)
    state_t = jax.device_put(state, shardings)
    tp_step, tp_eval = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=mesh, donate=False,
        state_sharding=shardings)
    batch_s = mesh_lib.shard_batch(batch, mesh)
    s2, m2 = tp_step(state_t, batch_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    k1 = np.asarray(s1.params["Conv_0"]["kernel"])
    k2 = np.asarray(s2.params["Conv_0"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-6)

    # updated params still live channel-sharded per the plan
    planned = mesh_lib.tp_sharding_for(s2.params["Conv_0"]["kernel"], mesh)
    assert s2.params["Conv_0"]["kernel"].sharding.spec == planned.spec
    assert planned.spec == P(None, None, None, "model")
    # the 21-channel conf head fell back to replicated — mixed layouts
    # coexist in one step
    assert mesh_lib.tp_sharding_for(
        s2.params["Conv_2"]["kernel"], mesh).spec == P()

    e2 = tp_eval(s2, batch_s)
    assert np.isfinite(float(e2["loss"]))


def test_tp_memory_footprint_is_sharded():
    """Each device's addressable shard of a channel-sharded kernel is 1/N
    the bytes (param memory splits over the model axis)."""
    mesh = _tp_mesh()
    x = jnp.zeros((3, 3, 64, 128))
    xs = jax.device_put(x, mesh_lib.tp_sharding_for(x, mesh))
    shard = xs.addressable_shards[0]
    assert shard.data.size == x.size // mesh.shape["model"]
    assert shard.data.shape == (3, 3, 64, 64)


def test_trainer_runs_tp_mesh(tmp_path):
    """Trainer auto-selects TP state sharding when the configured mesh
    carries a model axis; one epoch over synthetic data trains and
    checkpoints."""
    from objectdetection_ssd_tpu.config import (Config, DataConfig,
                                                ModelConfig, OptimConfig,
                                                TrainConfig)
    from objectdetection_ssd_tpu.data import synthetic, voc
    from objectdetection_ssd_tpu.data.pipeline import Loader
    from objectdetection_ssd_tpu.train.trainer import Trainer
    from tests.test_end_to_end import TinyDet
    from tests.test_end_to_end import _tiny_priors as det_priors

    root = tmp_path / "voc"
    synthetic.generate_voc(str(root), num_2007=16, num_2012=0,
                           image_size=(96, 96), seed=3)
    records = voc.load_records(str(root), train=True)
    cfg = Config(
        model=ModelConfig(image_size=64),
        data=DataConfig(voc_root=str(root), batch_size=8, num_workers=0,
                        max_boxes=8),
        optim=OptimConfig(lr=0.01, use_lr_schedule=False),
        train=TrainConfig(num_epochs=1, seed=0,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          log_every_steps=2,
                          mesh_shape=(4, 2),
                          mesh_axis_names=("data", "model")),
    )
    loader = Loader(records, cfg.data, cfg.model.image_size, train=True,
                    seed=0)
    trainer = Trainer(cfg, loader, model=TinyDet(), priors=det_priors())
    # state actually lives channel-sharded over the model axis
    kern = trainer.state.params["Conv_0"]["kernel"]
    assert kern.sharding.spec == mesh_lib.tp_sharding_for(
        kern, trainer.mesh).spec
    state = trainer.fit()
    assert np.isfinite(trainer.history["train"][-1])
    assert int(state.step) == len(loader)


def test_tp_detector_matches_single_device(monkeypatch):
    """Tensor-parallel inference (mesh with a model axis) produces the same
    detections as the unsharded Detector, with params genuinely living
    channel-sharded."""
    import dataclasses

    import flax.linen as nn

    from objectdetection_ssd_tpu.config import Config, ModelConfig
    from objectdetection_ssd_tpu.infer import detector as detector_lib
    from objectdetection_ssd_tpu.ops import priors as priors_lib

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(8, 8), padding="SAME")(x)
            x = nn.relu(x)
            loc = nn.Conv(4, (1, 1))(x)
            conf = nn.Conv(21, (1, 1))(x)
            return (loc.reshape(x.shape[0], -1, 4),
                    conf.reshape(x.shape[0], -1, 21))

    rng = np.random.default_rng(0)
    pri = np.concatenate([rng.uniform(0.2, 0.8, (16, 2)),
                          np.full((16, 2), 0.3)], 1).astype(np.float32)
    model = Tiny()
    images = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images[:1])["params"]
    cfg = Config(model=ModelConfig(image_size=32))
    pp = dataclasses.replace(cfg.postprocess, per_class_top_k=16, top_k=10,
                             use_approx_top_k=False)
    monkeypatch.setattr(detector_lib, "build_model", lambda mcfg: model)
    monkeypatch.setattr(priors_lib, "priors_for_model",
                        lambda mcfg, pcfg=None: pri)

    det1 = detector_lib.Detector(cfg, params, postprocess_config=pp)
    d1 = jax.device_get(det1.detect_batch(images))

    mesh = mesh_lib.create_mesh((4, 2), ("data", "model"))
    det2 = detector_lib.Detector(cfg, params, postprocess_config=pp,
                                 mesh=mesh)
    # params actually live channel-sharded over the model axis
    k = det2.params["Conv_0"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    d2 = jax.device_get(det2.detect_batch(images))

    np.testing.assert_allclose(d1.boxes_xyxy, d2.boxes_xyxy,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d1.scores, d2.scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(d1.classes, d2.classes)
    np.testing.assert_array_equal(d1.valid, d2.valid)


def test_cli_tp_flag_guards():
    """--fsdp and --tp together fail fast; an indivisible --tp fails with
    the same message shape as --fsdp."""
    import unittest.mock as mock

    import pytest

    from objectdetection_ssd_tpu import cli

    captured = {}

    def fake_fn(args):
        captured["args"] = args
        return 0

    with mock.patch.object(cli, "cmd_train", fake_fn), \
            mock.patch.object(cli, "cmd_eval", fake_fn), \
            mock.patch.object(cli, "cmd_detect", fake_fn), \
            mock.patch.object(cli, "cmd_export", fake_fn):
        assert cli.main(["train", "--tp", "2", "--fsdp", "2"]) == 0
        args_both = captured["args"]
        assert cli.main(["train", "--tp",
                         str(len(jax.devices()) + 3)]) == 0
        args_bad = captured["args"]
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.cmd_train(args_both)
    with pytest.raises(SystemExit, match="does not divide"):
        cli.cmd_train(args_bad)
