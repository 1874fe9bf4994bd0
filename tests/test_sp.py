"""Spatial partitioning over a 2-D (data x spatial) mesh.

The CNN analog of sequence parallelism: image HEIGHT rows shard over the
``spatial`` axis and GSPMD partitions every convolution spatially,
inserting the kernel-halo exchanges automatically; params replicate over
the axis and it carries no batch rows (parallel/mesh.py:image_sharding).
The reference has no model/spatial parallelism of any kind (SURVEY.md §2
"Parallelism strategies: NONE").  These tests pin: the image-leaf sharding
rule, batch-axis exclusion, numeric equivalence of one train step vs the
single-device step, spatial shard residency of the device image, Trainer
auto-wiring, spatially-partitioned inference, and the CLI guards.
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


def _sp_mesh():
    assert len(jax.devices()) >= 8
    return mesh_lib.create_mesh((4, 2), ("data", "spatial"))


def test_image_sharding_rule():
    mesh = _sp_mesh()
    assert mesh_lib.spatial_ways(mesh) == 2
    # images: batch over data, H over spatial
    assert mesh_lib.image_sharding(mesh).spec == P(("data",), "spatial")
    # label leaves stay batch-sharded only
    assert mesh_lib.batch_sharding(mesh).spec == P(("data",))
    # no spatial axis -> plain batch sharding
    dp = mesh_lib.create_mesh()
    assert mesh_lib.spatial_ways(dp) == 1
    assert mesh_lib.image_sharding(dp).spec == mesh_lib.batch_sharding(dp).spec


def test_spatial_axis_carries_no_batch_rows():
    """Like the ``model`` axis, ``spatial`` must NOT shard the batch: each
    device along it computes an H-slice of EVERY example in its data
    shard."""
    mesh = _sp_mesh()
    assert mesh_lib.batch_axes(mesh) == ("data",)
    assert mesh_lib.local_batch_size(8, mesh) == 2


def test_shard_batch_shards_image_h_dim():
    """shard_batch routes 4-D leaves through image_sharding: the device
    shard holds H/2 rows of its data-shard examples; 2-D/3-D label leaves
    keep full rows."""
    mesh = _sp_mesh()
    batch = _tiny_batch(bs=8)
    sharded = mesh_lib.shard_batch(batch, mesh)
    img_shard = sharded["images"].addressable_shards[0]
    assert img_shard.data.shape == (2, 8, 16, 3)   # (B/4, H/2, W, C)
    assert sharded["boxes"].addressable_shards[0].data.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(sharded["images"]),
                               np.asarray(batch["images"]))


def test_sp_step_matches_single_device():
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=8)
    state = create_train_state(
        model, jax.random.PRNGKey(1), batch["images"][:1],
        OptimConfig(lr=0.01, use_lr_schedule=False))

    single_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                                mesh=None, donate=False)
    s1, m1 = single_step(state, batch)

    mesh = _sp_mesh()
    state_s = mesh_lib.replicate(state, mesh)
    sp_step, sp_eval = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=mesh, donate=False)
    batch_s = mesh_lib.shard_batch(batch, mesh)
    s2, m2 = sp_step(state_s, batch_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    k1 = np.asarray(s1.params["Conv_0"]["kernel"])
    k2 = np.asarray(s2.params["Conv_0"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-6)

    e2 = sp_eval(s2, batch_s)
    assert np.isfinite(float(e2["loss"]))


def test_trainer_runs_sp_mesh(tmp_path):
    """Trainer on a (data, spatial) mesh: params replicate, the image H
    dim shards (wired through shard_batch), one epoch trains and the
    divisibility guard fires on a bad image size."""
    import pytest

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
                          mesh_axis_names=("data", "spatial")),
    )
    loader = Loader(records, cfg.data, cfg.model.image_size, train=True,
                    seed=0)
    trainer = Trainer(cfg, loader, model=TinyDet(), priors=det_priors())
    # params replicate over the whole mesh (no fsdp/tp sharding)
    kern = trainer.state.params["Conv_0"]["kernel"]
    assert kern.sharding.spec == P()
    state = trainer.fit()
    assert np.isfinite(trainer.history["train"][-1])
    assert int(state.step) == len(loader)

    bad = cfg.replace(model=ModelConfig(image_size=65))
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(bad, loader, model=TinyDet(), priors=det_priors())


def test_sp_detector_matches_single_device(monkeypatch):
    """Spatially-partitioned inference (mesh with a spatial axis) produces
    the same detections as the unsharded Detector, with the device image
    genuinely living H-sharded."""
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

    mesh = mesh_lib.create_mesh((4, 2), ("data", "spatial"))
    det2 = detector_lib.Detector(cfg, params, postprocess_config=pp,
                                 mesh=mesh)
    d2 = jax.device_get(det2.detect_batch(images))

    np.testing.assert_allclose(d1.boxes_xyxy, d2.boxes_xyxy,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d1.scores, d2.scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(d1.classes, d2.classes)
    np.testing.assert_array_equal(d1.valid, d2.valid)

    # shard_batch residency: an H-sharded device image really holds H/2
    img = mesh_lib.shard_batch({"images": np.asarray(images)}, mesh)["images"]
    assert img.addressable_shards[0].data.shape == (2, 16, 32, 3)


def test_cli_sp_flag_guards():
    """--sp composes with neither --fsdp nor --tp; indivisible --sp and an
    sp-indivisible image height fail fast."""
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
        assert cli.main(["train", "--sp", "2", "--tp", "2"]) == 0
        args_both = captured["args"]
        assert cli.main(["train", "--sp",
                         str(len(jax.devices()) + 3)]) == 0
        args_bad = captured["args"]
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.cmd_train(args_both)
    with pytest.raises(SystemExit, match="does not divide"):
        cli.cmd_train(args_bad)
