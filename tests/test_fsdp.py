"""FSDP parameter sharding over a 2-D (data x fsdp) mesh.

The reference is single-device (SURVEY.md §2); data-parallel is this
framework's default strategy, and the mesh layer is N-axis capable.  These
tests pin the FSDP axis: params/momentum live sharded (1/N per device,
ZeRO-3 style), XLA all-gathers them at use and reduce-scatters gradients,
and one train step is numerically equivalent to the single-device step.
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


def _fsdp_mesh():
    assert len(jax.devices()) >= 8
    return mesh_lib.create_mesh((4, 2), ("data", "fsdp"))


def test_fsdp_sharding_picks_divisible_dim():
    mesh = _fsdp_mesh()
    s = mesh_lib.fsdp_sharding_for(jnp.zeros((3, 3, 8, 16)), mesh)
    assert s.spec == P(None, None, None, "fsdp")
    # no dim divisible by 2 -> replicated
    s = mesh_lib.fsdp_sharding_for(jnp.zeros((3, 5)), mesh)
    assert s.spec == P()
    # scalars replicated
    s = mesh_lib.fsdp_sharding_for(jnp.zeros(()), mesh)
    assert s.spec == P()


def test_batch_shards_over_both_mesh_axes():
    """On a (data x fsdp) mesh the batch's leading dim spreads over BOTH
    axes (ZeRO-3: params gathered over fsdp, every device computes distinct
    examples) — sharding over 'data' alone would replicate forward/backward
    work and double per-chip activation memory across the fsdp axis."""
    mesh = _fsdp_mesh()
    assert mesh_lib.batch_axes(mesh) == ("data", "fsdp")
    s = mesh_lib.batch_sharding(mesh)
    assert s.spec == P(("data", "fsdp"))
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = mesh_lib.shard_batch(x, mesh)
    assert all(sh.data.shape == (1, 4) for sh in xs.addressable_shards)
    assert mesh_lib.local_batch_size(8, mesh) == 1
    # a 1-D data mesh is unchanged
    data_mesh = mesh_lib.create_mesh()
    assert mesh_lib.batch_axes(data_mesh) == ("data",)
    assert mesh_lib.batch_sharding(data_mesh).spec == P(("data",))


def test_fsdp_step_matches_single_device():
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=8)
    state = create_train_state(
        model, jax.random.PRNGKey(1), batch["images"][:1],
        OptimConfig(lr=0.01, use_lr_schedule=False))

    single_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                                mesh=None, donate=False)
    s1, m1 = single_step(state, batch)

    mesh = _fsdp_mesh()
    state_shardings = mesh_lib.state_fsdp_shardings(state, mesh)
    state_f = jax.device_put(state, state_shardings)
    fsdp_step, fsdp_eval = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=mesh, donate=False,
        state_sharding=state_shardings)
    batch_s = mesh_lib.shard_batch(batch, mesh)
    s2, m2 = fsdp_step(state_f, batch_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    k1 = np.asarray(s1.params["Conv_0"]["kernel"])
    k2 = np.asarray(s2.params["Conv_0"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-6)

    # params actually live sharded: each leaf's sharding matches the plan
    planned = mesh_lib.fsdp_sharding_for(
        s2.params["Conv_0"]["kernel"], mesh)
    assert s2.params["Conv_0"]["kernel"].sharding.spec == planned.spec

    e2 = fsdp_eval(s2, batch_s)
    assert np.isfinite(float(e2["loss"]))


def test_trainer_runs_fsdp_mesh(tmp_path):
    """Trainer auto-selects FSDP state sharding when the configured mesh
    carries an fsdp axis; one epoch over synthetic data trains and
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
                          tensorboard_dir=str(tmp_path / "tb"),
                          mesh_shape=(4, 2),
                          mesh_axis_names=("data", "fsdp")),
    )
    loader = Loader(records, cfg.data, cfg.model.image_size, train=True,
                    seed=0)
    trainer = Trainer(cfg, loader, model=TinyDet(), priors=det_priors())
    # state actually lives sharded over the fsdp axis
    kern = trainer.state.params["Conv_0"]["kernel"]
    assert kern.sharding.spec == mesh_lib.fsdp_sharding_for(
        kern, trainer.mesh).spec
    state = trainer.fit()
    assert np.isfinite(trainer.history["train"][-1])
    assert int(state.step) == len(loader)
    import glob
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))


def test_checkpoint_reshard_roundtrip(tmp_path):
    """Elastic resume across mesh layouts: a checkpoint written from an
    FSDP-sharded state restores into a replicated state (different mesh,
    different shardings) with identical values — and vice versa."""
    from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager

    model = TinySSD()
    batch = _tiny_batch(bs=2)
    state = create_train_state(
        model, jax.random.PRNGKey(3), batch["images"][:1],
        OptimConfig(use_lr_schedule=False))

    mesh = _fsdp_mesh()
    sharded = jax.device_put(state,
                             mesh_lib.state_fsdp_shardings(state, mesh))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, sharded, metadata={})
    mgr.wait()

    # restore into a replicated layout on a plain data mesh
    data_mesh = mesh_lib.create_mesh()
    target = mesh_lib.replicate(state, data_mesh)
    restored, _, epoch = mgr.restore(target)
    assert epoch == 0
    k_src = np.asarray(sharded.params["Conv_0"]["kernel"])
    k_dst = np.asarray(restored.params["Conv_0"]["kernel"])
    np.testing.assert_array_equal(k_src, k_dst)
    assert restored.params["Conv_0"]["kernel"].sharding.is_fully_replicated

    # and back: replicated checkpoint -> FSDP-sharded target
    mgr2 = CheckpointManager(str(tmp_path / "ck2"))
    mgr2.save(0, restored, metadata={})
    mgr2.wait()
    target2 = jax.device_put(state,
                             mesh_lib.state_fsdp_shardings(state, mesh))
    restored2, _, _ = mgr2.restore(target2)
    np.testing.assert_array_equal(
        np.asarray(restored2.params["Conv_0"]["kernel"]), k_src)
    planned = mesh_lib.fsdp_sharding_for(
        restored2.params["Conv_0"]["kernel"], mesh)
    assert restored2.params["Conv_0"]["kernel"].sharding.spec == planned.spec


def test_fsdp_memory_footprint_is_sharded():
    """Each device's addressable shard of a big FSDP leaf is 1/N the bytes."""
    mesh = _fsdp_mesh()
    x = jnp.zeros((128, 64))
    xs = jax.device_put(x, mesh_lib.fsdp_sharding_for(x, mesh))
    shard = xs.addressable_shards[0]
    assert shard.data.size == x.size // mesh.shape["fsdp"]


def test_fsdp_ema_shards_and_matches_single_device():
    """EMA rides the TrainState pytree, so under FSDP its leaves shard
    exactly like the params (state_fsdp_shardings tree-maps the WHOLE
    state) and the averaged values equal the single-device run."""
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=8)
    state = create_train_state(
        model, jax.random.PRNGKey(1), batch["images"][:1],
        OptimConfig(lr=0.01, use_lr_schedule=False), ema=True)

    d = 0.9
    single_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                                mesh=None, donate=False,
                                                ema_decay=d)
    s1, _ = single_step(state, batch)

    mesh = _fsdp_mesh()
    shardings = mesh_lib.state_fsdp_shardings(state, mesh)
    # at least one EMA slot is genuinely sharded over fsdp
    some_sharded = any(
        s.spec != P() for s in jax.tree_util.tree_leaves(
            shardings.ema_params)
        if hasattr(s, "spec"))
    assert some_sharded, "no EMA leaf picked up an fsdp sharding"
    state_f = jax.device_put(state, shardings)
    fsdp_step, _ = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=mesh, donate=False,
        state_sharding=shardings, ema_decay=d)
    s2, _ = fsdp_step(state_f, mesh_lib.shard_batch(batch, mesh))

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(s1.ema_params), jax.device_get(s2.ema_params))
