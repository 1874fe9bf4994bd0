"""`train --pp` — pipeline parallelism as a full training surface.

Pins the round-4 productization contract (train/loop.py:make_pp_steps +
Trainer wiring): the staged step is numerically the monolithic step at
microbatches=1 (params, EMA, metrics), follows `--grad-accum` semantics at
M>1, runs end-to-end through the Trainer on the real SSD300 with epoch
losses equal to the monolith, and writes MONOLITHIC checkpoints that a
non-pp Trainer resumes bit-for-bit (strategy interchangeability).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.config import (Config, DataConfig, LossConfig,
                                            ModelConfig, OptimConfig,
                                            TrainConfig)
from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
from objectdetection_ssd_tpu.parallel.pipeline import PipelineRunner
from objectdetection_ssd_tpu.train import loop as loop_lib
from objectdetection_ssd_tpu.train.state import create_train_state


class _Feat(nn.Module):
    @nn.compact
    def __call__(self, x):                      # (B,16,16,3) -> (B,4,4,8)
        x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME", name="c")(x)
        return nn.relu(x)


class _Heads(nn.Module):
    @nn.compact
    def __call__(self, h):                      # -> ((B,16,4), (B,16,21))
        loc = nn.Conv(4, (3, 3), padding="SAME", name="loc")(h)
        conf = nn.Conv(21, (3, 3), padding="SAME", name="conf")(h)
        return (loc.reshape(h.shape[0], -1, 4),
                conf.reshape(h.shape[0], -1, 21))


class _MonoDet(nn.Module):
    """The two stages as one module (shared submodule names)."""

    @nn.compact
    def __call__(self, x, train=False):
        return _Heads(name="heads")(_Feat(name="feat")(x))


def _split(p):
    return [{"params": p["feat"]}, {"params": p["heads"]}]


def _merge(gs):
    return {"feat": gs[0]["params"], "heads": gs[1]["params"]}


def _priors():
    centers = (np.arange(4) + 0.5) / 4
    cy, cx = np.meshgrid(centers, centers, indexing="ij")
    return jnp.asarray(np.stack([cx.ravel(), cy.ravel(),
                                 np.full(16, 0.25), np.full(16, 0.25)], 1),
                       jnp.float32)


def _batch(bs=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(0, 1, (bs, 16, 16, 3)).astype(np.float32)
    boxes = np.zeros((bs, 2, 4), np.float32)
    classes = np.zeros((bs, 2), np.int32)
    mask = np.zeros((bs, 2), bool)
    for i in range(bs):
        lo = rng.uniform(0.05, 0.5, 2)
        wh = rng.uniform(0.2, 0.4, 2)
        boxes[i, 0] = [lo[0], lo[1], lo[0] + wh[0], lo[1] + wh[1]]
        classes[i, 0] = rng.integers(0, 20)
        mask[i, 0] = True
    return {"images": jnp.asarray(imgs), "boxes": jnp.asarray(boxes),
            "classes": jnp.asarray(classes), "mask": jnp.asarray(mask)}


def _state(optim=None, ema=False):
    model = _MonoDet()
    return create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
        optim or OptimConfig(lr=0.05, use_lr_schedule=False),
        steps_per_epoch=1, ema=ema)


def _runner(state, microbatches):
    fns = [_Feat().apply, _Heads().apply]
    return PipelineRunner(fns, _split(state.params),
                          devices=jax.devices()[:2],
                          microbatches=microbatches)


def _assert_trees_close(a, b, **kw):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), **kw)


def test_pp_steps_match_monolithic_steps():
    """M=1: the pp train/eval steps are numerically `make_jitted_steps`
    over several optimizer updates, including the EMA average."""
    priors = _priors()
    s_mono = _state(ema=True)
    s_pp = _state(ema=True)
    mono_train, mono_eval = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=None, donate=False, ema_decay=0.99)
    runner = _runner(s_pp, microbatches=1)
    pp_train, pp_eval = loop_lib.make_pp_steps(
        runner, _split, _merge, priors, LossConfig(), ema_decay=0.99,
        donate=False)

    for step in range(3):
        batch = _batch(seed=step)
        s_mono, m_mono = mono_train(s_mono, batch)
        s_pp, m_pp = pp_train(s_pp, batch)
        for k in m_mono:
            np.testing.assert_allclose(np.asarray(m_pp[k]),
                                       np.asarray(m_mono[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
    _assert_trees_close(s_pp.params, s_mono.params, rtol=1e-5, atol=1e-7)
    _assert_trees_close(s_pp.ema_params, s_mono.ema_params,
                        rtol=1e-5, atol=1e-7)
    assert int(s_pp.step) == int(s_mono.step) == 3

    e_mono = mono_eval(s_mono, _batch(seed=9))
    e_pp = pp_eval(s_pp, _batch(seed=9))
    for k in e_mono:
        np.testing.assert_allclose(np.asarray(e_pp[k]),
                                   np.asarray(e_mono[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_pp_microbatches_follow_grad_accum_semantics():
    """One pp step with M=2 == two monolithic half-batch steps under
    optax.MultiSteps(every_k=2) — the framework's --grad-accum contract."""
    priors = _priors()
    s_acc = _state(OptimConfig(lr=0.05, use_lr_schedule=False,
                               grad_accum_steps=2))
    s_pp = _state(OptimConfig(lr=0.05, use_lr_schedule=False))
    mono_train, _ = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=None, donate=False)
    runner = _runner(s_pp, microbatches=2)
    pp_train, _ = loop_lib.make_pp_steps(
        runner, _split, _merge, priors, LossConfig(), donate=False)

    batch = _batch(bs=8, seed=3)
    s_pp, _ = pp_train(s_pp, batch)
    for half in (jax.tree_util.tree_map(lambda a: a[:4], batch),
                 jax.tree_util.tree_map(lambda a: a[4:], batch)):
        s_acc, _ = mono_train(s_acc, half)
    _assert_trees_close(s_pp.params, s_acc.params, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_trainer_pp_equals_monolith_and_checkpoints_interchange(
        tmp_path_factory):
    """`cli train --pp 2` semantics on the real SSD300: epoch losses equal
    the monolithic Trainer's, and the (monolithic) checkpoint a --pp run
    writes resumes in a plain data-parallel Trainer bit-for-bit."""
    from objectdetection_ssd_tpu.data import synthetic, voc
    from objectdetection_ssd_tpu.data.pipeline import Loader
    from objectdetection_ssd_tpu.train.trainer import Trainer

    root = tmp_path_factory.mktemp("voc")
    synthetic.generate_voc(str(root), num_2007=4, num_2012=2,
                           image_size=(320, 320), seed=3)
    records = voc.load_records(str(root), train=True)
    train_ids, val_ids = voc.train_val_split(len(records), 1 / 3, seed=10)

    def run(pp_stages, ckpt_dir):
        cfg = Config(
            data=DataConfig(voc_root=str(root), batch_size=2,
                            num_workers=0, max_boxes=8),
            optim=OptimConfig(lr=1e-4, use_lr_schedule=False),
            train=TrainConfig(num_epochs=1, seed=0, log_every_steps=0,
                              checkpoint_dir=str(ckpt_dir),
                              pp_stages=pp_stages, donate_state=False),
        )
        # 1-device mesh for the monolith: bs=2 can't shard over the 8
        # virtual CPU devices, and it matches the pp run's data stream.
        mesh = (None if pp_stages else
                mesh_lib.create_mesh((1,), devices=jax.devices()[:1]))
        train_loader = Loader([records[i] for i in train_ids], cfg.data,
                              cfg.model.image_size, train=True, seed=0)
        eval_loader = Loader([records[i] for i in val_ids], cfg.data,
                             cfg.model.image_size, train=False,
                             drop_last=False)
        trainer = Trainer(cfg, train_loader, eval_loader, mesh=mesh)
        state = trainer.fit()
        return cfg, trainer, state

    _, tr_pp, s_pp = run(2, tmp_path_factory.mktemp("ckpt_pp"))
    _, tr_mono, s_mono = run(0, tmp_path_factory.mktemp("ckpt_mono"))

    np.testing.assert_allclose(tr_pp.history["train"],
                               tr_mono.history["train"], rtol=1e-5)
    np.testing.assert_allclose(tr_pp.history["test"],
                               tr_mono.history["test"], rtol=1e-5)
    _assert_trees_close(s_pp.params, s_mono.params, rtol=1e-4, atol=1e-6)

    # Strategy interchange: a NON-pp trainer resumes the --pp checkpoint.
    cfg2 = Config(
        data=DataConfig(voc_root=str(root), batch_size=2, num_workers=0,
                        max_boxes=8),
        optim=OptimConfig(lr=1e-4, use_lr_schedule=False),
        train=TrainConfig(num_epochs=1, seed=0, log_every_steps=0,
                          checkpoint_dir=tr_pp.config.train.checkpoint_dir),
    )
    train_loader = Loader([records[i] for i in train_ids], cfg2.data,
                          cfg2.model.image_size, train=True, seed=0)
    resumed = Trainer(cfg2, train_loader,
                      mesh=mesh_lib.create_mesh((1,),
                                                devices=jax.devices()[:1]))
    assert resumed.maybe_resume()
    assert resumed.start_epoch == 1
    _assert_trees_close(resumed.state.params, s_pp.params,
                        rtol=0, atol=0)


def test_trainer_rejects_bad_pp_configs():
    from objectdetection_ssd_tpu.train.trainer import Trainer

    cfg = Config(
        data=DataConfig(batch_size=3, num_workers=0),
        train=TrainConfig(pp_stages=2, pp_microbatches=2, seed=0),
    )
    with pytest.raises(ValueError, match="divisible"):
        Trainer(cfg, train_loader=None)
    cfg = Config(train=TrainConfig(pp_stages=99, seed=0))
    with pytest.raises(ValueError, match="devices"):
        Trainer(cfg, train_loader=None)
