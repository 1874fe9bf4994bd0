"""Training-stack tests: optimizer parity vs torch SGD, overfit-one-batch
convergence, multi-device data-parallel sharding on the 8-CPU-device mesh,
checkpoint save/restore."""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.config import LossConfig, OptimConfig
from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
from objectdetection_ssd_tpu.train import loop as loop_lib
from objectdetection_ssd_tpu.train.state import (TrainState,
                                                 create_train_state,
                                                 make_optimizer)


class TinySSD(nn.Module):
    """Minimal SSD-shaped model: (B, 16, 16, 3) -> ((B, 16, 4), (B, 16, 21))."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)  # 4x4
        x = nn.relu(x)
        loc = nn.Conv(4, (3, 3), padding="SAME")(x)
        conf = nn.Conv(21, (3, 3), padding="SAME")(x)
        return loc.reshape(x.shape[0], -1, 4), conf.reshape(
            x.shape[0], -1, 21)


def _tiny_priors():
    centers = (np.arange(4) + 0.5) / 4
    cy, cx = np.meshgrid(centers, centers, indexing="ij")
    pri = np.stack([cx.ravel(), cy.ravel(),
                    np.full(16, 0.25), np.full(16, 0.25)], 1)
    return jnp.asarray(pri, jnp.float32)


def _tiny_batch(bs=8, seed=0):
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


def test_optimizer_matches_torch_sgd():
    """Bit-level parity with the reference's optimizer config
    (`train.py:53-55`): SGD(lr, momentum=.9, wd=5e-4) with 2x lr on biases."""
    import torch

    rng = np.random.default_rng(0)
    kernel = rng.normal(0, 0.1, (3, 3, 4, 8)).astype(np.float32)
    bias = rng.normal(0, 0.1, (8,)).astype(np.float32)
    params = {"conv": {"kernel": jnp.asarray(kernel),
                       "bias": jnp.asarray(bias)}}

    lr = 1e-2
    cfg = OptimConfig(lr=lr, use_lr_schedule=False)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    t_kernel = torch.nn.Parameter(torch.tensor(kernel))
    t_bias = torch.nn.Parameter(torch.tensor(bias))
    t_opt = torch.optim.SGD(
        [{"params": [t_bias], "lr": 2 * lr}, {"params": [t_kernel]}],
        lr=lr, momentum=0.9, weight_decay=5e-4)

    for step in range(4):
        gk = rng.normal(0, 1, kernel.shape).astype(np.float32)
        gb = rng.normal(0, 1, bias.shape).astype(np.float32)
        grads = {"conv": {"kernel": jnp.asarray(gk), "bias": jnp.asarray(gb)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        t_opt.zero_grad()
        t_kernel.grad = torch.tensor(gk)
        t_bias.grad = torch.tensor(gb)
        t_opt.step()

        np.testing.assert_allclose(params["conv"]["kernel"],
                                   t_kernel.detach().numpy(), atol=1e-6)
        np.testing.assert_allclose(params["conv"]["bias"],
                                   t_bias.detach().numpy(), atol=1e-6)


def test_lr_schedule_step_decay():
    cfg = OptimConfig(lr=1.0, lr_decay_epochs=7, lr_decay_gamma=0.1,
                      use_lr_schedule=True)
    from objectdetection_ssd_tpu.train.state import step_decay_schedule
    sched = step_decay_schedule(1.0, 0.1, steps_per_epoch=10, decay_epochs=7)
    assert sched(0) == 1.0
    assert sched(69) == 1.0          # epoch 6
    np.testing.assert_allclose(sched(70), 0.1)   # epoch 7
    np.testing.assert_allclose(sched(140), 0.01)  # epoch 14


def test_overfit_one_batch():
    """The loss/optimizer stack must drive loss down on a fixed batch
    (SURVEY.md §4 overfit-one-batch recommendation)."""
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch()
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False), steps_per_epoch=1)
    step_fn, _ = loop_lib.make_jitted_steps(priors, LossConfig(), mesh=None,
                                            donate=False)
    _, first = step_fn(state, batch)
    for _ in range(60):
        state, metrics = step_fn(state, batch)
    assert float(metrics["loss"]) < 0.5 * float(first["loss"]), (
        float(first["loss"]), float(metrics["loss"]))


def test_scoped_vmem_compiler_option_gating(monkeypatch):
    """`TrainConfig.scoped_vmem_limit_kib` reaches jax.jit as a PJRT
    compiler option on TPU backends only: CPU (this suite) must gate it to
    None — a CPU compile would reject the TPU-specific key — and a non-CPU
    platform emits exactly {"xla_tpu_scoped_vmem_limit_kib": N}.  0/None
    disable it everywhere.  Measured train-only win, RESULTS.md
    "scoped-VMEM compiler option"."""
    # Suite runs on the forced-CPU mesh: always gated off.
    assert loop_lib.train_compiler_options(65536) is None
    assert loop_lib.train_compiler_options(None) is None
    assert loop_lib.train_compiler_options(0) is None

    class _FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(loop_lib.jax, "devices", lambda: [_FakeTpu()])
    assert loop_lib.train_compiler_options(65536) == {
        "xla_tpu_scoped_vmem_limit_kib": 65536}
    assert loop_lib.train_compiler_options(0) is None


def test_make_jitted_steps_accepts_scoped_vmem_on_cpu():
    """The plumbed kwarg is a no-op on CPU: the step still compiles and
    runs (the gate returns None before jax.jit sees the TPU option)."""
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False), steps_per_epoch=1)
    step_fn, _ = loop_lib.make_jitted_steps(priors, LossConfig(), mesh=None,
                                            donate=False,
                                            scoped_vmem_limit_kib=65536)
    _, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_data_parallel_step_matches_single_device():
    """Same batch, same params: the 8-device data-parallel jitted step must
    produce the same loss and updated params as the single-device step."""
    assert len(jax.devices()) >= 8
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=8)
    state = create_train_state(
        model, jax.random.PRNGKey(1), batch["images"][:1],
        OptimConfig(lr=0.01, use_lr_schedule=False))

    single_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                                mesh=None, donate=False)
    s1, m1 = single_step(state, batch)

    mesh = mesh_lib.create_mesh()
    dp_step, dp_eval = loop_lib.make_jitted_steps(priors, LossConfig(),
                                                  mesh=mesh, donate=False)
    state_r = mesh_lib.replicate(state, mesh)
    batch_s = mesh_lib.shard_batch(batch, mesh)
    s2, m2 = dp_step(state_r, batch_s)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    k1 = s1.params["Conv_0"]["kernel"]
    k2 = np.asarray(s2.params["Conv_0"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-6)

    e2 = dp_eval(state_r, batch_s)
    np.testing.assert_allclose(float(e2["loss"]), float(m1["loss"]),
                               rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
    model = TinySSD()
    batch = _tiny_batch(bs=2)
    state = create_train_state(
        model, jax.random.PRNGKey(2), batch["images"][:1],
        OptimConfig(use_lr_schedule=False))
    state = state.replace(step=state.step + 5)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(3, state, metadata={"history": {"train": [1.0, 0.5]}})
    mgr.wait()
    assert mgr.latest_epoch() == 3

    fresh = create_train_state(
        model, jax.random.PRNGKey(9), batch["images"][:1],
        OptimConfig(use_lr_schedule=False))
    restored, meta, epoch = mgr.restore(fresh)
    assert epoch == 3
    assert int(restored.step) == 5
    assert meta["history"]["train"] == [1.0, 0.5]
    np.testing.assert_allclose(restored.params["Conv_0"]["kernel"],
                               state.params["Conv_0"]["kernel"])
    mgr.close()


def test_ema_tracks_params():
    """EMA weights must follow e <- d*e + (1-d)*p exactly: fold the
    plain-run param trajectory by hand and compare leaf-for-leaf against
    the in-step EMA (same seeds -> identical param trajectories, since
    the EMA never feeds back into the gradients)."""
    d = 0.5
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch()

    plain = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False))
    ema_state = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False), ema=True)
    # identical starting weights
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           plain.params, ema_state.params)
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(ema_state.ema_params)[0],
        jax.tree_util.tree_leaves(ema_state.params)[0])

    plain_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                               mesh=None, donate=False)
    ema_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                             mesh=None, donate=False,
                                             ema_decay=d)
    expect_ema = jax.tree_util.tree_map(np.asarray, ema_state.ema_params)
    for _ in range(3):
        plain, _m = plain_step(plain, batch)
        ema_state, _m = ema_step(ema_state, batch)
        expect_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + np.asarray(p) * (1 - d),
            expect_ema, plain.params)
    # param trajectories identical; EMA equals the hand fold
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        plain.params, ema_state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        expect_ema, ema_state.ema_params)
    # and it genuinely lags the raw params
    k_raw = np.asarray(ema_state.params["Conv_0"]["kernel"])
    k_ema = np.asarray(ema_state.ema_params["Conv_0"]["kernel"])
    assert not np.allclose(k_raw, k_ema)


def test_ema_gated_on_grad_accum_boundary():
    """Under optax.MultiSteps the EMA must fold only when the accumulation
    window closes — otherwise --grad-accum k silently compounds the decay
    to d^k per real optimizer update (review finding)."""
    d = 0.5
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch()
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False, grad_accum_steps=2),
        ema=True)
    step_fn, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                            mesh=None, donate=False,
                                            ema_decay=d)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    expect = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for micro in range(1, 5):
        prev_params = jax.tree_util.tree_map(np.asarray, state.params)
        prev_ema = jax.tree_util.tree_map(np.asarray, state.ema_params)
        state, _m = step_fn(state, batch)
        if micro % 2 == 0:           # window closed -> params moved, fold
            expect = jax.tree_util.tree_map(
                lambda e, p: e * d + np.asarray(p) * (1 - d),
                expect, state.params)
        else:                        # mid-window -> params AND ema frozen
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    a, np.asarray(b)), prev_params, state.params)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    a, np.asarray(b)), prev_ema, state.ema_params)
    # after 4 micro-steps = 2 real updates: exactly 2 folds
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-6),
        expect, state.ema_params)
    # sanity: params did move from init
    assert not np.allclose(p0["Conv_0"]["kernel"],
                           np.asarray(state.params["Conv_0"]["kernel"]))


def test_ema_reseeded_from_pretrained_init():
    """Trainer must seed the EMA from the MERGED pretrained weights, not
    the random init (review finding: --init-torch-* + --ema-decay)."""
    import dataclasses
    from objectdetection_ssd_tpu.config import Config, ModelConfig
    from objectdetection_ssd_tpu.train.trainer import Trainer

    cfg = Config(model=ModelConfig(backbone="vgg16", image_size=64))
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, ema_decay=0.999))

    class _FakeLoader:
        records = []

        def __len__(self):
            return 1

    # Partial init tree: override the conv4_3 L2Norm scale leaf to a
    # recognizable constant.
    init = {"l2norm_4_3": {"scale": np.full((512,), 123.0, np.float32)}}
    trainer = Trainer(cfg, _FakeLoader(), init_params=init)
    np.testing.assert_allclose(
        np.asarray(trainer.state.ema_params["l2norm_4_3"]["scale"]), 123.0)


def test_ema_checkpoint_roundtrip(tmp_path):
    from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
    model = TinySSD()
    batch = _tiny_batch(bs=2)
    priors = _tiny_priors()
    state = create_train_state(
        model, jax.random.PRNGKey(2), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False), ema=True)
    step_fn, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                            mesh=None, donate=False,
                                            ema_decay=0.9)
    state, _ = step_fn(state, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, metadata={"history": {}})
    mgr.wait()
    fresh = create_train_state(
        model, jax.random.PRNGKey(9), batch["images"][:1],
        OptimConfig(lr=0.05, use_lr_schedule=False), ema=True)
    restored, _, _ = mgr.restore(fresh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.ema_params, restored.ema_params)
    mgr.close()


def test_bias_lr_path_detection():
    from objectdetection_ssd_tpu.train.state import is_bias_path
    flat = jax.tree_util.tree_flatten_with_path(
        {"conv": {"kernel": 1, "bias": 2}, "bn": {"scale": 3, "bias": 4}})[0]
    got = {jax.tree_util.keystr(p): is_bias_path(p) for p, _ in flat}
    assert got == {"['bn']['bias']": True, "['bn']['scale']": False,
                   "['conv']['bias']": True, "['conv']['kernel']": False}


def test_warmup_schedule():
    from objectdetection_ssd_tpu.train.state import make_optimizer
    cfg = OptimConfig(lr=1.0, use_lr_schedule=False, warmup_steps=10)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    # step 0: lr scaled by 1/10 -> update = -0.1 * (grad + wd*w) (momentum
    # buffer = first grad)
    updates, opt_state = tx.update(grads, opt_state, params)
    g_eff = 1.0 + 5e-4  # grad + weight decay
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -0.1 * g_eff, rtol=1e-6)


def test_train_step_deterministic():
    """Same seed + same data -> bit-identical loss trajectory."""
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch()
    step_fn, _ = loop_lib.make_jitted_steps(priors, LossConfig(), mesh=None,
                                            donate=False)

    def run():
        state = create_train_state(
            model, jax.random.PRNGKey(3), batch["images"][:1],
            OptimConfig(lr=0.01, use_lr_schedule=False))
        losses = []
        for _ in range(3):
            state, m = step_fn(state, batch)
            losses.append(float(m["loss"]))
        return losses

    np.testing.assert_array_equal(run(), run())


def test_checkpoint_retention(tmp_path):
    from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
    model = TinySSD()
    batch = _tiny_batch(bs=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(use_lr_schedule=False))
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for epoch in range(5):
        mgr.save(epoch, state)
    mgr.wait()
    assert mgr.latest_epoch() == 4
    kept = sorted(int(p.name) for p in (tmp_path / "ck").iterdir()
                  if p.name.isdigit())
    assert kept == [3, 4]
    mgr.close()


def test_eval_loss_ignores_padded_images():
    """Images padded with an all-false GT mask must contribute exactly zero
    to the batch loss (no positives -> no hard negatives kept -> nothing in
    either the numerator or the N_pos denominator), so the Trainer's
    tail-batch padding covers every val image without bias."""
    from objectdetection_ssd_tpu.losses.multibox import multibox_loss

    priors = _tiny_priors()
    batch = _tiny_batch(bs=4, seed=1)
    rng = np.random.default_rng(2)
    loc = jnp.asarray(rng.normal(0, 1, (4, 16, 4)).astype(np.float32))
    conf = jnp.asarray(rng.normal(0, 1, (4, 16, 21)).astype(np.float32))
    base = multibox_loss(loc, conf, batch["boxes"], batch["classes"],
                         batch["mask"], priors)

    def pad(x, n):
        return jnp.concatenate(
            [x, jnp.zeros((n,) + x.shape[1:], x.dtype)], axis=0)

    padded = multibox_loss(pad(loc, 4), pad(conf, 4),
                           pad(batch["boxes"], 4), pad(batch["classes"], 4),
                           pad(batch["mask"], 4), priors)
    np.testing.assert_allclose(float(padded.total), float(base.total),
                               rtol=1e-6)
    assert int(padded.num_pos) == int(base.num_pos)


def test_trainer_eval_phase_covers_tail(tmp_path):
    """drop_last=False eval loader: the phase pads the tail batch to the
    static shape and the loss average weights only real images."""
    from objectdetection_ssd_tpu.config import (Config, DataConfig,
                                                ModelConfig, TrainConfig)
    from objectdetection_ssd_tpu.data import synthetic, voc
    from objectdetection_ssd_tpu.data.pipeline import Loader
    from objectdetection_ssd_tpu.train.trainer import Trainer

    root = tmp_path / "voc"
    synthetic.generate_voc(str(root), num_2007=11, num_2012=0,
                           image_size=(64, 64), seed=5)
    records = voc.load_records(str(root), train=True)
    assert len(records) == 11                    # 8 + 3: one tail batch
    cfg = Config(
        model=ModelConfig(image_size=16),
        data=DataConfig(voc_root=str(root), batch_size=8, num_workers=0,
                        max_boxes=4),
        train=TrainConfig(num_epochs=1, checkpoint_dir=str(tmp_path / "ck"),
                          log_every_steps=0),
    )
    loader = Loader(records, cfg.data, cfg.model.image_size, train=False,
                    drop_last=False)
    assert len(loader) == 2                      # 8 + 3(padded)
    trainer = Trainer(cfg, loader, eval_loader=loader,
                      model=TinySSD(), priors=_tiny_priors())
    avg = trainer._run_phase(0, train=False)
    assert np.isfinite(avg)


def test_device_prefetch_stage_is_bit_identical(tmp_path):
    """`TrainConfig.device_prefetch` (the threaded pad+H2D pipeline stage,
    `cli train --device-prefetch`) is a scheduling change only: one train
    epoch must produce bit-identical params with the stage on and off."""
    import dataclasses

    from objectdetection_ssd_tpu.config import (Config, DataConfig,
                                                ModelConfig, TrainConfig)
    from objectdetection_ssd_tpu.data import synthetic, voc
    from objectdetection_ssd_tpu.data.pipeline import Loader
    from objectdetection_ssd_tpu.train.trainer import Trainer

    root = tmp_path / "voc"
    synthetic.generate_voc(str(root), num_2007=19, num_2012=0,
                           image_size=(64, 64), seed=7)
    records = voc.load_records(str(root), train=True)

    def run(device_prefetch):
        cfg = Config(
            model=ModelConfig(image_size=16),
            data=DataConfig(voc_root=str(root), batch_size=8,
                            num_workers=0, max_boxes=4),
            train=TrainConfig(num_epochs=1,
                              checkpoint_dir=str(tmp_path / "ck"),
                              checkpoint_every_epochs=0, log_every_steps=0,
                              device_prefetch=device_prefetch),
        )
        loader = Loader(records, cfg.data, cfg.model.image_size,
                        train=True, seed=3)
        trainer = Trainer(cfg, loader, model=TinySSD(),
                          priors=_tiny_priors())
        loss = trainer._run_phase(0, train=True)
        return loss, jax.device_get(trainer.state.params)

    loss_off, params_off = run(False)
    loss_on, params_on = run(True)
    assert loss_off == loss_on
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params_off, params_on)


def test_dropout_stream_follows_seed():
    """Two train steps that differ only in the configured seed must draw
    different dropout masks (round-1 weakness: every run reused PRNGKey(0))."""

    class DropSSD(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(4, 4), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
            loc = nn.Conv(4, (3, 3), padding="SAME")(x)
            conf = nn.Conv(21, (3, 3), padding="SAME")(x)
            return (loc.reshape(x.shape[0], -1, 4),
                    conf.reshape(x.shape[0], -1, 21))

    model = DropSSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=4, seed=3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               batch["images"][:1],
                               OptimConfig(lr=0.1, use_lr_schedule=False))
    outs = {}
    for seed in (0, 1):
        step_fn, _ = loop_lib.make_jitted_steps(
            priors, LossConfig(), mesh=None, donate=False, seed=seed)
        new_state, metrics = step_fn(state, batch)
        outs[seed] = (float(metrics["loss"]),
                      np.asarray(jax.tree_util.tree_leaves(
                          new_state.params)[0]))
    assert outs[0][0] != outs[1][0]
    assert not np.allclose(outs[0][1], outs[1][1])


def test_grad_accumulation_matches_mean_grad_step():
    """grad_accum_steps=2: params move only on the 2nd micro-step, by the
    same update a single step with the MEAN of both gradients produces."""
    import jax.numpy as jnp

    cfg = OptimConfig(lr=0.01, use_lr_schedule=False, weight_decay=0.0,
                      momentum=0.9)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    g1 = {"w": jnp.asarray([0.5, 0.1, -0.2])}
    g2 = {"w": jnp.asarray([0.1, -0.3, 0.4])}

    tx = make_optimizer(OptimConfig(**{**cfg.__dict__,
                                       "grad_accum_steps": 2}))
    st = tx.init(params)
    up1, st = tx.update(g1, st, params)
    p_mid = {"w": params["w"] + up1["w"]}
    np.testing.assert_array_equal(np.asarray(up1["w"]), 0.0)  # no update yet
    up2, st = tx.update(g2, st, p_mid)
    p_final = p_mid["w"] + up2["w"]

    ref_tx = make_optimizer(cfg)
    ref_st = ref_tx.init(params)
    g_mean = {"w": (g1["w"] + g2["w"]) / 2}
    ref_up, _ = ref_tx.update(g_mean, ref_st, params)
    np.testing.assert_allclose(np.asarray(p_final),
                               np.asarray(params["w"] + ref_up["w"]),
                               rtol=1e-6)


def test_checkpoint_roundtrip_with_grad_accum(tmp_path):
    """The MultiSteps wrapper changes the opt_state pytree; a mid-
    accumulation checkpoint must restore it (incl. the micro-step counter
    and gradient accumulator) exactly."""
    import jax.numpy as jnp
    from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
    from objectdetection_ssd_tpu.losses.multibox import multibox_loss

    model = TinySSD()
    batch = _tiny_batch(bs=4)
    priors = _tiny_priors()
    cfg = OptimConfig(lr=0.01, use_lr_schedule=False, grad_accum_steps=3)
    state = create_train_state(model, jax.random.PRNGKey(2),
                               batch["images"][:1], cfg)

    def loss_fn(params):
        loc, conf = state.apply_fn({"params": params}, batch["images"])
        return multibox_loss(loc, conf, batch["boxes"], batch["classes"],
                             batch["mask"], priors, LossConfig()).total

    grads = jax.grad(loss_fn)(state.params)
    state = state.apply_gradients(grads)      # mid-accumulation (1 of 3)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, metadata={})
    mgr.wait()
    fresh = create_train_state(model, jax.random.PRNGKey(7),
                               batch["images"][:1], cfg)
    restored, _, _ = mgr.restore(fresh)

    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored run continues the accumulation identically
    s2 = restored.apply_gradients(grads)
    s1 = state.apply_gradients(grads)
    np.testing.assert_array_equal(
        np.asarray(s1.params["Conv_0"]["kernel"]),
        np.asarray(s2.params["Conv_0"]["kernel"]))


def test_grad_accum_schedule_counts_real_updates():
    """StepLR's epoch clock must tick on optimizer updates, not loader
    micro-batches: with accumulation N, N micro-steps advance the schedule
    count once, so the decay still fires at the configured epoch."""
    import jax.numpy as jnp

    # steps_per_epoch as the Trainer computes it: ceil(loader_len / accum)
    loader_len, accum = 6, 2
    steps_per_epoch = -(-loader_len // accum)
    cfg = OptimConfig(lr=1.0, use_lr_schedule=True, lr_decay_epochs=1,
                      lr_decay_gamma=0.1, weight_decay=0.0, momentum=0.0,
                      grad_accum_steps=accum)
    tx = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
    params = {"w": jnp.ones((2,))}
    g = {"w": jnp.ones((2,))}
    st = tx.init(params)
    # First wall-clock epoch: 6 micro-steps = 3 real updates at lr 1.0.
    updates = []
    for _ in range(loader_len):
        up, st = tx.update(g, st, params)
        updates.append(float(up["w"][0]))
    real = [u for u in updates if u != 0.0]
    assert len(real) == accum * loader_len // accum // accum  # 3 updates
    np.testing.assert_allclose(real, -1.0)       # epoch 0: lr 1.0
    # Second epoch: schedule count has reached steps_per_epoch -> lr 0.1.
    for _ in range(accum):
        up, st = tx.update(g, st, params)
    np.testing.assert_allclose(float(up["w"][0]), -0.1, rtol=1e-6)


def test_remat_step_matches_plain_step():
    """remat=True (stage-boundary gradient checkpointing) must change HBM
    use only, never numerics: one step's loss and updated params are
    identical to the plain step."""
    model = TinySSD()
    priors = _tiny_priors()
    batch = _tiny_batch(bs=4)
    state = create_train_state(
        model, jax.random.PRNGKey(2), batch["images"][:1],
        OptimConfig(lr=0.01, use_lr_schedule=False))
    plain, _ = loop_lib.make_jitted_steps(priors, LossConfig(), mesh=None,
                                          donate=False)
    remat, _ = loop_lib.make_jitted_steps(priors, LossConfig(), mesh=None,
                                          donate=False, remat=True)
    s1, m1 = plain(state, batch)
    s2, m2 = remat(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
        s1.params, s2.params)


def test_remat_vgg_trunk_markers_exist():
    """The VGG trunk carries stage-boundary checkpoint_name markers (the
    remat policy keys on them).  The stage graph lives in apply_vgg_stages
    (shared with the pipeline-parallel stage split), not VGG16Trunk's body.
    """
    from objectdetection_ssd_tpu.models import backbones
    import inspect
    src = inspect.getsource(backbones.apply_vgg_stages)
    assert src.count("checkpoint_name") >= 5
    assert backbones.VGG_STAGE_CKPT
