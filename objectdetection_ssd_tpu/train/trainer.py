"""High-level Trainer: epochs, train/eval phases, checkpointing, resume.

The structured replacement for the reference's `train_model`
(`train_function.py:12-134`): per epoch run a train phase and an eval
('test') phase over the held-out split, track per-phase epoch losses,
checkpoint every epoch, optionally resume.  Differences by design: metrics
go through MetricsLogger instead of prints, checkpoints are orbax (async)
at a configured path, lr schedule actually steps (see train/state.py), and
periodic mAP evaluation is available as a callback.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax

from objectdetection_ssd_tpu.config import Config
from objectdetection_ssd_tpu.data.pipeline import Loader, prefetch
from objectdetection_ssd_tpu.models.ssd import build_model
from objectdetection_ssd_tpu.ops import priors as priors_lib
from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
from objectdetection_ssd_tpu.train import loop as loop_lib
from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
from objectdetection_ssd_tpu.train.state import TrainState, create_train_state
from objectdetection_ssd_tpu.utils.metrics import (MetricsLogger, logger,
                                                   setup_logging)


class Trainer:
    def __init__(self, config: Config, train_loader: Loader,
                 eval_loader: Optional[Loader] = None,
                 mesh=None,
                 epoch_callback: Optional[Callable[[int, "Trainer"], None]]
                 = None,
                 model=None, priors=None,
                 init_params=None, init_batch_stats=None,
                 pp_build=None):
        """``init_params`` / ``init_batch_stats``: converted pretrained
        weights (see models/convert.py) merged over the random init — the
        reference's flagship recipe starts from a pretrained torchvision
        trunk (`Model.py:131-161`).  Partial trees are fine (e.g. only
        ``{"trunk": ...}``); every provided leaf must match the model.

        ``pp_build``: override for the pipeline-parallel stage builder used
        when ``config.train.pp_stages > 1`` — a callable
        ``(model, params, num_stages, devices, microbatches, dp) ->
        (runner, split_fn, merge_fn)`` (``dp`` = per-stage data-parallel
        ways, `--pp-dp`).  Default dispatches on the model family
        (`parallel.pipeline.build_pipeline_for`, SSD300)."""
        setup_logging()
        from objectdetection_ssd_tpu.xla_options import (
            apply_compilation_cache)
        apply_compilation_cache(config.train.compilation_cache_dir)
        self.config = config
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self._pp = None
        self._pp_build = pp_build
        pp = config.train.pp_stages
        if pp > 1:
            # Pipeline parallelism owns device placement (staged-jit over
            # devices[0..N-1]); the mesh degenerates to the first device so
            # the shared shard_batch/local_batch_size plumbing stays valid.
            if mesh is not None:
                raise ValueError(
                    "--pp provides its own device placement; do not pass a "
                    "mesh (fsdp/tp/sp and pp are mutually exclusive)")
            if jax.process_count() > 1:
                raise ValueError(
                    "--pp is single-controller (one process drives all "
                    "stages); it does not compose with multi-host runs")
            dp = max(config.train.pp_dp, 1)
            if len(jax.devices()) < pp * dp:
                raise ValueError(
                    f"--pp {pp} x --pp-dp {dp} needs {pp * dp} devices; "
                    f"{len(jax.devices())} available")
            mb = max(config.train.pp_microbatches, 1)
            if config.data.batch_size % mb:
                raise ValueError(
                    f"batch size {config.data.batch_size} not divisible by "
                    f"--pp-microbatches {mb}")
            if (config.data.batch_size // mb) % dp:
                raise ValueError(
                    f"microbatch rows {config.data.batch_size // mb} not "
                    f"divisible by --pp-dp {dp}")
            mesh = mesh_lib.create_mesh((1,), devices=jax.devices()[:1])
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh(
            config.train.mesh_shape, config.train.mesh_axis_names)
        self.epoch_callback = epoch_callback

        # Fail fast on a batch the mesh can't shard (clearer than the
        # device_put error deep inside the first step).
        mesh_lib.local_batch_size(config.data.batch_size, self.mesh)
        sp = mesh_lib.spatial_ways(self.mesh)
        if config.model.image_size % sp:
            raise ValueError(
                f"image_size {config.model.image_size} not divisible by "
                f"the spatial mesh axis ({sp} ways)")

        # Multi-host: every host feeds only its rows of the global batch
        # (`Loader(shard=...)` + `mesh.shard_batch`'s process-local
        # assembly).  A loader without the matching shard would device_put
        # rows this host doesn't own — fail fast instead.
        self._n_proc = jax.process_count()
        if self._n_proc > 1:
            want = (jax.process_index(), self._n_proc)
            for name, ld in (("train", train_loader), ("eval", eval_loader)):
                if ld is not None and getattr(ld, "shard", None) != want:
                    raise ValueError(
                        f"{name}_loader must be built with shard={want} "
                        f"when running {self._n_proc} processes "
                        "(see data/pipeline.py:Loader)")

        self.model = model if model is not None else build_model(config.model)
        self.priors = (jax.numpy.asarray(priors) if priors is not None else
                       jax.numpy.asarray(priors_lib.priors_for_model(
                           config.model, config.priors)))
        # The LR schedule count advances once per REAL optimizer update
        # (optax.MultiSteps holds it during accumulation), so the StepLR
        # epoch clock must count updates, not loader micro-batches.
        accum = max(config.optim.grad_accum_steps, 1)
        steps_per_epoch = max(-(-len(train_loader) // accum), 1)
        rng = jax.random.PRNGKey(config.train.seed)
        sample = jax.numpy.zeros(
            (1, config.model.image_size, config.model.image_size, 3),
            jax.numpy.float32)
        self.state: TrainState = create_train_state(
            self.model, rng, sample, config.optim, steps_per_epoch,
            ema=config.train.ema_decay > 0)
        if init_params is not None:
            from objectdetection_ssd_tpu.models.convert import merge_params
            self.state = self.state.replace(
                params=merge_params(self.state.params, init_params))
            if self.state.ema_params is not None:
                # Re-seed the EMA from the MERGED weights: seeding from the
                # random init would make --use-ema carry ~d^n of random
                # weights for ~1/(1-d) steps after --init-torch-* loads.
                self.state = self.state.replace(
                    ema_params=jax.tree_util.tree_map(
                        jax.numpy.array, self.state.params))
        if init_batch_stats is not None:
            from objectdetection_ssd_tpu.models.convert import merge_params
            self.state = self.state.replace(
                batch_stats=merge_params(self.state.batch_stats,
                                         init_batch_stats))
        # State layout: replicated by default; FSDP-sharded (ZeRO-3) when
        # the mesh carries an 'fsdp' axis of size > 1 (e.g.
        # TrainConfig.mesh_shape=(4, 2), mesh_axis_names=("data", "fsdp"));
        # tensor-parallel (channel-sharded params, conv compute partitioned
        # over the axis — parallel/mesh.py:tp_sharding_for) when it carries
        # a 'model' axis instead (("data", "model"), --tp on the CLI).
        # A 'spatial' axis (("data", "spatial"), --sp) keeps params
        # replicated: the image H dim shards instead (mesh.image_sharding,
        # wired through shard_batch + make_jitted_steps) and GSPMD
        # partitions the convs with halo exchange.
        state_sharding = None
        if "fsdp" in self.mesh.axis_names and self.mesh.shape["fsdp"] > 1:
            state_sharding = mesh_lib.state_fsdp_shardings(self.state,
                                                           self.mesh)
            self.state = jax.device_put(self.state, state_sharding)
        elif "model" in self.mesh.axis_names and self.mesh.shape["model"] > 1:
            state_sharding = mesh_lib.state_tp_shardings(self.state,
                                                         self.mesh)
            self.state = jax.device_put(self.state, state_sharding)
        else:
            self.state = mesh_lib.replicate(self.state, self.mesh)

        self._state_sharding = state_sharding
        if pp > 1:
            from objectdetection_ssd_tpu.parallel import pipeline as pp_lib
            build = (self._pp_build if self._pp_build is not None
                     else pp_lib.build_pipeline_for)
            dp = max(config.train.pp_dp, 1)
            runner, split_fn, merge_fn = build(
                self.model, self.state.params, pp,
                jax.devices()[:pp * dp],
                max(config.train.pp_microbatches, 1), dp)
            self._pp = (runner, split_fn, merge_fn)
        self._build_steps()
        self.ckpt = CheckpointManager(
            config.train.checkpoint_dir,
            max_to_keep=config.train.max_checkpoints_to_keep)
        self.start_epoch = 0
        self.history: Dict[str, List[float]] = {"train": [], "test": []}
        # TensorBoard writes are primary-process-only (every process would
        # otherwise write a clashing event file).  Checkpoint saves stay
        # collective: orbax's multi-host protocol has every process write
        # its addressable shards and the primary commit the metadata.
        self.tb = None
        if config.train.tensorboard_dir and jax.process_index() == 0:
            from objectdetection_ssd_tpu.utils.metrics import TensorBoardWriter
            self.tb = TensorBoardWriter(config.train.tensorboard_dir)

    def _build_steps(self, quant_ste=None) -> None:
        cfg = self.config
        if self._pp is not None:
            if quant_ste is not None:
                raise ValueError(
                    "--qat does not compose with --pp (the staged programs "
                    "have no fake-quant path); QAT-train on the GSPMD "
                    "strategies, then serve the checkpoint however you like")
            runner, split_fn, merge_fn = self._pp
            self.train_step, self.eval_step = loop_lib.make_pp_steps(
                runner, split_fn, merge_fn, self.priors, cfg.loss,
                ema_decay=cfg.train.ema_decay,
                donate=cfg.train.donate_state)
            return
        self.train_step, self.eval_step = loop_lib.make_jitted_steps(
            self.priors, cfg.loss, mesh=self.mesh,
            donate=cfg.train.donate_state, seed=cfg.train.seed,
            state_sharding=self._state_sharding, remat=cfg.train.remat,
            scoped_vmem_limit_kib=cfg.train.scoped_vmem_limit_kib,
            ema_decay=cfg.train.ema_decay, quant_ste=quant_ste)

    def enable_qat(self, quant_ste) -> None:
        """Rebuild the jitted steps with QAT fake-quant convs.

        ``quant_ste``: act-scale tree from `infer.quant.act_scales` —
        calibrate AFTER pretrained-init/resume so the scales describe the
        weights actually being fine-tuned (cli.py does this ordering).
        Training then runs every calibrated conv through the
        straight-through fake-quant path (`models/layers.py:Int8Conv`), so
        the fine-tuned checkpoint serves int8 with the SAME scales at ~no
        accuracy cost (the CI recovery test pins this)."""
        import jax.numpy as jnp
        self._build_steps(quant_ste=jax.tree_util.tree_map(
            jnp.asarray, quant_ste))

    def maybe_resume(self) -> bool:
        """Resume from the latest checkpoint if one exists
        (reference `loadModel=True` path, `train_function.py:25-34`)."""
        if self.ckpt.latest_epoch() is None:
            return False
        self.state, meta, epoch = self.ckpt.restore(self.state)
        self.start_epoch = epoch + 1
        self.history = meta.get("history", self.history)
        logger.info("resumed from epoch %d", epoch)
        return True

    def _run_phase(self, epoch: int, train: bool) -> float:
        import numpy as np
        loader = self.train_loader if train else self.eval_loader
        phase = "train" if train else "test"
        on_log = None
        if self.tb is not None:
            base = epoch * max(len(loader), 1)
            on_log = lambda step, scalars: self.tb.scalars(  # noqa: E731
                phase, base + step, scalars)
        mlog = MetricsLogger(self.config.train.log_every_steps, prefix=phase,
                             on_log=on_log)
        n_images = 0
        full_bs = loader.config.batch_size
        # Each process holds 1/n_proc of every global batch's rows
        # (Loader(shard=...)); on one process local == global.
        local_full = full_bs // self._n_proc
        def to_device(host_iter):
            for batch in host_iter:
                # Real GLOBAL row count (metric weighting); == local
                # shape[0] on a single process.
                gbs = int(batch.pop("global_size",
                                    batch["images"].shape[0]))
                batch = {k: v for k, v in batch.items()
                         if k != "image_ids"}
                if batch["images"].shape[0] < local_full:
                    # Pad the tail batch to the static batch shape (one XLA
                    # compilation, mesh-divisible).  Padded images carry an
                    # all-false GT mask, so they contribute zero positives
                    # and zero hard negatives — the batch loss is exactly
                    # the loss over the real images (the reference
                    # evaluates its full held-out phase,
                    # `train_function.py:47-52`).
                    pad = local_full - batch["images"].shape[0]
                    batch = {k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                        for k, v in batch.items()}
                yield gbs, mesh_lib.shard_batch(batch, self.mesh)

        stream = to_device(prefetch(loader.epoch(epoch)))
        if self.config.train.device_prefetch:
            # Second pipeline stage on its own thread: the H2D copy of
            # batch N+1 overlaps BOTH the host prep of batch N+2 and the
            # device step of batch N.
            stream = prefetch(stream)
        for gbs, batch in stream:
            if train:
                self.state, metrics = self.train_step(self.state, batch)
            else:
                metrics = self.eval_step(self.state, batch)
            # No per-step host pull: metrics stay device-resident so steps
            # pipeline with the next batch's host prep + H2D copy; MetricsLogger
            # syncs only on its log cadence and at epoch end.
            mlog.update(metrics, gbs)
            n_images += gbs
        if n_images == 0:
            logger.warning("epoch %d [%s] had no full batches "
                           "(%d records < batch size?)", epoch, phase,
                           len(loader.records))
            return float("nan")
        avg = mlog.summary()["loss"]
        logger.info("epoch %d [%s] loss=%.4f", epoch, phase, avg)
        if self.tb is not None:
            self.tb.scalars(f"epoch_{phase}", epoch, mlog.summary())
        return avg

    def fit(self, num_epochs: Optional[int] = None,
            profile_dir: Optional[str] = None) -> TrainState:
        """Run the epoch loop.

        Failure recovery: any exception mid-epoch triggers a best-effort
        emergency checkpoint at the last completed epoch before re-raising,
        so a crashed run resumes with `maybe_resume()` (the reference's only
        recovery is its per-epoch save, `train_function.py:114-120`).

        ``profile_dir``: capture a `jax.profiler` trace of the first epoch.
        """
        from objectdetection_ssd_tpu.utils.metrics import profiler_trace
        num_epochs = num_epochs or self.config.train.num_epochs
        epoch = self.start_epoch
        try:
            for epoch in range(self.start_epoch, num_epochs):
                t0 = time.perf_counter()
                with profiler_trace(
                        profile_dir if epoch == self.start_epoch else None):
                    self.history["train"].append(
                        self._run_phase(epoch, train=True))
                if self.eval_loader is not None:
                    self.history["test"].append(
                        self._run_phase(epoch, train=False))
                if (epoch + 1) % self.config.train.checkpoint_every_epochs == 0:
                    self.ckpt.save(epoch, self.state,
                                   metadata={"history": self.history})
                if self.epoch_callback is not None:
                    self.epoch_callback(epoch, self)
                logger.info("epoch %d done in %.1fs", epoch,
                            time.perf_counter() - t0)
        except Exception:
            logger.exception(
                "training failed at epoch %d; writing emergency checkpoint",
                epoch)
            try:
                # Finalize any in-flight async save first, then save the
                # mid-epoch state under the failed epoch's index if that
                # epoch has no checkpoint yet; resume continues from the
                # next epoch.
                self.ckpt.wait()
                if self.ckpt.latest_epoch() != epoch:
                    self.ckpt.save(epoch, self.state,
                                   metadata={"history": self.history,
                                             "emergency": True})
                self.ckpt.wait()
            except Exception:
                logger.exception("emergency checkpoint failed")
            raise
        self.ckpt.wait()
        if self.tb is not None:
            self.tb.close()
        return self.state
