"""Jitted train/eval steps with first-class mesh sharding.

One XLA program per step: forward, fused multibox loss, backward, SGD
update.  The reference's step crosses host<->device repeatedly (ragged list
copies `train_function.py:61-63`, Python batch loops in the loss, `.item()`
sync every step `train_function.py:98`); here everything after the host
batcher is device-resident, and with a multi-device ``data`` mesh XLA
all-reduces gradients over ICI automatically (params replicated, batch
sharded — SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from objectdetection_ssd_tpu.config import LossConfig
from objectdetection_ssd_tpu.losses.multibox import multibox_loss
from objectdetection_ssd_tpu.train.state import TrainState


def _forward(state: TrainState, params, batch, priors, rng, train: bool,
             quant_ste=None):
    """Model apply handling optional BN stats / dropout rngs.

    uint8 image batches (the default transfer dtype) are normalized here so
    ANY model — including custom modules injected into the Trainer — sees
    ImageNet-normalized floats; float batches pass through untouched (our
    models' own `prepare_input` is a float no-op then).

    ``quant_ste``: optional int8 act-scale tree (`infer.quant.act_scales`)
    — convs with an entry train through the differentiable fake-quant path
    (QAT; `models/layers.py:Int8Conv(straight_through=True)`), so the
    fine-tuned weights serve int8 with the SAME scales at ~no mAP cost.
    """
    from objectdetection_ssd_tpu.models.ssd import prepare_input
    batch = dict(batch)
    batch["images"] = prepare_input(batch["images"], jnp.float32)
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    if quant_ste is not None:
        variables["quant_ste"] = quant_ste
    kwargs = {}
    if train:
        kwargs["rngs"] = {"dropout": rng}
    if state.batch_stats is not None and train:
        (loc, conf), updates = state.apply_fn(
            variables, batch["images"], train=True,
            mutable=["batch_stats"], **kwargs)
        return loc, conf, updates["batch_stats"]
    loc, conf = state.apply_fn(variables, batch["images"], train=train,
                               **kwargs)
    return loc, conf, state.batch_stats


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               priors: jnp.ndarray,
               loss_config: LossConfig = LossConfig(),
               seed: int = 0, remat: bool = False,
               ema_decay: float = 0.0, quant_ste=None
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step; returns (new_state, metrics).

    ``seed`` roots the dropout stream (folded with the step counter), so
    different `TrainConfig.seed` values draw different dropout masks.

    ``remat``: gradient-checkpoint the forward at VGG stage boundaries
    (models/backbones.py VGG_STAGE_CKPT markers): only pool outputs + SSD
    taps are saved for backward, stage interiors are recomputed — trades
    ~1/3 extra forward FLOPs for the activation HBM that XLA otherwise
    spills/remats ad hoc under bs>=256 pressure."""
    rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

    def loss_fn(params):
        fwd = lambda p: _forward(state, p, batch, priors, rng,  # noqa: E731
                                 train=True, quant_ste=quant_ste)
        if remat:
            from objectdetection_ssd_tpu.models.backbones import \
                VGG_STAGE_CKPT
            # Save ONLY the stage boundaries; interiors recompute in
            # backward.  NOTE the inverse policy
            # (save_anything_except_these_names on the conv1/conv2
            # interiors) is NOT a lighter-weight option: jax.checkpoint
            # saves every policy-saveable intermediate as a residual, so
            # "anything except" materializes far more than XLA's natural
            # backward and OOMs the bs=256 compile (RESULTS.md r3).
            fwd = jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.save_only_these_names(
                    VGG_STAGE_CKPT))
        loc, conf, new_stats = fwd(params)
        # Loss math in f32 regardless of the model's compute dtype.
        loss = multibox_loss(loc.astype(jnp.float32),
                             conf.astype(jnp.float32),
                             batch["boxes"], batch["classes"],
                             batch["mask"], priors, loss_config)
        return loss.total, (loss, new_stats)

    grads, (loss, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    new_state = _apply_update(state, grads, ema_decay,
                              batch_stats=new_stats)
    metrics = {"loss": loss.total, "cls_loss": loss.cls,
               "loc_loss": loss.loc,
               "num_pos": loss.num_pos.astype(jnp.float32)}
    return new_state, metrics


def _apply_update(state: TrainState, grads, ema_decay: float,
                  batch_stats=None) -> TrainState:
    """Optimizer update + gated EMA — shared by the monolithic `train_step`
    and the pipeline-parallel update program (`make_pp_steps`), so the two
    training surfaces can never drift."""
    new_state = state.apply_gradients(grads, batch_stats=batch_stats)
    if ema_decay and state.ema_params is not None:
        # Standard EMA: e <- d*e + (1-d)*p, fused into the same program
        # (one extra multiply-add per param — negligible next to the
        # backward sweep).  Under gradient accumulation (optax.MultiSteps)
        # params only move when the accumulation window closes; gate the
        # EMA on that boundary so the configured decay means "per optimizer
        # update", not "per micro-batch" (ungated, --grad-accum k would
        # silently compound the decay to d^k per real update).
        mini = getattr(new_state.opt_state, "mini_step", None)
        updated = (mini == 0) if mini is not None else True
        new_state = new_state.replace(ema_params=jax.tree_util.tree_map(
            lambda e, p: jnp.where(
                updated, e * ema_decay + p * (1.0 - ema_decay), e),
            state.ema_params, new_state.params))
    return new_state


def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray],
              priors: jnp.ndarray,
              loss_config: LossConfig = LossConfig(),
              quant_ste=None) -> Dict[str, jnp.ndarray]:
    """Loss-only eval step (the reference's 'test' phase,
    `train_function.py:47-52`)."""
    loc, conf, _ = _forward(state, state.params, batch, priors,
                            rng=None, train=False, quant_ste=quant_ste)
    loss = multibox_loss(loc.astype(jnp.float32), conf.astype(jnp.float32),
                         batch["boxes"], batch["classes"],
                         batch["mask"], priors, loss_config)
    return {"loss": loss.total, "cls_loss": loss.cls, "loc_loss": loss.loc,
            "num_pos": loss.num_pos.astype(jnp.float32)}


def make_pp_steps(runner, split_fn, merge_fn, priors: jnp.ndarray,
                  loss_config: LossConfig, ema_decay: float = 0.0,
                  donate: bool = True):
    """Train/eval steps driven by a GPipe `PipelineRunner` — the `--pp`
    training surface.

    Same ``(state, batch) -> (state, metrics)`` contract as
    `make_jitted_steps`, so the Trainer's epoch loop, checkpointing, EMA,
    StepLR and grad-accum (optax.MultiSteps inside the chain) all apply
    unchanged.  Per step: split the monolithic params into per-stage trees
    (``split_fn`` — a pure dict partition; stage!=0 trees transfer to their
    stage device), stream microbatches through the runner's staged
    forward+rematerialized backward, ``merge_fn`` the per-stage grads back
    into the monolithic tree on the state's device, and apply them through
    the SAME jitted update program the monolith uses (`_apply_update`).

    With ``microbatches=1`` the step is numerically the monolithic
    `train_step` (pinned in tests/test_pp_trainer.py); with M>1 the metrics
    and update follow `--grad-accum` mean-over-microbatches semantics.
    Dropout-free models only (the SSD300 family qualifies — `models/ssd.py`
    `del train`); a dropout model would need per-stage rng plumbing.
    """
    dev0 = runner.devices[0]
    # Aux targets live wherever the LAST stage's outputs do (a device at
    # dp=1, a batch-sharded NamedSharding under --pp-dp).
    last = runner.aux_placement

    def pp_loss(out, aux):
        loc, conf = out
        # Loss math in f32 regardless of the model's compute dtype
        # (mirrors `train_step`).
        loss = multibox_loss(loc.astype(jnp.float32),
                             conf.astype(jnp.float32),
                             aux["boxes"], aux["classes"], aux["mask"],
                             priors, loss_config)
        return loss.total, loss

    update = jax.jit(functools.partial(_apply_update, ema_decay=ema_decay),
                     donate_argnums=(0,) if donate else ())
    eval_loss = jax.jit(lambda out, aux: pp_loss(out, aux)[1])

    def _metrics(parts) -> Dict[str, jnp.ndarray]:
        inv = 1.0 / len(parts)
        tot = sum(p.total for p in parts) * inv
        cls = sum(p.cls for p in parts) * inv
        loc = sum(p.loc for p in parts) * inv
        num_pos = sum(p.num_pos for p in parts)
        return {"loss": tot, "cls_loss": cls, "loc_loss": loc,
                "num_pos": num_pos.astype(jnp.float32)}

    def pp_train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                      ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        aux = {k: batch[k] for k in ("boxes", "classes", "mask")}
        _, grads, parts = runner.loss_and_grads(
            batch["images"], pp_loss, aux=aux,
            params=split_fn(state.params), has_aux=True)
        # Per-stage grads -> monolithic tree on the state's device (the
        # cross-stage leaves transfer; stage-0 leaves are already home).
        mono = jax.device_put(merge_fn(grads), dev0)
        new_state = update(state, mono)
        return new_state, _metrics(parts)

    def pp_eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                     ) -> Dict[str, jnp.ndarray]:
        aux = {k: jax.device_put(batch[k], last)
               for k in ("boxes", "classes", "mask")}
        out = runner.forward(batch["images"], params=split_fn(state.params))
        loss = eval_loss(out, aux)
        return {"loss": loss.total, "cls_loss": loss.cls,
                "loc_loss": loss.loc,
                "num_pos": loss.num_pos.astype(jnp.float32)}

    return pp_train_step, pp_eval_step


def train_compiler_options(scoped_vmem_limit_kib: Optional[int]
                           ) -> Optional[dict]:
    """PJRT compiler_options for the TRAIN step, or None.

    64 MiB is a measured train win (+1.5% at bs=128, +2.9% at bs=256)
    that HURTS the inference graph (-4.2%; inference has its own 24 MiB
    default, `PostprocessConfig.scoped_vmem_limit_kib`) — see
    `TrainConfig.scoped_vmem_limit_kib` and RESULTS.md "scoped-VMEM
    compiler option".  Returns None on CPU backends.
    """
    from objectdetection_ssd_tpu.xla_options import scoped_vmem_options
    return scoped_vmem_options(scoped_vmem_limit_kib)


def make_jitted_steps(priors: jnp.ndarray, loss_config: LossConfig,
                      mesh: Optional[Mesh] = None, donate: bool = True,
                      seed: int = 0, state_sharding=None,
                      remat: bool = False,
                      scoped_vmem_limit_kib: Optional[int] = None,
                      ema_decay: float = 0.0, quant_ste=None):
    """Compile train/eval steps, optionally with explicit mesh shardings.

    With a mesh: batch arrays are sharded over the ``data`` axis, state is
    replicated, and the compiled programs pin those shardings so XLA emits
    the gradient all-reduce over ICI.

    ``state_sharding``: override for the TrainState layout — pass the pytree
    from `parallel.mesh.state_fsdp_shardings(state, mesh)` to run FSDP
    (params/momentum sharded over an ``fsdp`` mesh axis; XLA inserts the
    param all-gathers and gradient reduce-scatters).  Default: replicated.

    ``scoped_vmem_limit_kib``: see `train_compiler_options` (train step
    only; no-op on CPU).
    """
    # quant_ste scales are small scalars: closure-baking them as program
    # constants is fine (unlike params — CLAUDE.md "Hard-won rules").
    t_step = functools.partial(train_step, priors=priors,
                               loss_config=loss_config, seed=seed,
                               remat=remat, ema_decay=ema_decay,
                               quant_ste=quant_ste)
    e_step = functools.partial(eval_step, priors=priors,
                               loss_config=loss_config,
                               quant_ste=quant_ste)
    copts = train_compiler_options(scoped_vmem_limit_kib)
    if mesh is None:
        return (jax.jit(t_step, donate_argnums=(0,) if donate else (),
                        compiler_options=copts),
                jax.jit(e_step))

    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    repl = NamedSharding(mesh, P())
    # Batch rows spread over BOTH data and fsdp axes (ZeRO-3: params
    # gathered over fsdp, every device computes distinct examples).
    data = mesh_lib.batch_sharding(mesh)
    if mesh_lib.spatial_ways(mesh) > 1:
        # Spatial partitioning: the image leaf's H dim additionally shards
        # over the ``spatial`` axis (parallel/mesh.py:image_sharding) and
        # GSPMD partitions the convs with automatic halo exchange; label
        # leaves stay batch-sharded.  The batch contract's keys are fixed
        # (data/pipeline.py:collate), so the per-leaf in_shardings dict is
        # spelled out here.
        img = mesh_lib.image_sharding(mesh)
        data = {"images": img, "boxes": data, "classes": data, "mask": data}
    state_shard = state_sharding if state_sharding is not None else repl
    metrics_repl = repl
    jit_train = jax.jit(
        t_step,
        in_shardings=(state_shard, data),
        out_shardings=(state_shard, metrics_repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=copts,
    )
    jit_eval = jax.jit(e_step, in_shardings=(state_shard, data),
                       out_shardings=repl)
    return jit_train, jit_eval
