"""Train state + optimizer: SGD with momentum, weight decay, 2x bias lr,
step decay — the optax re-expression of the reference's setup.

Reference semantics (`train.py:44-57`):
  * params split into bias / non-bias by name; biases get 2x lr;
  * SGD(lr=1e-4, momentum=0.9, weight_decay=5e-4) — torch applies weight
    decay to the gradient BEFORE the momentum buffer, reproduced by the
    add_decayed_weights -> trace ordering below;
  * StepLR(step_size=7 epochs, gamma=0.1) — constructed but never stepped in
    the reference (`train_function.py` has no scheduler.step()), so its
    effective lr is constant.  We implement the schedule for real and expose
    `use_lr_schedule=False` for training parity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct

from objectdetection_ssd_tpu.config import OptimConfig


class TrainState(struct.PyTreeNode):
    """Minimal train state: params, optimizer state, mutable BN stats."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    batch_stats: Any = None
    # Exponential moving average of params (None = EMA off).  Updated by
    # the train step when `TrainConfig.ema_decay` > 0; eval/export can
    # read the averaged weights via `--use-ema` — the standard
    # production-detection trick the reference lacks (it evaluates the
    # last raw checkpoint).  Rides the state pytree, so checkpointing,
    # replication, and FSDP sharding all apply to it unchanged.
    ema_params: Any = None

    def apply_gradients(self, grads: Any, **kw) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, **kw)


def is_bias_path(path) -> bool:
    """True if a param tree path refers to a bias.

    Mirrors the reference's `param_name.endswith('.bias')` test
    (`train.py:46-51`): plain conv biases and BN biases qualify; kernels, BN
    scales, and the conv4_3 L2-norm rescale do not.
    """
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", str(last)))
    return key == "bias"


def _scale_bias_lr(multiplier: float) -> optax.GradientTransformation:
    """Multiply bias-leaf updates by ``multiplier`` (2x lr for biases)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map_with_path(
            lambda p, u: u * multiplier if is_bias_path(p) else u, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def step_decay_schedule(base_lr: float, gamma: float,
                        steps_per_epoch: int, decay_epochs: int
                        ) -> optax.Schedule:
    """StepLR(step_size=decay_epochs, gamma) on an epoch clock."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // decay_epochs)

    return schedule


def _zero_frozen(frozen_prefixes) -> optax.GradientTransformation:
    """Zero updates for params under any of the given subtrees.

    Prefixes are slash-joined path prefixes: ``"trunk"`` freezes the whole
    trunk (the ResNet variant, reference `Model.py:81-86`), while
    ``"trunk/conv1_1"`` freezes a single VGG layer (stage-level freezing,
    `models/backbones.py:vgg_frozen_prefixes`).  Matches torch-SGD semantics
    for frozen params: they never receive a gradient, and in particular must
    not be weight-decayed.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def mask(path, u):
            keys = [getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path]
            joined = "/".join(keys)
            frozen = any(joined == pre or joined.startswith(pre + "/")
                         for pre in frozen_prefixes)
            return jnp.zeros_like(u) if frozen else u

        return jax.tree_util.tree_map_with_path(mask, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(config: OptimConfig, steps_per_epoch: int = 1,
                   frozen_prefixes: Tuple[str, ...] = ()
                   ) -> optax.GradientTransformation:
    """The full SGD chain: wd -> momentum -> bias-lr scaling -> lr schedule."""
    if config.use_lr_schedule:
        base = step_decay_schedule(config.lr, config.lr_decay_gamma,
                                   steps_per_epoch, config.lr_decay_epochs)
    else:
        base = lambda count: config.lr  # noqa: E731 — reference parity
    if config.warmup_steps > 0:
        warm = config.warmup_steps

        def sched(count):
            ramp = jnp.minimum(
                (count + 1) / warm, 1.0) if hasattr(count, "dtype") else min(
                    (count + 1) / warm, 1.0)
            return base(count) * ramp
    else:
        sched = base
    parts = [
        optax.add_decayed_weights(config.weight_decay),
        optax.trace(decay=config.momentum, nesterov=False),
        _scale_bias_lr(config.bias_lr_multiplier),
        optax.scale_by_schedule(lambda count: -sched(count)),
    ]
    if frozen_prefixes:
        parts.append(_zero_frozen(tuple(frozen_prefixes)))
    tx = optax.chain(*parts)
    if config.grad_accum_steps > 1:
        # Mean gradient over N micro-batches, one real update per N steps
        # (optax.MultiSteps emits zero updates in between).  The schedule
        # count above advances once per REAL update, so StepLR epochs keep
        # their meaning if steps_per_epoch counts optimizer updates.
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
    return tx


def create_train_state(model, rng: jax.Array, sample_input: jnp.ndarray,
                       optim_config: OptimConfig,
                       steps_per_epoch: int = 1,
                       frozen_prefixes: Optional[Tuple[str, ...]] = None,
                       ema: bool = False) -> TrainState:
    """Initialize variables and build the optimizer.

    ``frozen_prefixes`` defaults to ("trunk",) when the model declares
    ``freeze_backbone`` (the ResNet-34 variant, reference `Model.py:81-86`),
    or to the per-stage VGG prefixes when the model declares
    ``freeze_stages`` > 0.

    ``ema``: seed `TrainState.ema_params` with a copy of the initial
    params (the train step maintains the average when
    `TrainConfig.ema_decay` > 0).
    """
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if frozen_prefixes is None:
        if getattr(model, "freeze_backbone", False):
            frozen_prefixes = ("trunk",)
        elif getattr(model, "freeze_stages", 0):
            from objectdetection_ssd_tpu.models.backbones import \
                vgg_frozen_prefixes
            frozen_prefixes = vgg_frozen_prefixes(model.freeze_stages)
        else:
            frozen_prefixes = ()
    tx = make_optimizer(optim_config, steps_per_epoch, frozen_prefixes)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        tx=tx,
        apply_fn=model.apply,
        ema_params=jax.tree_util.tree_map(jnp.array, params) if ema
        else None,
    )
