"""Pipeline parallelism (GPipe) — the fifth parallelism strategy.

The other four strategies (data, fsdp, tensor, spatial — `parallel/mesh.py`)
are GSPMD annotations on ONE jitted program.  Pipeline parallelism is
different in kind: consecutive model STAGES live on different devices and
microbatches stream through them, so it cannot be expressed as a sharding
of a single SPMD program with uniform per-device code.  Two idiomatic JAX
formulations exist:

* a `shard_map` rotation (`ppermute` the carry each tick) — requires
  homogeneous stages, i.e. identical carry shapes at every boundary.  A CNN
  pyramid is maximally HETEROGENEOUS (every pool halves H,W and changes C),
  so that formulation would pad every carry to the largest activation and
  ship dead bytes over ICI each tick;
* the single-controller staged-jit form used here: each stage is its own
  XLA program whose inputs are committed to its device, activations flow
  device-to-device with explicit transfers, and JAX's async dispatch
  overlaps stage s on microbatch m with stage s+1 on microbatch m-1 — the
  GPipe fill/drain schedule emerges from the data dependencies alone.

Backward is the REMATERIALIZED pipeline: each stage's backward program
recomputes its forward inside `jax.vjp` from the stashed stage INPUT (one
activation per stage boundary per in-flight microbatch — the classic GPipe
stash), so peak memory per device is the stage's own working set, not the
whole model's.  Per-microbatch gradients are MEANed, which is exactly this
framework's `--grad-accum` (optax.MultiSteps) semantics; with a single
microbatch the gradients equal the monolithic `jax.grad` bit-for-bit
(pinned in tests/test_pp.py).

When to use it: the reference is single-device (SURVEY.md §2 "Parallelism
strategies: NONE") and SSD300 itself (~100 MB params) never NEEDS pipeline
parallelism — data/fsdp/tensor/spatial are the production strategies for
this family, and stay the defaults.  The strategy exists so the framework's
parallelism layer is complete for model families whose per-stage weights
exceed one chip's HBM, and as the serving-latency lever when one image must
traverse a model too large for a single chip.

SSD300's natural two-stage cut is the trunk boundary: stage 0 = input
normalization + VGG-16 trunk (the FLOP-heavy half), stage 1 = L2Norm +
extra pyramid + detection heads.  Both stage modules reuse the monolith's
own code (`models/ssd.py:ssd300_post_trunk`, `VGG16Trunk`) under the SAME
param names, so a trained monolithic checkpoint splits losslessly —
`split_ssd300_params` is a pure dict partition, verified round-trip in
tests.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.models.ssd import (SSD300, ssd300_post_trunk,
                                                prepare_input)
from objectdetection_ssd_tpu.models.backbones import VGG16Trunk

Dtype = Any
StageFn = Callable[[Any, Any], Any]  # (stage_params, carry) -> carry


class SSD300TrunkStage(nn.Module):
    """Pipeline stage 0: input adapter + VGG trunk (`models/ssd.py`).

    Param tree: {"trunk": ...} — identical names to the monolith's trunk
    subtree, so monolithic checkpoints load directly.
    """

    dtype: Dtype = jnp.float32
    freeze_stages: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = prepare_input(x, self.dtype)
        return VGG16Trunk(dtype=self.dtype, freeze_stages=self.freeze_stages,
                          name="trunk")(x)


class SSD300HeadStage(nn.Module):
    """Pipeline stage 1: L2Norm + extra pyramid + heads.

    Shares the monolith's graph function (`ssd300_post_trunk`) so the split
    can never drift from `SSD300.__call__`; param names are the monolith's
    non-trunk siblings.
    """

    num_classes: int
    l2_norm_scale_init: float = 20.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conv4_3, x = carry
        return ssd300_post_trunk(
            conv4_3, x, num_classes=self.num_classes,
            l2_norm_scale_init=self.l2_norm_scale_init, dtype=self.dtype)


def split_ssd300_params(variables: Any) -> Tuple[Any, Any]:
    """Partition a monolithic SSD300 param tree into (trunk, head) stage
    trees.  Pure dict split — no copies, no renames."""
    p = variables["params"] if "params" in variables else variables
    trunk = {"params": {"trunk": p["trunk"]}}
    head = {"params": {k: v for k, v in p.items() if k != "trunk"}}
    return trunk, head


def build_ssd300_pipeline(model: SSD300, variables: Any,
                          devices: Optional[Sequence[jax.Device]] = None,
                          microbatches: int = 1) -> "PipelineRunner":
    """Two-stage GPipe runner for an SSD300 + its (monolithic) variables."""
    trunk = SSD300TrunkStage(dtype=model.dtype,
                             freeze_stages=model.freeze_stages)
    head = SSD300HeadStage(num_classes=model.num_classes,
                           l2_norm_scale_init=model.l2_norm_scale_init,
                           dtype=model.dtype)
    p0, p1 = split_ssd300_params(variables)
    return PipelineRunner(
        stage_fns=[trunk.apply, head.apply],
        stage_params=[p0, p1],
        devices=devices, microbatches=microbatches)


class PipelineRunner:
    """Single-controller GPipe executor over heterogeneous stages.

    ``stage_fns[s]`` maps ``(stage_params, carry) -> carry``; carries may be
    arbitrary pytrees with DIFFERENT shapes per boundary (the reason this is
    staged-jit, not a shard_map rotation — module docstring).  Stage s's
    params are committed to ``devices[s]``; every stage call therefore
    compiles for and runs on its own device, and async dispatch pipelines
    the microbatches.
    """

    def __init__(self, stage_fns: Sequence[StageFn],
                 stage_params: Sequence[Any],
                 devices: Optional[Sequence[jax.Device]] = None,
                 microbatches: int = 1):
        if len(stage_fns) != len(stage_params):
            raise ValueError("one param tree per stage")
        if microbatches < 1:
            raise ValueError("microbatches must be >= 1")
        devs = list(devices) if devices is not None else jax.devices()
        if len(devs) < len(stage_fns):
            raise ValueError(
                f"{len(stage_fns)} stages need {len(stage_fns)} devices, "
                f"got {len(devs)}")
        self.devices = devs[:len(stage_fns)]
        self.microbatches = microbatches
        self.stage_fns = list(stage_fns)
        self.params = [
            jax.device_put(p, d) for p, d in zip(stage_params, self.devices)]
        self._fwd = [jax.jit(fn) for fn in self.stage_fns]
        # Backward recomputes the stage forward inside vjp (remat pipeline):
        # bwd_s(p, h_in, g_out) -> (dL/dp, dL/dh_in).
        self._bwd = [
            jax.jit(functools.partial(self._stage_vjp, fn))
            for fn in self.stage_fns]
        self._loss_grad_cache: dict = {}

    @staticmethod
    def _stage_vjp(fn: StageFn, p: Any, h: Any, g: Any) -> Tuple[Any, Any]:
        _, vjp = jax.vjp(fn, p, h)
        return vjp(g)

    # -- helpers ----------------------------------------------------------

    def _split(self, batch: Any) -> List[Any]:
        leaves = jax.tree_util.tree_leaves(batch)
        n = leaves[0].shape[0]
        m = self.microbatches
        if n % m:
            raise ValueError(f"batch {n} not divisible by {m} microbatches")
        k = n // m
        return [jax.tree_util.tree_map(lambda a: a[i * k:(i + 1) * k], batch)
                for i in range(m)]

    def _put(self, tree: Any, device: jax.Device) -> Any:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, device), tree)

    # -- inference --------------------------------------------------------

    def forward(self, batch: Any) -> Any:
        """Pipelined forward; returns the last stage's outputs concatenated
        over microbatches (on the LAST stage's device)."""
        outs = []
        for mb in self._split(batch):
            h = self._put(mb, self.devices[0])
            for s, fwd in enumerate(self._fwd):
                if s:
                    h = self._put(h, self.devices[s])
                h = fwd(self.params[s], h)
            outs.append(h)
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    # -- training ---------------------------------------------------------

    def loss_and_grads(self, batch: Any,
                       loss_fn: Callable[..., jnp.ndarray],
                       aux: Any = None) -> Tuple[jnp.ndarray, List[Any]]:
        """GPipe forward+backward.

        ``loss_fn(last_stage_out)`` (or ``loss_fn(last_stage_out, aux_mb)``
        when ``aux`` is given) -> scalar, jitted on the last device.  ``aux``
        is a pytree of per-example targets whose leading dim matches the
        batch; it is split into the SAME microbatch rows as the inputs and
        committed to the last device — closing over full-batch targets
        inside ``loss_fn`` would silently misalign rows for microbatches>1.
        Returns the mean microbatch loss and per-stage param gradients (each
        on its stage's device) — `--grad-accum` mean semantics over
        microbatches; with ``microbatches=1`` exactly `jax.grad` of the
        monolith (tested).
        """
        # Cache keyed by id(); the cache also HOLDS loss_fn so a dead
        # object's id can never be reused for a different function.
        key = (id(loss_fn), aux is not None)
        if key not in self._loss_grad_cache:
            self._loss_grad_cache[key] = (
                loss_fn, jax.jit(jax.value_and_grad(loss_fn)))
        loss_grad = self._loss_grad_cache[key][1]

        aux_mbs = None
        if aux is not None:
            aux_mbs = [self._put(a, self.devices[-1])
                       for a in self._split(aux)]

        nstage = len(self.stage_fns)
        # Forward fill: stash each stage's INPUT per microbatch (the remat
        # backward recomputes everything else).
        stash: List[List[Any]] = []
        outs: List[Any] = []
        for mb in self._split(batch):
            h = self._put(mb, self.devices[0])
            row = []
            for s, fwd in enumerate(self._fwd):
                if s:
                    h = self._put(h, self.devices[s])
                row.append(h)
                h = fwd(self.params[s], h)
            stash.append(row)
            outs.append(h)

        # Backward drain: newest microbatch first (its activations are the
        # ones still hot), accumulating per-stage grads.
        losses = []
        gsum: List[Any] = [None] * nstage
        for m in reversed(range(len(outs))):
            if aux_mbs is None:
                loss_m, g = loss_grad(outs[m])
            else:
                loss_m, g = loss_grad(outs[m], aux_mbs[m])
            losses.append(loss_m)
            for s in reversed(range(nstage)):
                dp, g = self._bwd[s](self.params[s], stash[m][s], g)
                gsum[s] = dp if gsum[s] is None else jax.tree_util.tree_map(
                    jnp.add, gsum[s], dp)
                if s:
                    g = self._put(g, self.devices[s - 1])

        inv = 1.0 / len(outs)
        loss = sum(jax.device_get(l) for l in losses) * inv
        grads = [jax.tree_util.tree_map(lambda a: a * inv, gs) for gs in gsum]
        return loss, grads
