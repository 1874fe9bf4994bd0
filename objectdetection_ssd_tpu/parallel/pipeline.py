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

This is a full TRAINING surface: `cli train --pp N [--pp-microbatches M]`
drives the runner through the Trainer (`train/loop.py:make_pp_steps`) —
per-stage grads merge back into the monolithic param tree and flow through
the SAME optax chain (StepLR, warmup, --grad-accum, EMA) and orbax
checkpointing as every other strategy; checkpoints stay monolithic and
interchangeable (resume a --pp run data-parallel and vice versa).

When to use it: the reference is single-device (SURVEY.md §2 "Parallelism
strategies: NONE") and SSD300 itself (~100 MB params) never NEEDS pipeline
parallelism — data/fsdp/tensor/spatial are the production strategies for
this family, and stay the defaults.  The strategy exists so the framework's
parallelism layer is complete for model families whose per-stage weights
exceed one chip's HBM, and as the serving-latency lever when one image must
traverse a model too large for a single chip.

SSD300's natural two-stage cut is the trunk boundary: stage 0 = input
normalization + VGG-16 trunk (the FLOP-heavy half), stage 1 = L2Norm +
extra pyramid + detection heads; 3- and 4-stage cuts subdivide the trunk at
pool boundaries (`SSD300_STAGE_CUTS`).  Stage modules reuse the monolith's
own code (`models/ssd.py:ssd300_post_trunk`,
`models/backbones.py:apply_vgg_stages`) under the SAME param names, so a
trained monolithic checkpoint splits losslessly — `split_ssd300_params_n`
is a pure dict partition with `merge_ssd300_stage_trees` its exact inverse,
verified round-trip in tests.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.models.ssd import (SSD300, ssd300_post_trunk,
                                                prepare_input)
from objectdetection_ssd_tpu.models.backbones import (VGG16Trunk,
                                                      VGG_STAGE_PARAMS,
                                                      apply_vgg_stages)

Dtype = Any
StageFn = Callable[[Any, Any], Any]  # (stage_params, carry) -> carry

# Trunk cut points per --pp stage count: each (first, last) is an inclusive
# 1-based VGG stage range (`models/backbones.py:apply_vgg_stages` stage
# map); the head stage (L2Norm + pyramid + heads) is always appended.  The
# cuts sit where the carry is a SINGLE tensor (pool outputs / the conv4_3
# tap), so no dead bytes cross a stage boundary.
SSD300_STAGE_CUTS = {
    2: ((1, 5),),
    3: ((1, 3), (4, 5)),
    4: ((1, 2), (3, 4), (5, 5)),
}


class _VGGSlice(nn.Module):
    """VGG stages [first..last] under the monolith's param names (shared
    implementation: `apply_vgg_stages`)."""

    first: int
    last: int
    dtype: Dtype = jnp.float32
    freeze_stages: int = 0

    @nn.compact
    def __call__(self, carry):
        return apply_vgg_stages(carry, first=self.first, last=self.last,
                                dtype=self.dtype,
                                freeze_stages=self.freeze_stages)


class SSD300TrunkSliceStage(nn.Module):
    """Pipeline stage holding VGG stages [first..last].

    Param tree: {"trunk": {subset}} — the monolith's trunk subtree names,
    so a monolithic checkpoint splits losslessly across any cut.
    """

    first: int
    last: int
    dtype: Dtype = jnp.float32
    freeze_stages: int = 0

    @nn.compact
    def __call__(self, carry):
        if self.first == 1:
            carry = prepare_input(carry, self.dtype)
        return _VGGSlice(first=self.first, last=self.last, dtype=self.dtype,
                         freeze_stages=self.freeze_stages,
                         name="trunk")(carry)


class SSD300TrunkStage(nn.Module):
    """Pipeline stage 0 of the 2-stage split: input adapter + whole VGG
    trunk (`models/ssd.py`).

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


def split_ssd300_params_n(variables: Any, num_stages: int) -> List[Any]:
    """Partition a monolithic SSD300 param tree into ``num_stages`` stage
    trees along `SSD300_STAGE_CUTS` (trunk slices + head stage).  Pure dict
    split — lossless, no copies, no renames; `merge_ssd300_stage_trees` is
    the exact inverse."""
    cuts = SSD300_STAGE_CUTS.get(num_stages)
    if cuts is None:
        raise ValueError(
            f"unsupported SSD300 stage count {num_stages}; "
            f"choose from {sorted(SSD300_STAGE_CUTS)}")
    p = variables["params"] if "params" in variables else variables
    stages = []
    for first, last in cuts:
        names = [n for grp in VGG_STAGE_PARAMS[first - 1:last] for n in grp]
        stages.append({"params": {"trunk": {n: p["trunk"][n]
                                            for n in names}}})
    stages.append({"params": {k: v for k, v in p.items() if k != "trunk"}})
    return stages


def merge_ssd300_stage_trees(stage_trees: Sequence[Any]) -> Any:
    """Inverse of `split_ssd300_params_n`: reassemble stage trees (params or
    their gradients — same structure) into one monolithic param tree shaped
    like ``TrainState.params`` (no "params" wrapper)."""
    trunk: dict = {}
    out: dict = {}
    for t in stage_trees:
        tp = t["params"] if "params" in t else t
        for k, v in tp.items():
            if k == "trunk":
                trunk.update(v)
            else:
                out[k] = v
    if trunk:
        out["trunk"] = trunk
    return out


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


def build_pipeline_for(model, params: Any, num_stages: int,
                       devices: Optional[Sequence[jax.Device]] = None,
                       microbatches: int = 1, dp: int = 1):
    """Model-family dispatch for the `train --pp` path.

    Returns ``(runner, split_fn, merge_fn)`` where ``split_fn(params)``
    yields the per-stage param trees for the CURRENT weights (called every
    step by the trainer) and ``merge_fn(stage_grads)`` reassembles per-stage
    gradients into the monolithic tree the optax chain consumes.

    ``dp``: data-parallel ways per stage (`train --pp N --pp-dp D` —
    needs N x D devices; see `PipelineRunner.__init__`).
    """
    if not isinstance(model, SSD300):
        raise ValueError(
            "--pp supports the SSD300 family; got "
            f"{type(model).__name__} (supply a custom pp_build to Trainer "
            "for other models)")
    cuts = SSD300_STAGE_CUTS.get(num_stages)
    if cuts is None:
        raise ValueError(
            f"--pp {num_stages} unsupported for SSD300; choose from "
            f"{sorted(SSD300_STAGE_CUTS)}")
    stage_fns = [
        SSD300TrunkSliceStage(first=a, last=b, dtype=model.dtype,
                              freeze_stages=model.freeze_stages).apply
        for a, b in cuts
    ] + [SSD300HeadStage(num_classes=model.num_classes,
                         l2_norm_scale_init=model.l2_norm_scale_init,
                         dtype=model.dtype).apply]

    def split_fn(p):
        return split_ssd300_params_n(p, num_stages)

    runner = PipelineRunner(stage_fns, split_fn(params), devices=devices,
                            microbatches=microbatches, dp=dp)
    return runner, split_fn, merge_ssd300_stage_trees


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
                 microbatches: int = 1, dp: int = 1):
        """``dp``: data-parallel ways WITHIN each stage.  With dp > 1 every
        stage owns a ``dp``-device one-axis mesh instead of a single
        device: its params replicate over the stage mesh, microbatch rows
        shard over the mesh's ``data`` axis, and GSPMD compiles each stage
        program SPMD (the per-stage gradient all-reduce over the stage
        mesh's ICI falls out of the replicated-params vjp).  Stage
        boundaries then move sharded activations mesh-to-mesh — a
        resharding `device_put`, the same transfer volume per device as
        the dp=1 pipeline.  Composition semantics: grads are summed over
        the data axis and meaned over microbatches, so the step equals the
        dp=1 pipeline bit-for-bit on the same global batch (pinned in
        tests/test_pp.py)."""
        if len(stage_fns) != len(stage_params):
            raise ValueError("one param tree per stage")
        if microbatches < 1:
            raise ValueError("microbatches must be >= 1")
        if dp < 1:
            raise ValueError("dp must be >= 1")
        devs = list(devices) if devices is not None else jax.devices()
        nstage = len(stage_fns)
        if len(devs) < nstage * dp:
            raise ValueError(
                f"{nstage} stages x {dp} data ways need {nstage * dp} "
                f"devices, got {len(devs)}")
        self.dp = dp
        self.microbatches = microbatches
        self.stage_fns = list(stage_fns)
        if dp == 1:
            self.devices = devs[:nstage]
            self._param_place = list(self.devices)
            self._carry_place = list(self.devices)
        else:
            import numpy as _np
            from jax.sharding import (Mesh as _Mesh,
                                      NamedSharding as _NamedSharding,
                                      PartitionSpec as _P)
            self.meshes = [
                _Mesh(_np.asarray(devs[s * dp:(s + 1) * dp]), ("data",))
                for s in range(nstage)]
            # Lead device per stage: API compatibility (`runner.devices[0]`
            # is where make_pp_steps homes the monolithic grads/update).
            self.devices = [devs[s * dp] for s in range(nstage)]
            self._param_place = [_NamedSharding(m, _P())
                                 for m in self.meshes]
            self._carry_place = [_NamedSharding(m, _P("data"))
                                 for m in self.meshes]
        self.params = [
            jax.device_put(p, d)
            for p, d in zip(stage_params, self._param_place)]
        self._fwd = [jax.jit(fn) for fn in self.stage_fns]
        # Backward recomputes the stage forward inside vjp (remat pipeline):
        # bwd_s(p, h_in, g_out) -> (dL/dp, dL/dh_in).
        self._bwd = [
            jax.jit(functools.partial(self._stage_vjp, fn))
            for fn in self.stage_fns]
        # Compiled loss/grad programs keyed by loss_fn identity.  Pass a
        # STABLE callable (module-level fn or a long-lived closure) — a
        # fresh lambda per call would recompile every step.  The cache is
        # bounded (LRU, keeps the callables alive so a dead id() can never
        # alias a different function) so even the anti-pattern only costs
        # recompiles, not unbounded memory.
        self._loss_grad_cache: "dict" = {}
        self._loss_grad_cache_max = 8

    @staticmethod
    def _stage_vjp(fn: StageFn, p: Any, h: Any, g: Any) -> Tuple[Any, Any]:
        _, vjp = jax.vjp(fn, p, h)
        return vjp(g)

    # -- helpers ----------------------------------------------------------

    @property
    def aux_placement(self):
        """Placement for per-example targets consumed by the loss: the
        LAST stage's carry placement (device at dp=1, batch-sharded
        NamedSharding at dp>1 — aux rows must shard like the stage
        output's)."""
        return self._carry_place[-1]

    def _split(self, batch: Any) -> List[Any]:
        leaves = jax.tree_util.tree_leaves(batch)
        n = leaves[0].shape[0]
        m = self.microbatches
        if n % m:
            raise ValueError(f"batch {n} not divisible by {m} microbatches")
        k = n // m
        if k % self.dp:
            raise ValueError(
                f"microbatch rows {k} (batch {n} / {m} microbatches) not "
                f"divisible by the per-stage data ways dp={self.dp}")
        return [jax.tree_util.tree_map(lambda a: a[i * k:(i + 1) * k], batch)
                for i in range(m)]

    def _put(self, tree: Any, device: jax.Device) -> Any:
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, device), tree)

    def _stage_param_trees(self, params: Optional[Sequence[Any]]
                           ) -> List[Any]:
        """Per-stage param trees committed to their stage devices.

        ``params=None`` uses the trees captured at construction; otherwise
        the given trees are device_put per stage (a no-op for leaves
        already resident — e.g. stage 0 sharing the trainer's device)."""
        if params is None:
            return self.params
        if len(params) != len(self.stage_fns):
            raise ValueError("one param tree per stage")
        return [self._put(p, d) for p, d in zip(params, self._param_place)]

    def _loss_grad(self, loss_fn, with_aux: bool, has_aux: bool):
        key = (id(loss_fn), with_aux, has_aux)
        hit = self._loss_grad_cache.pop(key, None)
        if hit is None:
            hit = (loss_fn,
                   jax.jit(jax.value_and_grad(loss_fn, has_aux=has_aux)))
            while len(self._loss_grad_cache) >= self._loss_grad_cache_max:
                self._loss_grad_cache.pop(
                    next(iter(self._loss_grad_cache)))
        self._loss_grad_cache[key] = hit    # re-insert = LRU touch
        return hit[1]

    # -- inference --------------------------------------------------------

    def forward(self, batch: Any, params: Optional[Sequence[Any]] = None
                ) -> Any:
        """Pipelined forward; returns the last stage's outputs concatenated
        over microbatches (on the LAST stage's device).  ``params``: fresh
        per-stage trees (e.g. the trainer's current weights); default = the
        trees given at construction."""
        stage_params = self._stage_param_trees(params)
        outs = []
        for mb in self._split(batch):
            h = self._put(mb, self._carry_place[0])
            for s, fwd in enumerate(self._fwd):
                if s:
                    h = self._put(h, self._carry_place[s])
                h = fwd(stage_params[s], h)
            outs.append(h)
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    # -- training ---------------------------------------------------------

    def loss_and_grads(self, batch: Any,
                       loss_fn: Callable[..., Any],
                       aux: Any = None,
                       params: Optional[Sequence[Any]] = None,
                       has_aux: bool = False):
        """GPipe forward+backward.

        ``loss_fn(last_stage_out)`` (or ``loss_fn(last_stage_out, aux_mb)``
        when ``aux`` is given) -> scalar, jitted on the last device; pass a
        STABLE callable (see `_loss_grad_cache`).  ``aux`` is a pytree of
        per-example targets whose leading dim matches the batch; it is
        split into the SAME microbatch rows as the inputs and committed to
        the last device — closing over full-batch targets inside ``loss_fn``
        would silently misalign rows for microbatches>1.  ``params``: fresh
        per-stage param trees for this step (default: construction-time
        trees).  ``has_aux``: loss_fn returns ``(scalar, extras)`` — the
        per-microbatch extras come back as a list (newest microbatch first,
        matching the backward drain order).

        Returns ``(loss, grads)`` — or ``(loss, grads, extras)`` with
        ``has_aux`` — where ``loss`` is the mean microbatch loss as a
        DEVICE scalar on the last stage's device (no host sync; pull it
        when you log) and ``grads`` are per-stage param gradients (each on
        its stage's device) — `--grad-accum` mean semantics over
        microbatches; with ``microbatches=1`` exactly `jax.grad` of the
        monolith (tested).
        """
        loss_grad = self._loss_grad(loss_fn, aux is not None, has_aux)
        stage_params = self._stage_param_trees(params)

        aux_mbs = None
        if aux is not None:
            aux_mbs = [self._put(a, self._carry_place[-1])
                       for a in self._split(aux)]

        nstage = len(self.stage_fns)
        # Forward fill: stash each stage's INPUT per microbatch (the remat
        # backward recomputes everything else).
        stash: List[List[Any]] = []
        outs: List[Any] = []
        for mb in self._split(batch):
            h = self._put(mb, self._carry_place[0])
            row = []
            for s, fwd in enumerate(self._fwd):
                if s:
                    h = self._put(h, self._carry_place[s])
                row.append(h)
                h = fwd(stage_params[s], h)
            stash.append(row)
            outs.append(h)

        # Backward drain: newest microbatch first (its activations are the
        # ones still hot), accumulating per-stage grads.
        loss_sum = None
        extras: List[Any] = []
        gsum: List[Any] = [None] * nstage
        for m in reversed(range(len(outs))):
            args = (outs[m],) if aux_mbs is None else (outs[m], aux_mbs[m])
            val, g = loss_grad(*args)
            if has_aux:
                loss_m, extra = val
                extras.append(extra)
            else:
                loss_m = val
            loss_sum = loss_m if loss_sum is None else loss_sum + loss_m
            for s in reversed(range(nstage)):
                dp, g = self._bwd[s](stage_params[s], stash[m][s], g)
                gsum[s] = dp if gsum[s] is None else jax.tree_util.tree_map(
                    jnp.add, gsum[s], dp)
                if s:
                    g = self._put(g, self._carry_place[s - 1])

        inv = 1.0 / len(outs)
        # Mean loss stays ON DEVICE (last stage) — callers decide when to
        # sync; the old per-microbatch jax.device_get blocked the pipeline.
        loss = loss_sum * inv
        grads = [jax.tree_util.tree_map(lambda a: a * inv, gs) for gs in gsum]
        if has_aux:
            return loss, grads, extras
        return loss, grads
