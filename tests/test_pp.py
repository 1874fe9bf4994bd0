"""Pipeline parallelism (`parallel/pipeline.py`).

The executor's contract is pinned on a tiny heterogeneous 2-stage model
(fast), the SSD300 stage split on the real flagship (one CPU compile):

* pipelined forward == monolithic forward;
* microbatches=1 gradients == `jax.grad` of the monolith;
* microbatches=M gradients == mean of per-microbatch grads (`--grad-accum`
  / optax.MultiSteps semantics, the framework's existing accumulation
  contract);
* stage params committed to distinct devices;
* SSD300 param split is a lossless partition and the staged chain matches
  `SSD300.apply`.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.parallel.pipeline import (
    SSD300_STAGE_CUTS, PipelineRunner, build_pipeline_for,
    build_ssd300_pipeline, merge_ssd300_stage_trees, split_ssd300_params,
    split_ssd300_params_n)


class _Stage0(nn.Module):
    """Downsamples + widens: carry shape CHANGES at the boundary (the
    heterogeneity that rules out a shard_map rotation)."""

    @nn.compact
    def __call__(self, x):                       # (B, 8, 4) -> (B, 4, 6)
        x = nn.Dense(6)(x)
        x = nn.relu(x)
        return x[:, ::2, :]


class _Stage1(nn.Module):
    @nn.compact
    def __call__(self, h):                       # (B, 4, 6) -> (B, 3)
        return nn.Dense(3)(h.reshape(h.shape[0], -1))


class _Mono(nn.Module):
    """The same two stages as one module, shared submodule names."""

    @nn.compact
    def __call__(self, x):
        x = _Stage0(name="s0")(x)
        return _Stage1(name="s1")(x)


def _tiny():
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8, 4), jnp.float32)
    mono = _Mono()
    variables = mono.init(jax.random.PRNGKey(1), x)
    p = variables["params"]
    # The monolith names its stages s0/s1 so the param subtrees map
    # verbatim -- but apply() expects the subtree rooted AT the stage, so
    # re-root each subtree under a bare "params" key:
    stage_params = [{"params": p["s0"]}, {"params": p["s1"]}]
    fns = [_Stage0().apply, _Stage1().apply]
    return mono, variables, fns, stage_params, x


def test_forward_matches_monolith():
    mono, variables, fns, stage_params, x = _tiny()
    want = mono.apply(variables, x)
    for m in (1, 2, 4):
        runner = PipelineRunner(fns, stage_params, microbatches=m)
        got = runner.forward(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_single_microbatch_grads_match_monolith():
    mono, variables, fns, stage_params, x = _tiny()
    tgt = jnp.ones((8, 3), jnp.float32)

    def mono_loss(params):
        out = mono.apply(params, x)
        return jnp.mean((out - tgt) ** 2)

    want_loss, want_g = jax.value_and_grad(mono_loss)(variables)

    runner = PipelineRunner(fns, stage_params, microbatches=1)
    loss, grads = runner.loss_and_grads(
        x, lambda out: jnp.mean((out - tgt) ** 2))
    np.testing.assert_allclose(loss, float(want_loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[0]["params"]["Dense_0"]["kernel"]),
        np.asarray(want_g["params"]["s0"]["Dense_0"]["kernel"]),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[1]["params"]["Dense_0"]["kernel"]),
        np.asarray(want_g["params"]["s1"]["Dense_0"]["kernel"]),
        rtol=1e-5, atol=1e-6)


def test_microbatched_grads_are_grad_accum_mean():
    mono, variables, fns, stage_params, x = _tiny()
    tgt = jnp.ones((8, 3), jnp.float32)
    loss_fn = lambda out: jnp.mean((out - tgt[:out.shape[0]]) ** 2)

    runner = PipelineRunner(fns, stage_params, microbatches=4)
    loss, grads = runner.loss_and_grads(x, loss_fn)

    # Hand-accumulate: mean of per-microbatch monolithic grads.
    accum, losses = None, []
    for i in range(4):
        xm, tm = x[i * 2:(i + 1) * 2], tgt[i * 2:(i + 1) * 2]

        def mono_loss(params):
            return jnp.mean((mono.apply(params, xm) - tm) ** 2)

        lm, gm = jax.value_and_grad(mono_loss)(variables)
        losses.append(float(lm))
        accum = gm if accum is None else jax.tree_util.tree_map(
            jnp.add, accum, gm)
    want = jax.tree_util.tree_map(lambda a: a / 4.0, accum)

    np.testing.assert_allclose(loss, np.mean(losses), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[0]["params"]["Dense_0"]["kernel"]),
        np.asarray(want["params"]["s0"]["Dense_0"]["kernel"]),
        rtol=1e-5, atol=1e-6)


def test_aux_targets_split_with_the_batch():
    """Per-microbatch targets must align row-for-row with the inputs —
    the aux= path; closing over full-batch targets would misalign."""
    mono, variables, fns, stage_params, x = _tiny()
    tgt = jnp.asarray(np.random.RandomState(1).randn(8, 3), jnp.float32)

    def mono_loss(params):
        return jnp.mean((mono.apply(params, x) - tgt) ** 2)

    want_loss = float(mono_loss(variables))

    runner = PipelineRunner(fns, stage_params, microbatches=4)
    loss, _ = runner.loss_and_grads(
        x, lambda out, t: jnp.mean((out - t) ** 2), aux=tgt)
    # Per-microbatch mean-of-means == full-batch mean here (equal rows).
    np.testing.assert_allclose(loss, want_loss, rtol=1e-6)


def test_stage_params_on_distinct_devices():
    _, _, fns, stage_params, x = _tiny()
    devs = jax.devices()
    runner = PipelineRunner(fns, stage_params, devices=devs[:2])
    for s, want_dev in enumerate(devs[:2]):
        for leaf in jax.tree_util.tree_leaves(runner.params[s]):
            assert leaf.devices() == {want_dev}
    out = runner.forward(x)
    assert set(out.devices()) == {devs[1]}


def test_runner_validations():
    _, _, fns, stage_params, x = _tiny()
    with pytest.raises(ValueError, match="microbatches"):
        PipelineRunner(fns, stage_params, microbatches=0)
    with pytest.raises(ValueError, match="devices"):
        PipelineRunner(fns, stage_params, devices=jax.devices()[:1])
    runner = PipelineRunner(fns, stage_params, microbatches=3)
    with pytest.raises(ValueError, match="divisible"):
        runner.forward(x)  # 8 rows, 3 microbatches


def test_dp_forward_and_grads_match_monolith():
    """--pp-dp composition: 2 stages x 2 data ways (4 devices).  Forward
    and gradients equal the monolith on the same global batch — the
    per-stage batch shard + replicated-params vjp's all-reduce must be
    numerically invisible."""
    mono, variables, fns, stage_params, x = _tiny()
    tgt = jnp.ones((8, 3), jnp.float32)

    def mono_loss(params):
        return jnp.mean((mono.apply(params, x) - tgt) ** 2)

    want_loss, want_g = jax.value_and_grad(mono_loss)(variables)
    runner = PipelineRunner(fns, stage_params, devices=jax.devices()[:4],
                            microbatches=1, dp=2)
    # params replicate over each stage's 2-device mesh
    for s in range(2):
        for leaf in jax.tree_util.tree_leaves(runner.params[s]):
            assert len(leaf.devices()) == 2
    got = runner.forward(x)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(mono.apply(variables, x)),
                               rtol=1e-6, atol=1e-6)
    loss, grads = runner.loss_and_grads(
        x, lambda out: jnp.mean((out - tgt) ** 2))
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)
    for s, stage in enumerate(("s0", "s1")):
        np.testing.assert_allclose(
            np.asarray(grads[s]["params"]["Dense_0"]["kernel"]),
            np.asarray(want_g["params"][stage]["Dense_0"]["kernel"]),
            rtol=1e-5, atol=1e-6)


def test_dp_composes_with_microbatches_and_aux():
    """dp=2 x microbatches=2 with per-example aux targets equals the plain
    dp=1 pipeline (which itself equals --grad-accum mean semantics)."""
    _, _, fns, stage_params, x = _tiny()
    tgt = jnp.asarray(np.random.RandomState(3).randn(8, 3), jnp.float32)
    loss_fn = lambda out, aux: jnp.mean((out - aux) ** 2)

    plain = PipelineRunner(fns, stage_params, devices=jax.devices()[:2],
                           microbatches=2)
    want_loss, want_g = plain.loss_and_grads(x, loss_fn, aux=tgt)
    comp = PipelineRunner(fns, stage_params, devices=jax.devices()[:4],
                          microbatches=2, dp=2)
    loss, grads = comp.loss_and_grads(x, loss_fn, aux=tgt)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        grads, want_g)


def test_dp_validations():
    _, _, fns, stage_params, x = _tiny()
    with pytest.raises(ValueError, match="devices"):
        PipelineRunner(fns, stage_params, devices=jax.devices()[:3], dp=2)
    runner = PipelineRunner(fns, stage_params, devices=jax.devices()[:4],
                            microbatches=2, dp=2)
    with pytest.raises(ValueError, match="dp"):
        runner.forward(x[:6])       # 3 rows/microbatch, not divisible by 2


def test_loss_stays_on_device():
    """The mean loss comes back as a device scalar on the LAST stage's
    device (no per-microbatch host sync — round-3 advisor finding)."""
    _, _, fns, stage_params, x = _tiny()
    runner = PipelineRunner(fns, stage_params, devices=jax.devices()[:2],
                            microbatches=2)
    loss, _ = runner.loss_and_grads(x, lambda out: jnp.mean(out ** 2))
    assert isinstance(loss, jax.Array)
    assert loss.devices() == {jax.devices()[1]}


def test_per_call_params_override():
    """`params=` supplies fresh per-stage trees (the trainer passes the
    CURRENT weights each step); zeroed params must zero the output."""
    _, _, fns, stage_params, x = _tiny()
    runner = PipelineRunner(fns, stage_params, microbatches=2)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, stage_params)
    np.testing.assert_array_equal(
        np.asarray(runner.forward(x, params=zeros)), 0.0)
    # and the default params still give the original answer afterwards
    want = runner.forward(x)
    assert np.abs(np.asarray(want)).sum() > 0


def test_loss_grad_cache_is_bounded():
    _, _, fns, stage_params, x = _tiny()
    runner = PipelineRunner(fns, stage_params, microbatches=1)
    for i in range(runner._loss_grad_cache_max + 4):
        runner.loss_and_grads(x, lambda out, i=i: jnp.mean(out ** 2) + 0 * i)
    assert len(runner._loss_grad_cache) <= runner._loss_grad_cache_max


def _fake_ssd300_params():
    """Structure-only SSD300 param tree (tiny leaves, real key layout)."""
    from objectdetection_ssd_tpu.models.backbones import VGG_STAGE_PARAMS
    trunk = {n: {"kernel": jnp.zeros((1,)) + i}
             for i, grp in enumerate(VGG_STAGE_PARAMS) for n in grp}
    p = {"trunk": trunk, "l2norm_4_3": {"scale": jnp.ones((4,))}}
    for name in ("seq8_1", "seq8_2", "loc_head_0", "conf_head_0"):
        p[name] = {"kernel": jnp.zeros((2,)), "bias": jnp.zeros((2,))}
    return p


@pytest.mark.parametrize("n", sorted(SSD300_STAGE_CUTS))
def test_nstage_split_is_lossless_partition(n):
    """split_ssd300_params_n covers every param exactly once and
    merge_ssd300_stage_trees is its exact inverse (any grads produced
    per-stage reassemble into the monolithic optimizer tree)."""
    p = _fake_ssd300_params()
    stages = split_ssd300_params_n(p, n)
    assert len(stages) == n
    # disjoint trunk coverage
    seen = set()
    for s in stages[:-1]:
        names = set(s["params"]["trunk"])
        assert not (names & seen)
        seen |= names
    assert seen == set(p["trunk"])
    assert set(stages[-1]["params"]) == set(p) - {"trunk"}
    merged = merge_ssd300_stage_trees(stages)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(p)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nstage_split_rejects_unknown_count():
    with pytest.raises(ValueError, match="unsupported"):
        split_ssd300_params_n(_fake_ssd300_params(), 5)


@pytest.mark.slow
@pytest.mark.parametrize("n", (3, 4))
def test_ssd300_nstage_chain_matches_monolith(n):
    """Deeper trunk cuts (--pp 3 / --pp 4): the slice chain is numerically
    the monolithic SSD300 forward (shared `apply_vgg_stages` body)."""
    from objectdetection_ssd_tpu.models.ssd import SSD300

    model = SSD300()
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 300, 300, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    want_loc, want_conf = jax.jit(model.apply)(variables, x)

    runner, split_fn, merge_fn = build_pipeline_for(
        model, variables["params"], n, devices=jax.devices()[:n],
        microbatches=2)
    loc, conf = runner.forward(x)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(want_loc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_conf),
                               rtol=1e-5, atol=1e-5)
    merged = merge_fn(split_fn(variables["params"]))
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(variables["params"])


@pytest.mark.slow
def test_ssd300_stage_split_matches_monolith():
    from objectdetection_ssd_tpu.models.ssd import SSD300

    model = SSD300()
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 300, 300, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    want_loc, want_conf = jax.jit(model.apply)(variables, x)

    # The split is a lossless partition of the monolithic tree.
    p0, p1 = split_ssd300_params(variables)
    names = set(p0["params"]) | set(p1["params"])
    assert names == set(variables["params"].keys())
    assert not (set(p0["params"]) & set(p1["params"]))

    runner = build_ssd300_pipeline(model, variables,
                                   devices=jax.devices()[:2],
                                   microbatches=2)
    loc, conf = runner.forward(x)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(want_loc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(want_conf),
                               rtol=1e-5, atol=1e-5)
