"""Post-training int8 quantization (infer/quant.py, models/layers.py).

The reference has no quantization story — this is a TPU-added serving
capability (v5e int8 MXU peak is 2x bf16).  Tests pin: the int8 conv's
math, the param-tree compatibility of the quant branch (a trained f32
checkpoint drives the quantized model unchanged), calibration folding,
the head-exclusion policy, and end-to-end closeness on the real SSD300.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.config import Config, ModelConfig, PostprocessConfig
from objectdetection_ssd_tpu.infer import quant as quant_lib
from objectdetection_ssd_tpu.infer.detector import Detector
from objectdetection_ssd_tpu.models.layers import Int8Conv, TorchConv
from objectdetection_ssd_tpu.models.ssd import build_model


@pytest.fixture(scope="module")
def ssd_setup():
    cfg = Config(
        model=ModelConfig(backbone="vgg16"),
        postprocess=PostprocessConfig(per_class_top_k=16, top_k=20,
                                      use_approx_top_k=False,
                                      anchor_prefilter=0),
    )
    model = build_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 300, 300, 3)))["params"]
    rng = np.random.default_rng(7)
    images = rng.normal(0, 0.5, (2, 300, 300, 3)).astype(np.float32)
    return cfg, model, params, images


def test_int8_conv_exact_on_representable_inputs():
    """Inputs and weights already on the int8 grid round-trip losslessly:
    the quantized conv must equal the f32 conv EXACTLY."""
    rng = np.random.default_rng(0)
    s_a = 0.25
    x = (rng.integers(-127, 128, (2, 9, 9, 8)) * s_a).astype(np.float32)
    conv = Int8Conv(features=16, kernel=3, stride=2, padding=1)
    v = conv.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.float32(1.0))
    # Snap the kernel to its own per-channel grid so w/s_w is integral.
    w = np.asarray(v["params"]["kernel"], np.float64)
    s_w = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    w = np.round(w / s_w) * s_w
    v = {"params": {"kernel": jnp.asarray(w, jnp.float32),
                    "bias": v["params"]["bias"]}}
    got = conv.apply(v, jnp.asarray(x), jnp.float32(s_a))

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w, jnp.float32), (2, 2),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_int8_conv_clips_to_calibrated_range():
    """Activations beyond the calibrated absmax must saturate at +-127
    steps (symmetric PTQ), not wrap or explode."""
    x = np.full((1, 1, 1, 1), 100.0, np.float32)
    conv = Int8Conv(features=1, kernel=1, use_bias=False)
    v = {"params": {"kernel": jnp.ones((1, 1, 1, 1), jnp.float32)}}
    # act_scale for absmax=10 -> 100 clips to 127 * (10/127) = 10.
    got = conv.apply(v, jnp.asarray(x), jnp.float32(10.0 / 127.0))
    np.testing.assert_allclose(np.asarray(got)[0, 0, 0, 0], 10.0, rtol=1e-6)


def test_torchconv_quant_branch_same_param_tree():
    """The int8 branch must consume the EXACT param tree the f32 branch
    created (Conv_0/{kernel,bias}) — that is what lets a trained f32
    checkpoint drive the quantized model with no conversion step."""
    conv = TorchConv(features=8, kernel=3, padding=1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 6, 6, 4)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), x)
    assert set(v["params"]["Conv_0"]) == {"kernel", "bias"}

    f32 = conv.apply({"params": v["params"]}, x)
    q = {"act_scale": jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)}
    int8 = conv.apply({"params": v["params"], "quant": q}, x)
    assert int8.shape == f32.shape
    # ~1% of the activation std is the expected int8 rounding noise.
    err = np.abs(np.asarray(int8) - np.asarray(f32)).max()
    assert err < 0.05 * float(np.std(np.asarray(f32))) + 1e-4
    # and the branch actually quantized (bit-exactness would mean the f32
    # path ran)
    assert err > 0


class _TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = TorchConv(4, kernel=3, padding=1, name="a")(x)
        x = nn.relu(x)
        return TorchConv(2, kernel=1, name="loc_head")(x)


def test_calibrate_folds_running_max_across_batches():
    m = _TwoConv()
    rng = np.random.default_rng(0)
    b1 = rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32)
    b2 = rng.normal(0, 3, (2, 4, 4, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), b1)["params"]
    stats = quant_lib.calibrate(m, params, [b1, b2])
    expect = max(np.abs(b1).max(), np.abs(b2).max())
    np.testing.assert_allclose(stats["a"]["absmax"], expect, rtol=1e-6)
    # the second conv's stat is ITS input (post-relu of conv a)
    assert stats["loc_head"]["absmax"] > 0


def test_act_scales_policy_and_values():
    stats = {"trunk": {"conv1_1": {"absmax": np.float32(2.54)}},
             "loc_head_0": {"absmax": np.float32(1.0)},
             "conf_t4": {"absmax": np.float32(1.0)}}
    q = quant_lib.act_scales(stats)
    assert quant_lib.count_quantized(q) == 1          # heads excluded
    np.testing.assert_allclose(q["trunk"]["conv1_1"]["act_scale"],
                               2.54 / 127.0, rtol=1e-6)
    q_all = quant_lib.act_scales(stats, quantize_heads=True)
    assert quant_lib.count_quantized(q_all) == 3


def test_ssd300_int8_forward_tracks_f32(ssd_setup):
    """End-to-end: the quantized SSD300's raw outputs must track the f32
    model closely (random init; the rehearsal measures trained-model mAP
    deltas on hardware — benchmarks/RESULTS.md)."""
    cfg, model, params, images = ssd_setup
    stats = quant_lib.calibrate(model, params, [images])
    qtree = quant_lib.act_scales(stats)
    assert quant_lib.count_quantized(qtree) == 23     # all non-head convs
    # (VGG: 13 stage convs + atrous fc6/fc7; extras: 4 x 2 pyramid convs)

    loc_f, conf_f = model.apply({"params": params}, jnp.asarray(images))
    loc_q, conf_q = model.apply({"params": params, "quant": qtree},
                                jnp.asarray(images))
    # int8 noise accumulates through 15 quantized VGG convs; "tracks"
    # means high correlation and small error relative to the signal.
    for f, q in ((loc_f, loc_q), (conf_f, conf_q)):
        f, q = np.asarray(f).ravel(), np.asarray(q).ravel()
        assert np.corrcoef(f, q)[0, 1] > 0.99
        assert np.abs(f - q).mean() < 0.1 * np.std(f)


def test_detector_quant_and_export_roundtrip(tmp_path, ssd_setup):
    """Detector(quant=...) and the int8 serving artifact must agree with
    each other; the artifact records its quantization in meta.json."""
    from objectdetection_ssd_tpu.infer.export import (ExportedDetector,
                                                      export_detector)
    cfg, model, params, images = ssd_setup
    stats = quant_lib.calibrate(model, params, [images])
    qtree = quant_lib.act_scales(stats)

    live = Detector(cfg, params, quant=qtree)
    d_live = live.detect_batch(jnp.asarray(images))
    assert np.asarray(d_live.scores).shape == (2, cfg.postprocess.top_k)

    out = export_detector(cfg, params, str(tmp_path / "artifact"),
                          batch_size=2, input_dtype="float32", quant=qtree)
    served = ExportedDetector(out)
    d_srv = served(images)
    np.testing.assert_array_equal(np.asarray(d_live.valid),
                                  np.asarray(d_srv.valid))
    np.testing.assert_allclose(np.asarray(d_live.scores),
                               np.asarray(d_srv.scores), rtol=1e-5,
                               atol=1e-7)
    assert served.meta["quantized_convs"] == 23
    assert served.meta["tta_flip"] is False


def test_chain_scales_threads_out_scales():
    """chain_scales adds out_scale = consumer.act_scale along the family's
    edges, only where BOTH endpoints are quantized, without touching the
    input tree or the quantized-conv count."""
    q = {"trunk": {"conv1_1": {"act_scale": np.float32(0.5)},
                   "conv1_2": {"act_scale": np.float32(0.25)},
                   # conv2_1 missing (pretend it was excluded)
                   "conv2_2": {"act_scale": np.float32(0.125)}},
         "seq8_1": {"act_scale": np.float32(1.0)},
         "seq8_2": {"act_scale": np.float32(2.0)}}
    c = quant_lib.chain_scales(q, "vgg16")
    # 1_1 -> 1_2 chained; 1_2 -> 2_1 and 2_1 -> 2_2 skipped (missing end).
    np.testing.assert_allclose(c["trunk"]["conv1_1"]["out_scale"], 0.25)
    assert "out_scale" not in c["trunk"]["conv1_2"]
    assert "out_scale" not in c["trunk"]["conv2_2"]
    np.testing.assert_allclose(c["seq8_1"]["out_scale"], 2.0)
    assert "out_scale" not in c["seq8_2"]         # head tap stays f32 out
    # input untouched; count counts act_scale leaves only
    assert "out_scale" not in q["trunk"]["conv1_1"]
    assert quant_lib.count_quantized(c) == quant_lib.count_quantized(q) == 5
    # resnet34 has no exact chain edges (BN between conv and quantize)
    assert quant_lib.chain_scales(q, "resnet34") == q


def test_int8_max_pool_commutes_with_quantization():
    """max_pool on the int8 tensor == quantize(max_pool(f32)) — monotone
    ops commute with symmetric quantization; covers the plain, padded
    (pool5-style -inf/INT_MIN pads) and ceil-mode pools."""
    from objectdetection_ssd_tpu.models.layers import max_pool
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 7, 7, 4)).astype(np.float32)
    s = np.float32(np.abs(x).max() / 127.0)
    q = np.clip(np.round(x / s), -127, 127).astype(np.int8)
    for kw in (dict(window=2, stride=2),
               dict(window=3, stride=1, padding=1),
               dict(window=2, stride=2, ceil_mode=True)):
        pooled_q = np.asarray(max_pool(jnp.asarray(q), **kw))
        q_pooled = np.clip(np.round(
            np.asarray(max_pool(jnp.asarray(x), **kw)) / s),
            -127, 127).astype(np.int8)
        np.testing.assert_array_equal(pooled_q, q_pooled)
        assert pooled_q.dtype == np.int8


def test_int8_chain_bit_exact_on_ssd300(ssd_setup):
    """The requant-chained SSD300 graph must equal the unchained int8
    graph BIT FOR BIT — chaining is a memory-traffic rewrite, not a new
    approximation (the exactness argument in Int8Conv's docstring)."""
    cfg, model, params, images = ssd_setup
    stats = quant_lib.calibrate(model, params, [images])
    qtree = quant_lib.act_scales(stats)
    chained = quant_lib.chain_scales(qtree, "vgg16")
    assert quant_lib.count_quantized(chained) == 23
    # every VGG edge chains on the full tree (17 producer out_scales)
    n_out = sum(1 for p, _ in
                jax.tree_util.tree_flatten_with_path(chained)[0]
                if p[-1].key == "out_scale")
    assert n_out == len(quant_lib.VGG16_CHAIN_EDGES)

    loc_u, conf_u = model.apply({"params": params, "quant": qtree},
                                jnp.asarray(images))
    loc_c, conf_c = model.apply({"params": params, "quant": chained},
                                jnp.asarray(images))
    np.testing.assert_array_equal(np.asarray(loc_u), np.asarray(loc_c))
    np.testing.assert_array_equal(np.asarray(conf_u), np.asarray(conf_c))


def test_quant_noop_for_training_collections():
    """Without a mutable quant_stats collection and without a quant tree,
    TorchConv must behave exactly as before (the sow is a no-op) — the
    train path is untouched by the quantization hooks."""
    conv = TorchConv(features=4, kernel=3, padding=1)
    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (1, 5, 5, 2)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), x)
    y, grads = jax.value_and_grad(
        lambda p: conv.apply({"params": p}, x).sum())(v["params"])
    assert np.isfinite(float(y))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_ssd_resnet34_int8_forward_tracks_f32():
    """The second model family quantizes through the same hooks: BN convs
    (no bias), the weight-shared stride-2 neck (one covering scale from
    the running-max sow), and the loc/conf heads excluded by the same
    path policy."""
    cfg = Config(model=ModelConfig(backbone="resnet34", image_size=224))
    model = build_model(cfg.model)
    rng = np.random.default_rng(3)
    images = rng.normal(0, 0.5, (1, 224, 224, 3)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    params, bstats = v["params"], v.get("batch_stats")
    stats = quant_lib.calibrate(model, params, [images], batch_stats=bstats)
    qtree = quant_lib.act_scales(stats)
    assert quant_lib.count_quantized(qtree) > 30      # trunk + neck convs
    # no head conv quantized
    assert "conf_t4" not in qtree
    assert "conv" not in qtree.get("loc_t4", {})

    variables = {"params": params, "batch_stats": bstats}
    loc_f, conf_f = model.apply(variables, jnp.asarray(images))
    loc_q, conf_q = model.apply(dict(variables, quant=qtree),
                                jnp.asarray(images))
    for f, q in ((loc_f, loc_q), (conf_f, conf_q)):
        f, q = np.asarray(f).ravel(), np.asarray(q).ravel()
        assert np.corrcoef(f, q)[0, 1] > 0.99
        assert np.abs(f - q).mean() < 0.1 * np.std(f)


def test_int8_composes_with_tta_flip(ssd_setup):
    """int8 and TTA are independent opt-ins that must compose: the
    mirrored second forward runs through the same quantized convs (the
    shared `variables` carry the quant collection into both views)."""
    cfg, model, params, images = ssd_setup
    stats = quant_lib.calibrate(model, params, [images])
    qtree = quant_lib.act_scales(stats)
    pp = dataclasses.replace(cfg.postprocess, tta_flip=True)
    det = Detector(cfg, params, postprocess_config=pp, quant=qtree)
    out = jax.device_get(det.detect_batch(jnp.asarray(images)))
    assert out.scores.shape == (2, cfg.postprocess.top_k)
    assert np.isfinite(out.scores).all()
    assert np.isfinite(out.boxes_xyxy).all()


def test_ste_fake_quant_matches_int8_and_passes_gradients():
    """The QAT path (straight_through=True) must compute the SAME numbers
    as the int8 path (it is the same quantization expressed in f32) while
    passing gradients through the rounding (STE) — the int8 path's
    gradient is undefined/zero."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 7, 7, 4)).astype(np.float32))
    s_a = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)
    conv = Int8Conv(features=8, kernel=3, stride=2, padding=1)
    conv_ste = Int8Conv(features=8, kernel=3, stride=2, padding=1,
                        straight_through=True)
    v = conv.init(jax.random.PRNGKey(0), x, s_a)

    y_int8 = conv.apply(v, x, s_a)
    y_ste = conv_ste.apply(v, x, s_a)
    np.testing.assert_allclose(np.asarray(y_ste), np.asarray(y_int8),
                               rtol=1e-5, atol=1e-5)

    # Gradients flow through the fake-quant (identity through round, unit
    # through in-range clip, exactly zero where the input saturates).
    g = jax.grad(lambda p: conv_ste.apply({"params": p}, x, s_a).sum())(
        v["params"])
    gk = np.asarray(g["kernel"])
    assert np.isfinite(gk).all() and np.abs(gk).max() > 0
    gx = jax.grad(lambda xx: conv_ste.apply(v, xx, s_a).sum())(x)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.abs(np.asarray(gx)).max() > 0
    # saturated inputs get zero gradient (clip STE)
    x_sat = jnp.full_like(x, 1e6)
    gx_sat = jax.grad(
        lambda xx: conv_ste.apply(v, xx, s_a).sum())(x_sat)
    np.testing.assert_array_equal(np.asarray(gx_sat), 0.0)


def test_trainer_enable_qat_rebuilds_steps():
    import dataclasses as dc
    import flax.linen as fnn
    from objectdetection_ssd_tpu.config import Config, ModelConfig
    from objectdetection_ssd_tpu.train.trainer import Trainer

    class Mini(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            x = TorchConv(8, kernel=3, stride=8, padding=1, name="c")(x)
            loc = fnn.Conv(4, (1, 1))(x)
            conf = fnn.Conv(21, (1, 1))(x)
            return (loc.reshape(x.shape[0], -1, 4),
                    conf.reshape(x.shape[0], -1, 21))

    class _FakeLoader:
        records = []

        def __len__(self):
            return 1

    cfg = Config(model=ModelConfig(image_size=32))
    cfg = cfg.replace(data=dc.replace(cfg.data, batch_size=8))
    pri = np.concatenate([np.random.default_rng(0).uniform(0.2, 0.8, (16, 2)),
                          np.full((16, 2), 0.3)], 1).astype(np.float32)
    tr = Trainer(cfg, _FakeLoader(), model=Mini(), priors=pri)
    before = tr.train_step
    k0 = np.asarray(jax.device_get(tr.state.params["c"]["Conv_0"]["kernel"]))
    tr.enable_qat({"c": {"act_scale": np.float32(0.02)}})
    assert tr.train_step is not before
    # the rebuilt step runs and produces finite loss through fake-quant
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    batch = {"images": np.random.default_rng(1).normal(
                 0, 1, (8, 32, 32, 3)).astype(np.float32),
             "boxes": np.tile(np.asarray([[[0.2, 0.2, 0.7, 0.7]]],
                                         np.float32), (8, 1, 1)),
             "classes": np.tile(np.asarray([[2]], np.int32), (8, 1)),
             "mask": np.ones((8, 1), bool)}
    state2, metrics = tr.train_step(tr.state,
                                    mesh_lib.shard_batch(batch, tr.mesh))
    assert np.isfinite(float(metrics["loss"]))
    # fake-quant gradients actually moved the quantized conv
    k1 = np.asarray(jax.device_get(state2.params)["c"]["Conv_0"]["kernel"])
    assert not np.allclose(k0, k1)
