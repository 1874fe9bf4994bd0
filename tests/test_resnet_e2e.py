"""End-to-end wiring test for the ResNet-34 family: 189-anchor zoom/ratio
priors (standard column order) + SSDResNet34 (k=9) through the full train
step and postprocess. Verifies the variant the reference left incoherent
(SURVEY.md §2 row 13) is trainable here."""

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.config import (LossConfig, OptimConfig,
                                            PostprocessConfig)
from objectdetection_ssd_tpu.infer.postprocess import postprocess
from objectdetection_ssd_tpu.models.ssd import SSDResNet34
from objectdetection_ssd_tpu.ops import priors as priors_lib
from objectdetection_ssd_tpu.train import loop as loop_lib
from objectdetection_ssd_tpu.train.state import create_train_state


def test_zoom_ratio_priors_standard_order():
    ref, gs = priors_lib.zoom_ratio_priors(reference_order=True)
    std, gs2 = priors_lib.zoom_ratio_priors(reference_order=False)
    np.testing.assert_allclose(gs, gs2)
    # standard order = reference order with the first two columns unswapped
    np.testing.assert_allclose(std[:, 0], ref[:, 1])
    np.testing.assert_allclose(std[:, 1], ref[:, 0])
    np.testing.assert_allclose(std[:, 2:], ref[:, 2:])
    assert std.shape == (189, 4)


def test_resnet34_train_step_and_postprocess():
    pri, _ = priors_lib.zoom_ratio_priors(reference_order=False)
    pri = jnp.asarray(np.clip(pri, 1e-3, 1.0))   # w/h must be positive
    model = SSDResNet34(k=9, freeze_backbone=True)
    rng = np.random.default_rng(0)
    bs = 2
    batch = {
        "images": jnp.asarray(
            rng.normal(0, 1, (bs, 224, 224, 3)).astype(np.float32)),
        "boxes": jnp.asarray(
            np.tile([[[0.2, 0.2, 0.7, 0.7]]], (bs, 1, 1)).astype(np.float32)),
        "classes": jnp.asarray(np.tile([[4]], (bs, 1)).astype(np.int32)),
        "mask": jnp.ones((bs, 1), bool),
    }
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["images"][:1],
        OptimConfig(lr=1e-3, use_lr_schedule=False))
    assert state.batch_stats is not None     # BN stats tracked

    step_fn, eval_fn = loop_lib.make_jitted_steps(
        pri, LossConfig(), mesh=None, donate=False)
    state1, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1
    # BN stats must have updated in train mode
    leaf0 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    leaf1 = jax.tree_util.tree_leaves(state1.batch_stats)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))

    # frozen trunk: stem conv kernel unchanged by the update
    k0 = state.params["trunk"]["stem_conv"]["Conv_0"]["kernel"]
    k1 = state1.params["trunk"]["stem_conv"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1))
    # heads did move
    h0 = state.params["conf_t4"]["Conv_0"]["kernel"]
    h1 = state1.params["conf_t4"]["Conv_0"]["kernel"]
    assert not np.allclose(np.asarray(h0), np.asarray(h1))

    em = eval_fn(state1, batch)
    assert np.isfinite(float(em["loss"]))

    # inference path: forward + postprocess on the 189 anchors
    variables = {"params": state1.params, "batch_stats": state1.batch_stats}
    loc, conf = model.apply(variables, batch["images"], train=False)
    dets = postprocess(loc, conf, pri,
                       PostprocessConfig(per_class_top_k=32, top_k=20,
                                         use_approx_top_k=False))
    assert dets.boxes_xyxy.shape == (bs, 20, 4)
