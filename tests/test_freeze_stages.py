"""Stage-level VGG trunk freezing (models/backbones.py:VGG16Trunk).

Frozen stages must (a) receive zero gradient through the stop_gradient cut,
(b) stay bit-identical through an SGD step (no weight decay drift — the
optimizer mask), while (c) every unfrozen param still trains.  Forward must
be unaffected by the freeze.
"""

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.config import LossConfig, OptimConfig
from objectdetection_ssd_tpu.losses.multibox import multibox_loss
from objectdetection_ssd_tpu.models.backbones import (VGG_STAGE_PARAMS,
                                                      vgg_frozen_prefixes)
from objectdetection_ssd_tpu.models.ssd import SSD300
from objectdetection_ssd_tpu.ops import priors as priors_lib
from objectdetection_ssd_tpu.train.state import create_train_state


def _tiny_batch(bs=2):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)),
                              jnp.float32),
        "boxes": jnp.tile(jnp.asarray([[[0.2, 0.2, 0.7, 0.7]]],
                                      jnp.float32), (bs, 1, 1)),
        "classes": jnp.full((bs, 1), 5, jnp.int32),
        "mask": jnp.ones((bs, 1), bool),
    }


def test_vgg_frozen_prefixes():
    assert vgg_frozen_prefixes(0) == ()
    assert vgg_frozen_prefixes(1) == ("trunk/conv1_1", "trunk/conv1_2")
    assert len(vgg_frozen_prefixes(5)) == sum(
        len(s) for s in VGG_STAGE_PARAMS)


def test_freeze_stages_grads_and_step():
    model = SSD300(freeze_stages=2)
    priors = jnp.asarray(priors_lib.ssd300_priors())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 300, 300, 3)),
                               OptimConfig(use_lr_schedule=False))
    batch = _tiny_batch()

    def loss_fn(params):
        loc, conf = state.apply_fn({"params": params}, batch["images"])
        return multibox_loss(loc, conf, batch["boxes"], batch["classes"],
                             batch["mask"], priors, LossConfig()).total

    grads = jax.jit(jax.grad(loss_fn))(state.params)
    kern = lambda tree, name: tree["trunk"][name]["Conv_0"]["kernel"]
    frozen = {"conv1_1", "conv1_2", "conv2_1", "conv2_2"}
    for name in grads["trunk"]:
        g = float(jnp.sum(jnp.abs(kern(grads, name))))
        if name in frozen:
            assert g == 0.0, f"{name} got gradient through the freeze"
        else:
            assert g > 0.0, f"{name} unexpectedly has zero gradient"

    new_state = jax.jit(lambda s, g: s.apply_gradients(g))(state, grads)
    for name in frozen:
        np.testing.assert_array_equal(
            np.asarray(kern(state.params, name)),
            np.asarray(kern(new_state.params, name)))
    # unfrozen trunk layer and a head both moved
    assert not np.array_equal(np.asarray(kern(state.params, "conv3_1")),
                              np.asarray(kern(new_state.params, "conv3_1")))
    assert not np.array_equal(
        np.asarray(state.params["loc_head_0"]["Conv_0"]["kernel"]),
        np.asarray(new_state.params["loc_head_0"]["Conv_0"]["kernel"]))


def test_freeze_does_not_change_forward():
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (1, 300, 300, 3)),
                    jnp.float32)
    m0, m2 = SSD300(freeze_stages=0), SSD300(freeze_stages=2)
    p = m0.init(jax.random.PRNGKey(0), x)
    loc0, conf0 = jax.jit(m0.apply)(p, x)
    loc2, conf2 = jax.jit(m2.apply)(p, x)
    np.testing.assert_array_equal(np.asarray(loc0), np.asarray(loc2))
    np.testing.assert_array_equal(np.asarray(conf0), np.asarray(conf2))
