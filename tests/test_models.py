"""Shape/jit tests for the model family (SURVEY.md §4 recommended strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.config import ModelConfig
from objectdetection_ssd_tpu.models.layers import max_pool
from objectdetection_ssd_tpu.models.ssd import (SSD300, SSDResNet34,
                                                build_model)


def test_ceil_mode_pool_75_to_38():
    # The load-bearing geometry detail: torch's ceil_mode pool3 turns 75 -> 38
    # (reference Model.py:137); floor mode would give 37 and break all 8732
    # prior alignments.
    x = jnp.zeros((1, 75, 75, 4))
    assert max_pool(x, 2, 2, ceil_mode=True).shape == (1, 38, 38, 4)
    assert max_pool(x, 2, 2, ceil_mode=False).shape == (1, 37, 37, 4)


def test_ceil_mode_pool_values():
    # Padded lanes are -inf: max of the real values must win.
    x = -jnp.ones((1, 3, 3, 1))
    out = max_pool(x, 2, 2, ceil_mode=True)
    assert out.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(out[0, :, :, 0], [[-1, -1], [-1, -1]])


def test_pool5_3x3_stride1_keeps_size():
    x = jnp.zeros((1, 19, 19, 8))
    assert max_pool(x, 3, 1, padding=1).shape == (1, 19, 19, 8)


@pytest.fixture(scope="module")
def ssd300_outputs():
    model = SSD300()
    x = jnp.zeros((2, 300, 300, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    loc, conf = jax.jit(model.apply)(params, x)
    return params, loc, conf


def test_ssd300_output_shapes(ssd300_outputs):
    _, loc, conf = ssd300_outputs
    assert loc.shape == (2, 8732, 4)
    assert conf.shape == (2, 8732, 21)


def test_ssd300_l2norm_scale_init(ssd300_outputs):
    params, _, _ = ssd300_outputs
    scale = params["params"]["l2norm_4_3"]["scale"]
    np.testing.assert_allclose(scale, 20.0)
    assert scale.shape == (512,)


def test_ssd300_head_bias_zero_init(ssd300_outputs):
    params, _, _ = ssd300_outputs
    for i in range(6):
        np.testing.assert_allclose(
            params["params"][f"conf_head_{i}"]["Conv_0"]["bias"], 0.0)


def test_ssd_resnet34_shapes():
    model = SSDResNet34(k=9)
    x = jnp.zeros((2, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert loc.shape == (2, 189, 4)     # matches zoom_ratio_priors
    assert conf.shape == (2, 189, 21)


def test_ssd_resnet34_parity_k3():
    # Reference heads use k=3 -> 63 anchors (Model.py:37-47, SURVEY row 13).
    model = SSDResNet34(k=3)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(variables, x, train=False)
    assert loc.shape == (1, 63, 4)
    assert conf.shape == (1, 63, 21)


def test_ssd_resnet34_conf_bias_init():
    model = SSDResNet34(k=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    np.testing.assert_allclose(
        variables["params"]["conf_t4"]["Conv_0"]["bias"], -2.0)


def test_build_model_registry():
    assert isinstance(build_model(ModelConfig(backbone="vgg16")), SSD300)
    assert isinstance(
        build_model(ModelConfig(backbone="resnet34")), SSDResNet34)
    with pytest.raises(ValueError):
        build_model(ModelConfig(backbone="nope"))


def test_ssd300_bf16_compute():
    model = SSD300(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 300, 300, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(params, x)
    assert loc.shape == (1, 8732, 4)
    # params stay f32 for stable optimization
    leaf = params["params"]["trunk"]["conv1_1"]["Conv_0"]["kernel"]
    assert leaf.dtype == jnp.float32
