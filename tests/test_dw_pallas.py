"""Pallas filter-gradient kernel (ops/dw_pallas.py).

The kernel runs in interpret mode on the CPU mesh; tests pin it against
`jax.grad` of the plain XLA conv — forward, dX and dW must all agree —
plus the TorchConv routing (param-tree compatibility, geometry gating)
and the trunk threading.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.models.layers import TorchConv
from objectdetection_ssd_tpu.ops import dw_pallas


@pytest.mark.parametrize("shape", [
    (2, 6, 7, 4, 8),     # multi-block rows (hb divides 6)
    (1, 4, 5, 3, 2),     # conv1_1-like tiny Cin
    (2, 12, 10, 8, 16),  # several row blocks
])
def test_conv3x3p1_grads_match_autodiff(shape):
    n, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, ci)).astype(np.float32))
    wk = jnp.asarray(rng.normal(0, 0.2, (3, 3, ci, co)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (n, h, w, co)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(dw_pallas.conv3x3p1(x, wk)),
        np.asarray(dw_pallas._conv(x, wk)), rtol=1e-6, atol=1e-6)

    def ref(x, wk):
        return jnp.sum(dw_pallas._conv(x, wk) * g)

    def got(x, wk):
        return jnp.sum(dw_pallas.conv3x3p1(x, wk) * g)

    dx_ref, dw_ref = jax.grad(ref, argnums=(0, 1))(x, wk)
    dx_got, dw_got = jax.grad(got, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


def test_torchconv_dw_pallas_routing_and_param_tree():
    """dw_pallas=True must keep the exact Conv_0/{kernel,bias} param tree
    (checkpoints interchange) and the same forward values; ineligible
    geometry (stride 2) silently stays on the nn.Conv path."""
    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (2, 8, 8, 4)).astype(np.float32))
    plain = TorchConv(features=6, kernel=3, padding=1)
    routed = TorchConv(features=6, kernel=3, padding=1, dw_pallas=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = routed.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v2)
    np.testing.assert_allclose(np.asarray(routed.apply(v, x)),
                               np.asarray(plain.apply(v, x)),
                               rtol=1e-6, atol=1e-6)
    # gradient through the routed conv matches the plain conv
    gp = jax.grad(lambda p: plain.apply({"params": p}, x).sum())(v["params"])
    gr = jax.grad(lambda p: routed.apply({"params": p}, x).sum())(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)

    strided = TorchConv(features=6, kernel=3, padding=1, stride=2,
                        dw_pallas=True)
    vs = strided.init(jax.random.PRNGKey(0), x)
    assert np.asarray(strided.apply(vs, x)).shape == (2, 4, 4, 6)


def test_vgg_trunk_threads_dw_pallas_names():
    """VGG16Trunk(dw_pallas_convs=...) routes exactly the named convs; the
    param tree (and therefore every checkpoint) is unchanged."""
    from objectdetection_ssd_tpu.models.backbones import VGG16Trunk

    t_plain = VGG16Trunk()
    t_routed = VGG16Trunk(dw_pallas_convs=("conv1_2",))
    shapes = jax.eval_shape(
        lambda: t_plain.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 300, 300, 3))))
    shapes2 = jax.eval_shape(
        lambda: t_routed.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 300, 300, 3))))
    assert jax.tree_util.tree_structure(shapes) == \
        jax.tree_util.tree_structure(shapes2)
