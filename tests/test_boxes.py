"""Golden tests for box geometry vs the reference math
(`Util.py:57-102, 252-301`)."""

import jax
import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.ops import boxes


def test_cxcywh_xyxy_roundtrip():
    rng = np.random.default_rng(0)
    cxcywh = np.concatenate(
        [rng.uniform(0.2, 0.8, (64, 2)), rng.uniform(0.05, 0.3, (64, 2))],
        axis=1).astype(np.float32)
    xyxy = boxes.cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = boxes.xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(back, cxcywh, atol=1e-6)


def test_cxcywh_to_xyxy_golden():
    got = boxes.cxcywh_to_xyxy(jnp.asarray([[0.5, 0.5, 0.2, 0.4]]))
    np.testing.assert_allclose(got, [[0.4, 0.3, 0.6, 0.7]], atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    priors = np.concatenate(
        [rng.uniform(0.1, 0.9, (128, 2)), rng.uniform(0.05, 0.5, (128, 2))],
        axis=1).astype(np.float32)
    gt = np.concatenate(
        [rng.uniform(0.1, 0.9, (128, 2)), rng.uniform(0.05, 0.5, (128, 2))],
        axis=1).astype(np.float32)
    off = boxes.encode(jnp.asarray(gt), jnp.asarray(priors))
    dec = boxes.decode(off, jnp.asarray(priors))
    np.testing.assert_allclose(dec, gt, atol=1e-4)  # f32 log/exp roundtrip


def test_encode_golden_values():
    # Hand-computed from the reference formulas (Util.py:98-102):
    # g_xy = (cxcy - p_xy) / (p_wh / 10); g_wh = log(wh / p_wh) * 5
    prior = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    box = jnp.asarray([[0.54, 0.46, 0.4, 0.1]])
    got = boxes.encode(box, prior)
    want = np.array([[0.04 / 0.02, -0.04 / 0.02,
                      np.log(2.0) * 5, np.log(0.5) * 5]], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_decode_golden_values():
    # cxcy = g[:2] * p_wh / 10 + p_xy; wh = exp(g[2:] / 5) * p_wh
    # (Util.py:86-91)
    prior = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    off = jnp.asarray([[2.0, -2.0, np.log(2.0) * 5, np.log(0.5) * 5]])
    got = boxes.decode(off, prior)
    np.testing.assert_allclose(got, [[0.54, 0.46, 0.4, 0.1]], atol=1e-5)


def test_pairwise_iou_golden():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0],
                     [0.0, 0.0, 0.5, 0.5]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0],
                     [0.5, 0.5, 1.0, 1.0],
                     [2.0, 2.0, 3.0, 3.0]])
    got = boxes.pairwise_iou(a, b)
    want = np.array([[1.0, 0.25, 0.0],
                     [0.25, 0.0, 0.0]], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pairwise_iou_batched_and_jittable():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (3, 5, 4)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 7, 4)).astype(np.float32)
    a = np.concatenate([np.minimum(a[..., :2], a[..., 2:]),
                        np.maximum(a[..., :2], a[..., 2:])], -1)
    b = np.concatenate([np.minimum(b[..., :2], b[..., 2:]),
                        np.maximum(b[..., :2], b[..., 2:])], -1)
    got = jax.jit(boxes.pairwise_iou)(a, b)
    assert got.shape == (3, 5, 7)
    # spot check one pair against the unbatched path
    np.testing.assert_allclose(
        got[1], boxes.pairwise_iou(a[1], b[1]), atol=1e-6)


def test_partial_overlap_iou():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0]])
    # inter = 1, union = 4 + 4 - 1 = 7
    np.testing.assert_allclose(
        boxes.pairwise_iou(a, b), [[1.0 / 7.0]], atol=1e-6)
