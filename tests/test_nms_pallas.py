"""Pallas NMS kernel parity vs the lax mask implementation (interpret mode
on the CPU backend; the same kernel was validated compiled on real TPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.config import PostprocessConfig
from objectdetection_ssd_tpu.infer.nms_pallas import greedy_nms_keep
from objectdetection_ssd_tpu.infer.postprocess import (greedy_nms_mask,
                                                       postprocess)
from objectdetection_ssd_tpu.ops import boxes as box_ops


def _random_candidates(rng, g, k):
    lo = rng.uniform(0, 0.7, (g, k, 2))
    wh = rng.uniform(0.05, 0.3, (g, k, 2))
    boxes = np.concatenate([lo, lo + wh], -1).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, (g, k)).astype(np.float32), axis=-1)
    return boxes, scores


def test_pallas_nms_matches_mask_version():
    rng = np.random.default_rng(0)
    boxes, scores = _random_candidates(rng, 12, 128)
    valid = scores >= 0.2
    iou = box_ops.pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    want = greedy_nms_mask(iou, jnp.asarray(valid), 0.45, unrolled=True)
    got = greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.45)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_nms_all_invalid():
    rng = np.random.default_rng(1)
    boxes, scores = _random_candidates(rng, 2, 128)
    got = greedy_nms_keep(jnp.asarray(boxes),
                          jnp.zeros((2, 128), bool), 0.45)
    assert not np.asarray(got).any()


def test_pallas_nms_multi_leading_dims():
    rng = np.random.default_rng(2)
    boxes, scores = _random_candidates(rng, 6, 128)
    boxes4 = boxes.reshape(2, 3, 128, 4)
    valid4 = (scores >= 0.2).reshape(2, 3, 128)
    got = greedy_nms_keep(jnp.asarray(boxes4), jnp.asarray(valid4), 0.45)
    flat = greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(scores >= 0.2),
                           0.45)
    np.testing.assert_array_equal(np.asarray(got).reshape(6, 128),
                                  np.asarray(flat))


def test_postprocess_pallas_path_matches_default():
    rng = np.random.default_rng(3)
    P = 256
    priors = np.concatenate(
        [rng.uniform(0.1, 0.9, (P, 2)), rng.uniform(0.05, 0.3, (P, 2))],
        1).astype(np.float32)
    offsets = rng.normal(0, 0.5, (2, P, 4)).astype(np.float32)
    logits = rng.normal(0, 2, (2, P, 21)).astype(np.float32)
    base = PostprocessConfig(per_class_top_k=128, top_k=50,
                             use_approx_top_k=False)
    cfg_p = dataclasses.replace(base, use_pallas_nms=True)
    d0 = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                     jnp.asarray(priors), base)
    d1 = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                     jnp.asarray(priors), cfg_p)
    np.testing.assert_array_equal(np.asarray(d0.valid), np.asarray(d1.valid))
    np.testing.assert_allclose(np.asarray(d0.scores), np.asarray(d1.scores),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d0.boxes_xyxy),
                               np.asarray(d1.boxes_xyxy), atol=1e-6)
