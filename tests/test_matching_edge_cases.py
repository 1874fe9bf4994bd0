"""Extra edge-case coverage for the matcher and loss (beyond the oracle)."""

import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.config import LossConfig
from objectdetection_ssd_tpu.losses.multibox import multibox_loss
from objectdetection_ssd_tpu.ops import boxes as box_ops
from objectdetection_ssd_tpu.ops import matching


def test_more_objects_than_priors():
    # Every object force-claims its best prior; with 4 objects and 2 priors
    # the later claimants win (in-place assignment order).
    priors_xyxy = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                               [0.5, 0.5, 1.0, 1.0]])
    gt = jnp.asarray([[0.0, 0.0, 0.4, 0.4],
                      [0.05, 0.05, 0.45, 0.45],
                      [0.55, 0.55, 0.95, 0.95],
                      [0.6, 0.6, 1.0, 1.0]])
    cls = jnp.asarray([1, 2, 3, 4])
    res = matching.match_single(gt, cls, jnp.ones(4, bool), priors_xyxy)
    assert res.matched_class[0] == 2   # object 1 overrode object 0
    assert res.matched_class[1] == 4   # object 3 overrode object 2


def test_identical_objects_tie():
    priors_xyxy = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    gt = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                      [0.0, 0.0, 0.5, 0.5]])
    res = matching.match_single(gt, jnp.asarray([3, 7]),
                                jnp.ones(2, bool), priors_xyxy)
    # last object wins the forced claim
    assert res.matched_class[0] == 7


def test_mask_excludes_padded_duplicates():
    priors_xyxy = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    gt = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                      [0.0, 0.0, 0.5, 0.5]])
    res = matching.match_single(gt, jnp.asarray([3, 7]),
                                jnp.asarray([True, False]), priors_xyxy)
    assert res.matched_class[0] == 3   # padded row 1 can't claim


def test_loss_batch_with_empty_image():
    """An image with zero GT contributes no positives; the batch must still
    produce finite losses driven by the other image."""
    pri = np.asarray([[0.25, 0.25, 0.5, 0.5], [0.75, 0.75, 0.3, 0.3]],
                     np.float32)
    boxes = np.zeros((2, 2, 4), np.float32)
    classes = np.zeros((2, 2), np.int32)
    mask = np.zeros((2, 2), bool)
    boxes[0, 0] = [0.0, 0.0, 0.5, 0.5]
    classes[0, 0] = 5
    mask[0, 0] = True
    logits = np.zeros((2, 2, 21), np.float32)
    off = np.zeros((2, 2, 4), np.float32)
    out = multibox_loss(jnp.asarray(off), jnp.asarray(logits),
                        jnp.asarray(boxes), jnp.asarray(classes),
                        jnp.asarray(mask), jnp.asarray(pri))
    assert np.isfinite(float(out.total))
    assert int(out.num_pos) == 1


def test_loss_all_empty_batch_is_finite():
    pri = np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32)
    out = multibox_loss(jnp.zeros((1, 1, 4)), jnp.zeros((1, 1, 21)),
                        jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
                        jnp.zeros((1, 2), bool), jnp.asarray(pri))
    assert np.isfinite(float(out.total))
    assert int(out.num_pos) == 0


def test_huber_option_differs_from_l1():
    rng = np.random.default_rng(0)
    pri = np.concatenate([rng.uniform(0.3, 0.7, (8, 2)),
                          rng.uniform(0.2, 0.4, (8, 2))], 1).astype(np.float32)
    gt = np.asarray([[[0.3, 0.3, 0.7, 0.7]]], np.float32)
    cls = np.asarray([[2]], np.int32)
    mask = np.ones((1, 1), bool)
    off = rng.normal(0, 3, (1, 8, 4)).astype(np.float32)   # big errors
    logits = rng.normal(0, 1, (1, 8, 21)).astype(np.float32)
    l1 = multibox_loss(jnp.asarray(off), jnp.asarray(logits), jnp.asarray(gt),
                       jnp.asarray(cls), jnp.asarray(mask), jnp.asarray(pri),
                       LossConfig(loc_loss="l1"))
    hub = multibox_loss(jnp.asarray(off), jnp.asarray(logits),
                        jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask),
                        jnp.asarray(pri), LossConfig(loc_loss="huber"))
    assert float(hub.loc) < float(l1.loc)   # huber caps large residuals
    np.testing.assert_allclose(float(hub.cls), float(l1.cls), rtol=1e-6)
