"""Property-based tests (hypothesis) for the core ops.

Shapes are FIXED (one XLA compilation per function); hypothesis fuzzes the
values and shrinks failures.  These complement the golden/oracle tests:
they assert algebraic invariants over the whole input space rather than
agreement on chosen points.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from objectdetection_ssd_tpu.infer.postprocess import greedy_nms_mask
from objectdetection_ssd_tpu.ops import boxes as box_ops

SETTINGS = dict(deadline=None, max_examples=25)


def _boxes_strategy(n):
    """(n, 4) xyxy boxes with positive extents inside [0, 1]."""
    lo = hnp.arrays(np.float32, (n, 2),
                    elements=st.floats(0.0, 0.75, width=32, allow_subnormal=False))
    wh = hnp.arrays(np.float32, (n, 2),
                    elements=st.floats(0.0625, 0.25, width=32, allow_subnormal=False))
    return st.tuples(lo, wh).map(
        lambda t: np.concatenate([t[0], t[0] + t[1]], axis=1))


@settings(**SETTINGS)
@given(_boxes_strategy(16))
def test_codec_roundtrip(boxes_xyxy):
    """decode(encode(b, p), p) == b for any positive-extent box/prior."""
    cxcywh = box_ops.xyxy_to_cxcywh(jnp.asarray(boxes_xyxy))
    priors = jnp.roll(cxcywh, 1, axis=0)     # arbitrary positive-size priors
    enc = box_ops.encode(cxcywh, priors)
    dec = box_ops.decode(enc, priors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(cxcywh),
                               atol=1e-4, rtol=1e-4)


@settings(**SETTINGS)
@given(_boxes_strategy(12))
def test_iou_bounds_symmetry_identity(boxes_xyxy):
    b = jnp.asarray(boxes_xyxy)
    iou = np.asarray(box_ops.pairwise_iou(b, b))
    assert np.all(iou >= -1e-6) and np.all(iou <= 1 + 1e-6)
    np.testing.assert_allclose(iou, iou.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)


def _greedy_nms_oracle(iou, valid, thr):
    """Direct transcription of the greedy suppression semantics."""
    k = len(valid)
    keep = np.zeros(k, bool)
    suppressed = np.zeros(k, bool)
    for i in range(k):
        if not valid[i] or suppressed[i]:
            continue
        keep[i] = True
        for j in range(i + 1, k):
            if iou[i, j] >= thr:
                suppressed[j] = True
    return keep


@settings(**SETTINGS)
@given(_boxes_strategy(24),
       hnp.arrays(np.bool_, (24,), elements=st.booleans()),
       st.floats(0.125, 0.875, allow_subnormal=False))
def test_nms_matches_python_oracle(boxes_xyxy, valid, thr):
    b = jnp.asarray(boxes_xyxy)
    iou = np.asarray(box_ops.pairwise_iou(b, b))
    ours = np.asarray(greedy_nms_mask(jnp.asarray(iou), jnp.asarray(valid),
                                      float(thr)))
    oracle = _greedy_nms_oracle(iou, valid, float(thr))
    np.testing.assert_array_equal(ours, oracle)


@settings(**SETTINGS)
@given(_boxes_strategy(8),
       hnp.arrays(np.int32, (8,), elements=st.integers(0, 19)))
def test_matcher_force_assigns_every_gt(boxes_xyxy, classes):
    """Every valid GT claims at least one prior with its class (the
    per-object best-prior override, reference `Losses.py:157-167`)."""
    from objectdetection_ssd_tpu.ops import matching
    from objectdetection_ssd_tpu.ops import priors as priors_lib

    priors_xyxy = box_ops.cxcywh_to_xyxy(
        jnp.asarray(priors_lib.ssd300_priors()))
    m = matching.match_batch(
        jnp.asarray(boxes_xyxy)[None], jnp.asarray(classes)[None],
        jnp.ones((1, len(classes)), bool), priors_xyxy, 0.5)
    matched = np.asarray(m.matched_class[0])
    boxes = np.asarray(m.matched_box[0])
    # Each GT's guaranteed claim is its best-IoU prior (the force-assign,
    # reference `Losses.py:157-167`) — but a LATER GT whose best prior is
    # the same slot steals it (last-object-wins, also reference semantics,
    # pinned against the actual reference code in test_reference_parity).
    iou = np.asarray(box_ops.pairwise_iou(
        jnp.asarray(boxes_xyxy), priors_xyxy))            # (G, P)
    best_prior = np.argmax(iou, axis=1)
    for g in range(len(classes)):
        rows = np.flatnonzero(
            (np.abs(boxes - boxes_xyxy[g]) < 1e-6).all(axis=1)
            & (matched == classes[g]))
        stolen = any(best_prior[g2] == best_prior[g]
                     for g2 in range(g + 1, len(classes)))
        assert len(rows) > 0 or stolen


@settings(**SETTINGS)
@given(st.integers(0, 2**31 - 1))
def test_train_transform_geometric_invariants(seed):
    """Whatever the random draw, the augmentation pipeline must emit boxes
    inside the output image, with positive extents, labels a subset of the
    inputs, and box/label counts equal."""
    from objectdetection_ssd_tpu.data import augment

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (48, 64, 3)).astype(np.float32) / 255.0
    boxes = np.asarray([[5.0, 6.0, 30.0, 28.0],
                        [20.0, 10.0, 60.0, 44.0],
                        [1.0, 1.0, 10.0, 9.0]], np.float32)
    labels = np.asarray([2, 7, 11], np.int64)

    out_img, out_boxes, out_labels = augment.train_transform(
        img, boxes.copy(), labels.copy(), rng)

    h, w = out_img.shape[:2]
    assert len(out_boxes) == len(out_labels)
    assert set(out_labels.tolist()) <= set(labels.tolist())
    if len(out_boxes):
        assert np.all(out_boxes[:, 0] < out_boxes[:, 2] + 1e-3)
        assert np.all(out_boxes[:, 1] < out_boxes[:, 3] + 1e-3)
        assert np.all(out_boxes[:, :2] >= -1.0 - 1e-3)   # flip math is x-1
        assert np.all(out_boxes[:, 2] <= w + 1e-3)
        assert np.all(out_boxes[:, 3] <= h + 1e-3)
    assert np.isfinite(out_img).all()
    assert out_img.min() >= -1e-3 and out_img.max() <= 1.0 + 1e-3
