"""Tests for fixed-shape on-device NMS / postprocess vs a numpy oracle that
transcribes the reference's suppression loop (`Losses.py:44-56`) and
per-class/threshold/top-k flow (`Losses.py:27-81`)."""

import numpy as np
import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.config import PostprocessConfig
from objectdetection_ssd_tpu.infer.postprocess import (Detections,
                                                       greedy_nms_mask,
                                                       postprocess,
                                                       scale_detections)
from objectdetection_ssd_tpu.ops import boxes as box_ops


def _np_iou(a, b):
    lo = np.maximum(a[:, None, :2], b[None, :, :2])
    hi = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(hi - lo, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + ab[None, :] - inter)


def _oracle_nms(boxes, scores, iou_thr):
    """Reference suppression loop on score-sorted candidates; returns kept
    indices into the sorted order."""
    order = np.argsort(-scores, kind="stable")
    boxes, scores = boxes[order], scores[order]
    iou = _np_iou(boxes, boxes)
    n = len(boxes)
    suppress = np.zeros(n, bool)
    for i in range(n):
        if suppress[i]:
            continue
        suppress |= iou[i] >= iou_thr
        suppress[i] = False
    return order[~suppress]


def test_greedy_nms_golden_chain():
    # Three boxes: A overlaps B heavily, B overlaps C heavily, A-C disjoint.
    # Greedy keeps A, suppresses B; C survives because B (suppressed) never
    # acts — the exact reference semantics (`if suppress[box]: continue`).
    boxes = np.array([[0.0, 0.0, 1.0, 1.0],
                      [0.05, 0.0, 1.05, 1.0],
                      [1.0, 0.0, 2.0, 1.0]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    iou = jnp.asarray(_np_iou(boxes, boxes))
    keep = greedy_nms_mask(iou, jnp.ones(3, bool), 0.45)
    assert keep.tolist() == [True, False, True]
    np.testing.assert_array_equal(_oracle_nms(boxes, scores, 0.45), [0, 2])


def test_greedy_nms_suppressed_box_does_not_suppress():
    # B suppressed by A; C overlaps B but not A -> C kept.
    boxes = np.array([[0.0, 0.0, 1.0, 1.0],
                      [0.4, 0.0, 1.4, 1.0],
                      [0.9, 0.0, 1.9, 1.0]], np.float32)
    iou = _np_iou(boxes, boxes)
    assert iou[0, 1] >= 0.4 and iou[1, 2] >= 0.3 and iou[0, 2] < 0.1
    keep = greedy_nms_mask(jnp.asarray(iou), jnp.ones(3, bool), 0.3)
    assert keep.tolist() == [True, False, True]


def test_greedy_nms_invalid_never_acts_or_survives():
    boxes = np.array([[0.0, 0.0, 1.0, 1.0],
                      [0.05, 0.0, 1.05, 1.0]], np.float32)
    iou = jnp.asarray(_np_iou(boxes, boxes))
    keep = greedy_nms_mask(iou, jnp.asarray([False, True]), 0.45)
    # invalid top box must not suppress the second one
    assert keep.tolist() == [False, True]


def test_greedy_nms_random_matches_oracle():
    rng = np.random.default_rng(0)
    n = 64
    lo = rng.uniform(0, 0.7, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    boxes = np.concatenate([lo, lo + wh], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0.2, 1.0, n).astype(np.float32))[::-1]
    iou = _np_iou(boxes, boxes)
    keep = greedy_nms_mask(jnp.asarray(iou), jnp.ones(n, bool), 0.45)
    want = np.zeros(n, bool)
    want[_oracle_nms(boxes, scores, 0.45)] = True
    np.testing.assert_array_equal(np.asarray(keep), want)


def _oracle_soft_nms(boxes, scores, method, sigma, iou_thr):
    """Scalar transcription of Soft-NMS (Bodla et al. 2017, alg. 1):
    iteratively pick the max-score candidate, decay its overlaps' scores.
    Returns each candidate's score at the moment it was picked."""
    n = len(boxes)
    iou = _np_iou(boxes, boxes)
    work = scores.astype(np.float64).copy()
    alive = np.ones(n, bool)
    out = np.zeros(n)
    for _ in range(n):
        masked = np.where(alive, work, -1.0)
        i = int(np.argmax(masked))
        if masked[i] <= 0.0:
            break
        out[i] = work[i]
        alive[i] = False
        if method == "soft_gaussian":
            decay = np.exp(-(iou[i] ** 2) / sigma)
        else:
            decay = np.where(iou[i] >= iou_thr, 1.0 - iou[i], 1.0)
        work = np.where(alive, work * decay, work)
    return out


def test_soft_nms_matches_scalar_oracle():
    """Both soft-NMS flavors, both loop formulations, vs the scalar
    algorithm on random overlapping boxes."""
    from objectdetection_ssd_tpu.infer.postprocess import soft_nms_scores
    rng = np.random.default_rng(3)
    n = 32
    lo = rng.uniform(0, 0.6, (n, 2))
    wh = rng.uniform(0.1, 0.4, (n, 2))
    boxes = np.concatenate([lo, lo + wh], 1).astype(np.float32)
    scores = np.sort(rng.uniform(0.05, 1.0, n).astype(np.float32))[::-1]
    iou = _np_iou(boxes, boxes).astype(np.float32)
    for method in ("soft_gaussian", "soft_linear"):
        want = _oracle_soft_nms(boxes, scores, method, 0.5, 0.45)
        for unrolled in (True, False):
            got = soft_nms_scores(jnp.asarray(iou), jnp.asarray(scores),
                                  jnp.ones(n, bool), method=method,
                                  sigma=0.5, iou_threshold=0.45,
                                  unrolled=unrolled)
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                       atol=1e-7)


def test_soft_nms_invalid_candidates_stay_zero():
    from objectdetection_ssd_tpu.infer.postprocess import soft_nms_scores
    iou = jnp.eye(4)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    valid = jnp.asarray([True, False, True, False])
    got = np.asarray(soft_nms_scores(iou, scores, valid))
    np.testing.assert_allclose(got, [0.9, 0.0, 0.7, 0.0])


def test_postprocess_soft_nms_recovers_crowded_duplicate():
    """The crowded-scene motivation: two genuinely-distinct same-class
    objects with IoU above the hard-NMS threshold — hard NMS keeps one,
    soft keeps both (second at a decayed score)."""
    import dataclasses
    priors, offsets, logits = _toy_predictions()
    # make the overlapping prior-1 a strong detection too
    logits[0, 1, 3] = 5.9
    cfg = PostprocessConfig(per_class_top_k=4, top_k=8,
                            use_approx_top_k=False, anchor_prefilter=0)
    hard = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                       jnp.asarray(priors), cfg)
    soft = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                       jnp.asarray(priors),
                       dataclasses.replace(cfg, nms_method="soft_gaussian",
                                           score_threshold=0.1))
    hard_c3 = int((np.asarray(hard.classes)[0][np.asarray(hard.valid)[0]]
                   == 3).sum())
    soft_c3 = int((np.asarray(soft.classes)[0][np.asarray(soft.valid)[0]]
                   == 3).sum())
    assert hard_c3 == 1 and soft_c3 == 2
    # the survivor's decayed score is below its raw softmax score
    s = np.sort(np.asarray(soft.scores)[0][np.asarray(soft.valid)[0]])[0]
    assert 0.1 <= s < 0.5


def _toy_predictions():
    """4 priors; craft logits so class scores are controlled."""
    priors = np.array([[0.25, 0.25, 0.3, 0.3],
                       [0.27, 0.25, 0.3, 0.3],     # overlaps prior 0
                       [0.75, 0.75, 0.3, 0.3],
                       [0.5, 0.5, 0.2, 0.2]], np.float32)
    P = priors.shape[0]
    offsets = np.zeros((1, P, 4), np.float32)      # predict the priors as-is
    logits = np.full((1, P, 21), -10.0, np.float32)
    logits[0, :, 20] = 0.0                          # bg default
    logits[0, 0, 3] = 6.0                           # strong class-3 at prior 0
    logits[0, 1, 3] = 5.0                           # weaker, overlapping
    logits[0, 2, 7] = 6.0                           # class-7 detection
    logits[0, 3, :] = 0.0                           # uniform -> below 0.2
    return priors, offsets, logits


def test_postprocess_end_to_end():
    priors, offsets, logits = _toy_predictions()
    cfg = PostprocessConfig(per_class_top_k=4, top_k=8)
    dets = jax.jit(lambda o, l: postprocess(o, l, jnp.asarray(priors), cfg))(
        jnp.asarray(offsets), jnp.asarray(logits))
    valid = np.asarray(dets.valid[0])
    classes = np.asarray(dets.classes[0])[valid]
    scores = np.asarray(dets.scores[0])[valid]
    boxes = np.asarray(dets.boxes_xyxy[0])[valid]
    # prior-1's class-3 det suppressed by prior-0's (IoU ~0.87 > 0.45);
    # prior-3's uniform logits give ~1/21 < 0.2 -> dropped by threshold.
    assert sorted(classes.tolist()) == [3, 7]
    assert (scores > 0.9).all()
    want0 = box_ops.cxcywh_to_xyxy(jnp.asarray(priors[0]))
    got3 = boxes[classes.tolist().index(3)]
    np.testing.assert_allclose(got3, want0, atol=1e-6)


def test_postprocess_empty_when_all_background():
    priors = np.array([[0.5, 0.5, 0.2, 0.2]] * 3, np.float32)
    offsets = np.zeros((2, 3, 4), np.float32)
    logits = np.zeros((2, 3, 21), np.float32)
    logits[..., 20] = 10.0
    cfg = PostprocessConfig(per_class_top_k=3, top_k=5)
    dets = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                       jnp.asarray(priors), cfg)
    assert not np.asarray(dets.valid).any()


def test_postprocess_global_topk_caps_output():
    rng = np.random.default_rng(1)
    P = 32
    lo = rng.uniform(0, 0.9, (P, 2)).astype(np.float32)
    priors = np.concatenate([lo, np.full((P, 2), 0.02, np.float32)], 1)
    offsets = np.zeros((1, P, 4), np.float32)
    logits = np.zeros((1, P, 21), np.float32)
    logits[0, :, :20] = 5.0  # every class confident everywhere; tiny boxes
    cfg = PostprocessConfig(per_class_top_k=8, top_k=10,
                            score_threshold=0.01)
    dets = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                       jnp.asarray(priors), cfg)
    assert dets.boxes_xyxy.shape == (1, 10, 4)
    assert np.asarray(dets.valid[0]).sum() == 10


def test_scale_detections():
    dets = Detections(
        boxes_xyxy=jnp.asarray([[[0.1, 0.2, 0.5, 0.8]]]),
        scores=jnp.asarray([[0.9]]),
        classes=jnp.asarray([[2]]),
        valid=jnp.asarray([[True]]))
    out = scale_detections(dets, jnp.asarray([[200, 100]]))
    np.testing.assert_allclose(
        out.boxes_xyxy[0, 0], [20.0, 20.0, 100.0, 80.0], atol=1e-5)


def test_anchor_prefilter_matches_full_path():
    # With realistic sparsity (few confident anchors), the two-stage
    # prefilter must select the identical detections.
    from objectdetection_ssd_tpu.config import PostprocessConfig
    import dataclasses
    rng = np.random.default_rng(5)
    P = 2048
    lo = rng.uniform(0, 0.9, (P, 2)).astype(np.float32)
    priors = np.concatenate([lo, np.full((P, 2), 0.05, np.float32)], 1)
    offsets = np.zeros((2, P, 4), np.float32)
    logits = np.zeros((2, P, 21), np.float32)
    logits[..., 20] = 5.0                      # bg everywhere
    conf_idx = rng.choice(P, 40, replace=False)
    for b in range(2):
        for i in conf_idx:
            # distinct confidences: equal scores would make the kept-box
            # selection legitimately order-dependent between the two paths
            logits[b, i, rng.integers(0, 20)] = rng.uniform(7.0, 10.0)
    base = PostprocessConfig(per_class_top_k=32, top_k=50,
                             use_approx_top_k=True, anchor_prefilter=0)
    # 128 is the product default (see PostprocessConfig); 256 pins the
    # larger budget too.
    pre = dataclasses.replace(base, anchor_prefilter=128)
    pre256 = dataclasses.replace(base, anchor_prefilter=256)
    d0 = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                     jnp.asarray(priors), base)
    d1 = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                     jnp.asarray(priors), pre)
    d256 = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                       jnp.asarray(priors), pre256)
    np.testing.assert_array_equal(np.asarray(d0.valid), np.asarray(d1.valid))
    np.testing.assert_array_equal(np.asarray(d0.valid),
                                  np.asarray(d256.valid))

    # The two paths round scores differently (bf16 single-stage vs f32
    # prefilter), which permutes near-equal rows in the global sort —
    # compare the detection SETS, order-independently.
    def rows(d, i):
        v = np.asarray(d.valid[i])
        r = np.concatenate(
            [np.asarray(d.classes[i])[v, None].astype(np.float32),
             np.asarray(d.boxes_xyxy[i])[v],
             np.asarray(d.scores[i])[v, None]], axis=1)
        return r[np.lexsort(r.T[::-1])]

    for i in range(2):
        r0, r1 = rows(d0, i), rows(d1, i)
        assert r0.shape == r1.shape
        np.testing.assert_allclose(r0[:, :5], r1[:, :5], atol=1e-6)
        np.testing.assert_allclose(r0[:, 5], r1[:, 5], atol=1e-2)


def test_full_inference_flow_matches_reference_oracle():
    """End-to-end postprocess vs a numpy transcription of the reference's
    whole `inference` flow (`Losses.py:11-98`): per class threshold 0.2 ->
    sort desc -> greedy NMS 0.45 -> concat -> global top-k by score."""
    from objectdetection_ssd_tpu.config import PostprocessConfig

    rng = np.random.default_rng(11)
    P = 512
    lo = rng.uniform(0.05, 0.75, (P, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.2, (P, 2)).astype(np.float32)
    priors = np.concatenate([lo + wh / 2, wh], 1)        # cxcywh
    offsets = (rng.normal(0, 0.3, (1, P, 4))).astype(np.float32)
    logits = np.zeros((1, P, 21), np.float32)
    logits[..., 20] = 4.0                                 # bg default
    hot = rng.choice(P, 60, replace=False)
    for i in hot:
        logits[0, i, rng.integers(0, 20)] = rng.uniform(5.0, 9.0)

    # ---- numpy oracle ----
    def np_decode(off, pri):
        xy = off[:, :2] * pri[:, 2:] / 10 + pri[:, :2]
        w_h = np.exp(off[:, 2:] / 5) * pri[:, 2:]
        return np.concatenate([xy - w_h / 2, xy + w_h / 2], 1)

    dec = np_decode(offsets[0], priors)
    e = np.exp(logits[0] - logits[0].max(1, keepdims=True))
    probs = e / e.sum(1, keepdims=True)
    all_rows = []
    for c in range(20):
        scores = probs[:, c]
        keep_idx = np.where(scores >= 0.2)[0]
        if len(keep_idx) == 0:
            continue
        order = keep_idx[np.argsort(-scores[keep_idx], kind="stable")]
        b = dec[order]
        iou = _np_iou(b, b)
        n = len(order)
        sup = np.zeros(n, bool)
        for i in range(n):
            if sup[i]:
                continue
            sup |= iou[i] >= 0.45
            sup[i] = False
        for j in np.where(~sup)[0]:
            all_rows.append((c, scores[order[j]], b[j]))
    all_rows.sort(key=lambda r: -r[1])
    all_rows = all_rows[:200]

    # ---- framework, exact mode with generous K ----
    cfg = PostprocessConfig(per_class_top_k=128, top_k=200,
                            use_approx_top_k=False)
    dets = postprocess(jnp.asarray(offsets), jnp.asarray(logits),
                       jnp.asarray(priors), cfg)
    v = np.asarray(dets.valid[0])
    got = sorted(
        zip(np.asarray(dets.classes[0])[v].tolist(),
            np.asarray(dets.scores[0])[v].tolist(),
            [tuple(b) for b in np.asarray(dets.boxes_xyxy[0])[v]]),
        key=lambda r: -r[1])

    assert len(got) == len(all_rows)
    for (wc, ws, wb), (gc, gs, gb) in zip(all_rows, got):
        assert wc == gc
        np.testing.assert_allclose(gs, ws, rtol=1e-5)
        np.testing.assert_allclose(gb, wb, atol=1e-5)
