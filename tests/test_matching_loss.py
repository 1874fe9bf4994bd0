"""Tests for the batched matcher and fused multibox loss.

Includes a full numerical-parity check against a numpy oracle that
transcribes the reference loss math verbatim (`Losses.py:136-199`): ragged
per-image GT, per-object best-prior override (last object wins on claim
ties), bg threshold 0.5, mean-L1 localization, CE + 3:1 per-image
hard-negative mining, normalization by total positives.
"""

import numpy as np
import jax.numpy as jnp

from objectdetection_ssd_tpu.config import LossConfig
from objectdetection_ssd_tpu.losses.multibox import multibox_loss
from objectdetection_ssd_tpu.ops import boxes as box_ops
from objectdetection_ssd_tpu.ops import matching, priors


def _np_iou(a, b):
    lo = np.maximum(a[:, None, :2], b[None, :, :2])
    hi = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(hi - lo, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _np_encode(cxcywh, p):
    g_xy = (cxcywh[:, :2] - p[:, :2]) / (p[:, 2:] / 10.0)
    g_wh = np.log(cxcywh[:, 2:] / p[:, 2:]) * 5.0
    return np.concatenate([g_xy, g_wh], axis=1)


def _np_xyxy_to_cxcywh(b):
    return np.concatenate([(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], 1)


def _oracle_loss(pred_off, pred_logits, gt_boxes_list, gt_classes_list,
                 priors_cxcywh):
    """Reference math (`Losses.py:136-199`) in plain numpy, ragged inputs."""
    bs, P, _ = pred_off.shape
    priors_xyxy = np.concatenate(
        [priors_cxcywh[:, :2] - priors_cxcywh[:, 2:] / 2,
         priors_cxcywh[:, :2] + priors_cxcywh[:, 2:] / 2], 1)

    loc_abs_sum, n_pos_total, pos_ce_sum, hn_ce_sum = 0.0, 0, 0.0, 0.0
    for i in range(bs):
        gt = gt_boxes_list[i]
        cls = gt_classes_list[i]
        iou = _np_iou(gt, priors_xyxy)                 # (n, P)
        overlap = iou.max(axis=0)
        obj = iou.argmax(axis=0)
        best_prior = iou.argmax(axis=1)                # (n,)
        for m in range(len(gt)):                       # in-place, last wins
            obj[best_prior[m]] = m
            overlap[best_prior[m]] = 1.0
        labels = cls[obj]
        labels[overlap < 0.5] = 20
        pos = labels != 20

        gt_cxcywh = _np_xyxy_to_cxcywh(gt)
        tgt = _np_encode(gt_cxcywh[obj], priors_cxcywh)
        loc_abs_sum += np.abs(pred_off[i][pos] - tgt[pos]).sum()
        n_pos = int(pos.sum())
        n_pos_total += n_pos

        logits = pred_logits[i]
        logz = np.log(np.exp(logits - logits.max(1, keepdims=True))
                      .sum(1)) + logits.max(1)
        ce = logz - logits[np.arange(P), labels]
        pos_ce_sum += ce[pos].sum()
        neg_ce = ce.copy()
        neg_ce[pos] = 0.0
        neg_sorted = np.sort(neg_ce)[::-1]
        hn_ce_sum += neg_sorted[:3 * n_pos].sum()

    loc = loc_abs_sum / (4.0 * n_pos_total)
    c = (hn_ce_sum + pos_ce_sum) / n_pos_total
    return c, loc


def _random_boxes(rng, n):
    lo = rng.uniform(0.0, 0.6, (n, 2))
    wh = rng.uniform(0.1, 0.39, (n, 2))
    return np.concatenate([lo, lo + wh], 1).astype(np.float32)


def _pad(gt_list, cls_list, max_boxes):
    bs = len(gt_list)
    boxes = np.zeros((bs, max_boxes, 4), np.float32)
    classes = np.zeros((bs, max_boxes), np.int32)
    mask = np.zeros((bs, max_boxes), bool)
    for i, (g, c) in enumerate(zip(gt_list, cls_list)):
        boxes[i, :len(g)] = g
        classes[i, :len(c)] = c
        mask[i, :len(g)] = True
    return boxes, classes, mask


def test_match_simple_two_objects():
    priors_xyxy = jnp.asarray([
        [0.0, 0.0, 0.4, 0.4],
        [0.6, 0.6, 1.0, 1.0],
        [0.0, 0.6, 0.4, 1.0],
    ])
    gt = jnp.asarray([[0.05, 0.05, 0.4, 0.4],     # overlaps prior 0
                      [0.6, 0.6, 0.95, 0.95]])    # overlaps prior 1
    res = matching.match_single(
        gt, jnp.asarray([3, 7]), jnp.asarray([True, True]), priors_xyxy)
    assert res.matched_class.tolist() == [3, 7, 20]
    # force-assigned priors get overlap 1.0
    assert res.matched_iou[0] == 1.0 and res.matched_iou[1] == 1.0


def test_match_force_assign_below_threshold():
    # A tiny object with IoU < 0.5 vs every prior must still claim its best
    # prior (reference Losses.py:164-167 pins overlap to 1.0).
    priors_xyxy = jnp.asarray([[0.0, 0.0, 1.0, 1.0],
                               [0.0, 0.0, 0.5, 0.5]])
    gt = jnp.asarray([[0.1, 0.1, 0.2, 0.2]])
    res = matching.match_single(
        gt, jnp.asarray([5]), jnp.asarray([True]), priors_xyxy)
    assert res.matched_class[1] == 5        # best prior claimed
    assert res.matched_class[0] == 20       # other prior stays bg


def test_match_claim_tie_last_object_wins():
    # Two objects whose best prior is the same: the reference's in-place
    # assignment loop means the later object wins.
    priors_xyxy = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                               [0.9, 0.9, 1.0, 1.0]])
    gt = jnp.asarray([[0.0, 0.0, 0.5, 0.5],
                      [0.0, 0.0, 0.45, 0.45]])
    res = matching.match_single(
        gt, jnp.asarray([1, 2]), jnp.asarray([True, True]), priors_xyxy)
    assert res.matched_class[0] == 2
    assert res.matched_iou[0] == 1.0


def test_match_all_padded_gives_background():
    priors_xyxy = jnp.asarray([[0.0, 0.0, 0.5, 0.5]])
    gt = jnp.zeros((4, 4))
    res = matching.match_single(
        gt, jnp.zeros(4, jnp.int32), jnp.zeros(4, bool), priors_xyxy)
    assert res.matched_class.tolist() == [20]


def test_loss_matches_reference_oracle():
    rng = np.random.default_rng(42)
    pri = priors.ssd300_priors()
    P = pri.shape[0]
    bs, max_boxes = 3, 8
    n_objs = [2, 5, 1]
    gt_list = [_random_boxes(rng, n) for n in n_objs]
    cls_list = [rng.integers(0, 20, n).astype(np.int64) for n in n_objs]
    pred_off = rng.normal(0, 1, (bs, P, 4)).astype(np.float32)
    pred_logits = rng.normal(0, 1, (bs, P, 21)).astype(np.float32)

    want_c, want_loc = _oracle_loss(
        pred_off, pred_logits, gt_list, cls_list, pri)

    boxes_p, classes_p, mask_p = _pad(gt_list, cls_list, max_boxes)
    got = multibox_loss(jnp.asarray(pred_off), jnp.asarray(pred_logits),
                        jnp.asarray(boxes_p), jnp.asarray(classes_p),
                        jnp.asarray(mask_p), jnp.asarray(pri))
    np.testing.assert_allclose(float(got.cls), want_c, rtol=2e-5)
    np.testing.assert_allclose(float(got.loc), want_loc, rtol=2e-5)
    np.testing.assert_allclose(float(got.total), want_c + want_loc, rtol=2e-5)


def test_loss_zero_when_perfect_predictions():
    rng = np.random.default_rng(7)
    pri = priors.ssd300_priors()
    gt = _random_boxes(rng, 3)
    boxes_p, classes_p, mask_p = _pad([gt], [np.array([1, 2, 3])], 8)

    # Build "perfect" predictions from the matcher's own targets.
    res = matching.match_batch(
        jnp.asarray(boxes_p), jnp.asarray(classes_p), jnp.asarray(mask_p),
        box_ops.cxcywh_to_xyxy(jnp.asarray(pri)))
    tgt_off = box_ops.encode(
        box_ops.xyxy_to_cxcywh(res.matched_box), jnp.asarray(pri)[None])
    logits = 50.0 * jnp.eye(21)[res.matched_class]
    got = multibox_loss(tgt_off, logits, jnp.asarray(boxes_p),
                        jnp.asarray(classes_p), jnp.asarray(mask_p),
                        jnp.asarray(pri))
    assert float(got.loc) < 1e-5
    assert float(got.cls) < 1e-3
    assert int(got.num_pos) > 0


def test_hard_negative_count():
    # Exactly one positive prior; 7 far-away negatives with identical CE.
    # With neg:pos = 3, exactly 3 negatives are kept (Losses.py:188-195).
    pri = np.asarray([[0.8, 0.8, 0.1, 0.1]] * 8, np.float32)
    pri[0] = [0.25, 0.25, 0.5, 0.5]              # xyxy (0,0,.5,.5) == GT
    gt = np.asarray([[[0.0, 0.0, 0.5, 0.5]]], np.float32)
    cls = np.asarray([[4]], np.int32)
    mask = np.asarray([[True]])
    P = pri.shape[0]
    # All-zero logits: every anchor's CE is log(21) whatever its label.
    logits = np.zeros((1, P, 21), np.float32)
    pred_off = np.zeros((1, P, 4), np.float32)
    got = multibox_loss(jnp.asarray(pred_off), jnp.asarray(logits),
                        jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask),
                        jnp.asarray(pri))
    assert int(got.num_pos) == 1
    # c_loss = (1 pos + 3 hard negs) * log(21) / 1
    np.testing.assert_allclose(float(got.cls), 4 * np.log(21.0), rtol=1e-4)
    # GT box == positive prior -> zero offsets == predictions -> loc 0.
    np.testing.assert_allclose(float(got.loc), 0.0, atol=1e-6)


def test_loss_is_jittable_and_differentiable():
    import jax
    rng = np.random.default_rng(3)
    pri = priors.ssd300_priors()
    P = pri.shape[0]
    gt = _random_boxes(rng, 2)
    boxes_p, classes_p, mask_p = _pad([gt], [np.array([0, 1])], 4)

    def f(off, logits):
        return multibox_loss(off, logits, jnp.asarray(boxes_p),
                             jnp.asarray(classes_p), jnp.asarray(mask_p),
                             jnp.asarray(pri)).total

    off = jnp.asarray(rng.normal(0, 1, (1, P, 4)).astype(np.float32))
    logits = jnp.asarray(rng.normal(0, 1, (1, P, 21)).astype(np.float32))
    g_off, g_logits = jax.jit(jax.grad(f, argnums=(0, 1)))(off, logits)
    assert np.isfinite(np.asarray(g_off)).all()
    assert np.isfinite(np.asarray(g_logits)).all()
    assert float(jnp.abs(g_off).sum()) > 0

def test_hnm_topk_formulations_agree():
    """The partial-top_k HNM (`LossConfig.hnm_topk`) is exact: values and
    gradients match the full-sort formulation, including when the cap binds
    and the lax.cond falls back to the sort (`Losses.py:188-195` semantics
    either way)."""
    import jax

    rng = np.random.default_rng(11)
    pri = priors.ssd300_priors()
    P = pri.shape[0]
    bs, max_boxes = 3, 8
    n_objs = [2, 5, 1]
    gt_list = [_random_boxes(rng, n) for n in n_objs]
    cls_list = [rng.integers(0, 20, n).astype(np.int64) for n in n_objs]
    boxes_p, classes_p, mask_p = _pad(gt_list, cls_list, max_boxes)
    off = jnp.asarray(rng.normal(0, 1, (bs, P, 4)).astype(np.float32))
    logits = jnp.asarray(rng.normal(0, 1, (bs, P, 21)).astype(np.float32))

    def run(k):
        cfg = LossConfig(hnm_topk=k)

        def f(o, l):
            return multibox_loss(o, l, jnp.asarray(boxes_p),
                                 jnp.asarray(classes_p), jnp.asarray(mask_p),
                                 jnp.asarray(pri), config=cfg)

        out = jax.jit(f)(off, logits)
        g_off, g_logits = jax.jit(
            jax.grad(lambda o, l: f(o, l).total, argnums=(0, 1)))(off, logits)
        return out, np.asarray(g_off), np.asarray(g_logits)

    base, g_off0, g_log0 = run(0)           # always full sort
    for k in (1024, 2):                     # fast path / cap binds -> cond
        got, g_off, g_log = run(k)
        np.testing.assert_allclose(float(got.cls), float(base.cls), rtol=1e-6)
        np.testing.assert_allclose(float(got.total), float(base.total),
                                   rtol=1e-6)
        np.testing.assert_allclose(g_off, g_off0, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(g_log, g_log0, rtol=1e-6, atol=1e-8)
