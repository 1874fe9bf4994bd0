"""Tests for the legacy/auxiliary parity ops: tanh-bounded decode
(`Util.py:409-424`), per-image loss wrapper (`Losses.py:201-225`), focal
loss (`Losses.py:228-242`)."""

import jax.numpy as jnp
import numpy as np

from objectdetection_ssd_tpu.losses.multibox import (focal_loss,
                                                     multibox_loss,
                                                     multibox_loss_single)
from objectdetection_ssd_tpu.ops import boxes, priors


def test_decode_tanh_golden():
    pri = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    gs = jnp.asarray([0.25])
    pred = jnp.asarray([[0.3, -0.3, 0.0, 1.0]])
    got = boxes.decode_tanh(pred, pri, gs)
    t = np.tanh([0.3, -0.3, 0.0, 1.0])
    want = [0.5 + t[0] / 2 * 0.25, 0.5 + t[1] / 2 * 0.25,
            (t[2] / 2 + 1) * 0.2, (t[3] / 2 + 1) * 0.2]
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-6)


def test_decode_tanh_zoom_ratio_shapes():
    pri, gs = priors.zoom_ratio_priors()
    pred = jnp.zeros((2, 189, 4))
    out = boxes.decode_tanh(pred, jnp.asarray(pri), jnp.asarray(gs))
    assert out.shape == (2, 189, 4)
    # zero activations -> centers at priors, wh = priors' wh
    np.testing.assert_allclose(np.asarray(out[0, :, :2]), pri[:, :2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, :, 2:]), pri[:, 2:],
                               atol=1e-6)


def test_single_image_loss_matches_batched():
    rng = np.random.default_rng(0)
    pri = priors.ssd300_priors()
    P = pri.shape[0]
    lo = rng.uniform(0.0, 0.6, (3, 2))
    wh = rng.uniform(0.1, 0.39, (3, 2))
    gt = np.concatenate([lo, lo + wh], 1).astype(np.float32)
    cls = np.asarray([1, 5, 9], np.int32)
    off = rng.normal(0, 1, (P, 4)).astype(np.float32)
    logits = rng.normal(0, 1, (P, 21)).astype(np.float32)

    single = multibox_loss_single(jnp.asarray(off), jnp.asarray(logits),
                                  jnp.asarray(gt), jnp.asarray(cls),
                                  jnp.asarray(pri))
    batched = multibox_loss(jnp.asarray(off)[None], jnp.asarray(logits)[None],
                            jnp.asarray(gt)[None], jnp.asarray(cls)[None],
                            jnp.ones((1, 3), bool), jnp.asarray(pri))
    np.testing.assert_allclose(float(single.total), float(batched.total))
    assert int(single.num_pos) == int(batched.num_pos)


def test_focal_loss_golden():
    # alpha=.25, gamma=2 (Losses.py:238): w = (a*t + (1-a)*(1-t))*(1-pt)^2,
    # loss = mean(w * BCE_with_logits).
    logits = jnp.asarray([[2.0, -1.0]])
    targets = jnp.asarray([[1.0, 0.0]])
    p = 1 / (1 + np.exp(-np.asarray([2.0, -1.0])))
    pt = np.asarray([p[0], 1 - p[1]])
    w = np.asarray([0.25, 0.75]) * (1 - pt) ** 2
    bce = -np.log(pt)
    want = float(np.mean(w * bce))
    np.testing.assert_allclose(float(focal_loss(logits, targets)), want,
                               rtol=1e-5)


def test_mixed_class_nms_matches_reference_mask_math():
    """Parity with the reference's standalone vectorized NMS
    (`Util.py:519-553`): its removed set is the union of
      where(iou & same_class & (prob_i < prob_j))[0]   (rows)
      where(iou & same_class & ~(prob_i < prob_j))[1]  (cols)
    with the diagonal neutralized via fill_diagonal_(0.01).  We transcribe
    exactly that mask math in torch on random inputs and compare."""
    import torch
    from objectdetection_ssd_tpu.ops.boxes import (cxcywh_to_xyxy,
                                                   mixed_class_nms)

    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 40
        ctr = rng.uniform(0.2, 0.8, (n, 2))
        wh = rng.uniform(0.1, 0.5, (n, 2))
        boxes_cxcywh = np.concatenate([ctr, wh], 1).astype(np.float32)
        classes = rng.integers(0, 4, n)
        probs = rng.uniform(0, 1, n).astype(np.float32)
        thr = 0.3

        # --- reference mask math (Util.py:524-543), torch transcription ---
        t_xyxy = torch.tensor(np.asarray(
            cxcywh_to_xyxy(jnp.asarray(boxes_cxcywh))))
        lo = torch.max(t_xyxy[:, None, :2], t_xyxy[None, :, :2])
        hi = torch.min(t_xyxy[:, None, 2:], t_xyxy[None, :, 2:])
        inter = torch.clamp(hi - lo, min=0).prod(-1)
        area = ((t_xyxy[:, 2] - t_xyxy[:, 0])
                * (t_xyxy[:, 3] - t_xyxy[:, 1]))
        iou_val = inter / (area[:, None] + area[None, :] - inter)
        iou_val.fill_diagonal_(0.01)
        t_probs = torch.tensor(probs).view(1, n)
        t_cl = torch.tensor(classes.astype(np.float32)).view(1, n)
        iou = iou_val > thr
        same = (t_cl - t_cl.transpose(0, 1)) == 0
        iltj = ((t_probs.transpose(0, 1) - t_probs) < 0)
        removed = set(torch.where(iou & same & iltj)[0].tolist())
        removed |= set(torch.where(iou & same & ~iltj)[1].tolist())

        keep = np.asarray(mixed_class_nms(
            jnp.asarray(cxcywh_to_xyxy(jnp.asarray(boxes_cxcywh))),
            jnp.asarray(classes), jnp.asarray(probs), thr))
        got_removed = set(np.flatnonzero(~keep).tolist())
        assert got_removed == removed, f"trial {trial}"


def test_yxyx_converter_family():
    """Legacy yxyx twins (`Util.py:45-84, 354-368`): pure axis shuffles,
    mutually inverse, consistent with the primary converters."""
    import numpy as np
    from objectdetection_ssd_tpu.ops import boxes as B
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 1, (7, 4)).astype(np.float32)
    yx = np.asarray(B.xyxy_to_yxyx(xy))
    np.testing.assert_array_equal(yx, xy[:, (1, 0, 3, 2)])
    np.testing.assert_array_equal(np.asarray(B.yxyx_to_xyxy(yx)), xy)
    cxy = rng.uniform(0.2, 0.5, (5, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(B.cxcywh_to_yxyx(cxy)),
        np.asarray(B.xyxy_to_yxyx(B.cxcywh_to_xyxy(cxy))))
    np.testing.assert_allclose(
        np.asarray(B.yxyx_to_cxcywh(B.cxcywh_to_yxyx(cxy))), cxy,
        atol=1e-6)


def test_pairwise_iou_rescaled_matches_reference_math():
    """`get_jaccard_tensor` semantics (`Util.py:267-286`): raw-pixel GT
    rescaled into the 300-frame before IoU."""
    import numpy as np
    from objectdetection_ssd_tpu.ops import boxes as B
    raw = np.asarray([[0, 0, 200, 150], [100, 75, 400, 300]], np.float32)
    wh = np.asarray([400.0, 300.0])          # image is 400x300
    # rescaled to 300x300: [[0,0,150,150],[75,75,300,300]]
    other = np.asarray([[0, 0, 150, 150]], np.float32)
    iou = np.asarray(B.pairwise_iou_rescaled(raw, wh, other))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    inter = 75.0 * 75.0
    union = 150 * 150 + 225 * 225 - inter
    np.testing.assert_allclose(iou[1, 0], inter / union, rtol=1e-6)


def test_ssd_paper_scale():
    from objectdetection_ssd_tpu.ops.priors import ssd_paper_scale
    assert [ssd_paper_scale(k) for k in range(1, 7)] == [
        0.2, 0.34, 0.48, 0.62, 0.76, 0.9]
