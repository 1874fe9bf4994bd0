"""Fused multibox loss — match + localization + classification with hard
negative mining in one jitted, fixed-shape computation.

Reference semantics reproduced (`Losses.py:119-199`):
  * localization: PLAIN L1 (the reference names it `smooth_l1` but
    instantiates `nn.L1Loss()`, `Losses.py:147`) between predicted offsets
    and encoded GT offsets, MEAN over the (N_pos, 4) gathered elements
    (`Losses.py:181-182`); huber available behind a flag.
  * classification: per-anchor cross entropy over 21 logits
    (`Losses.py:184`); positive CE plus hard-negative mining — zero the
    positives, sort each image's CE row descending, keep the top
    3 * N_pos(image) negatives (`Losses.py:188-195`); final
    c_loss = (sum HN + sum pos) / N_pos_total (`Losses.py:197`).

The reference computes matching with two Python loops over the batch and a
per-row `.sort` host sync per step (`Losses.py:152-167,191`); here the whole
thing is one XLA program: vmapped matching, masked reductions, and a batched
partial top-k (with an exact full-sort fallback guarded by lax.cond) for the
negative ranking — see `LossConfig.hnm_topk`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.config import (BACKGROUND_CLASS, LossConfig,
                                            NUM_CLASSES_WITH_BG)
from objectdetection_ssd_tpu.ops import boxes as box_ops
from objectdetection_ssd_tpu.ops import matching


class MultiboxLoss(NamedTuple):
    total: jnp.ndarray        # scalar: cls + loc (reference `train_function.py:84`)
    cls: jnp.ndarray          # scalar confidence loss
    loc: jnp.ndarray          # scalar localization loss
    num_pos: jnp.ndarray      # scalar int: total positive anchors in batch


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-anchor CE over the class axis; logits (..., C), labels (...)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(
        logits, labels[..., None], axis=-1).squeeze(-1)
    return logz - gold


def _cross_entropy_class_major(logits: jnp.ndarray, labels: jnp.ndarray
                               ) -> jnp.ndarray:
    """Per-anchor CE; logits (B, P, C), labels (B, P) -> (B, P).

    TPU layout: a (B, P, 21) tensor tiles its trailing class dim onto the
    128 vector lanes at 16% utilization, and the per-anchor label gather is
    scalar-unit work.  Transposing once to (B, C, P) puts the big P axis on
    the lanes; logsumexp reduces over the short sublane class axis and the
    gather becomes a one-hot masked reduce — every op full-width.
    """
    c = logits.shape[-1]
    lt = jnp.swapaxes(logits, 1, 2)                       # (B, C, P)
    logz = jax.nn.logsumexp(lt, axis=1)                   # (B, P)
    onehot = labels[:, None, :] == jnp.arange(c)[None, :, None]
    gold = jnp.sum(jnp.where(onehot, lt, 0.0), axis=1)    # (B, P)
    return logz - gold


def multibox_loss(pred_offsets: jnp.ndarray,
                  pred_logits: jnp.ndarray,
                  gt_boxes_xyxy: jnp.ndarray,
                  gt_classes: jnp.ndarray,
                  gt_mask: jnp.ndarray,
                  priors_cxcywh: jnp.ndarray,
                  config: LossConfig = LossConfig()) -> MultiboxLoss:
    """Compute the SSD multibox loss for a padded batch.

    Args:
      pred_offsets: (B, P, 4) predicted gcxgcy regression outputs.
      pred_logits:  (B, P, 21) class logits.
      gt_boxes_xyxy: (B, M, 4) normalized GT corner boxes (padded).
      gt_classes:   (B, M) int32 class ids.
      gt_mask:      (B, M) bool validity mask.
      priors_cxcywh: (P, 4) priors in center form.
    """
    assert pred_logits.shape[-1] == NUM_CLASSES_WITH_BG
    num_priors = pred_offsets.shape[1]

    priors_xyxy = box_ops.cxcywh_to_xyxy(priors_cxcywh)
    match = matching.match_batch(
        gt_boxes_xyxy, gt_classes, gt_mask, priors_xyxy,
        config.match_iou_threshold)

    pos = match.matched_class != BACKGROUND_CLASS          # (B, P)
    num_pos_per_image = jnp.sum(pos, axis=1)               # (B,)
    num_pos = jnp.sum(num_pos_per_image)
    pos_f = pos.astype(pred_offsets.dtype)

    # ---- localization (`Losses.py:181-182`) -------------------------------
    # Computed in coordinate-major (B, 4, P) layout: trailing-dim-4 tensors
    # tile 4/128 vector lanes, so the whole encode+L1 runs as four (B, P)
    # full-width planes instead.
    #
    # Negative priors' matched boxes can be degenerate zero-area pads (e.g.
    # an image whose objects were all filtered out), where the log() would
    # produce inf and inf * 0-mask = NaN.  Substitute the prior itself
    # (zero offsets) wherever the prior is background — those rows never
    # contribute to the masked sum.
    mb = jnp.swapaxes(match.matched_box, 1, 2)             # (B, 4, P)
    gx1, gy1, gx2, gy2 = mb[:, 0], mb[:, 1], mb[:, 2], mb[:, 3]
    pcx, pcy, pw, ph = (priors_cxcywh[None, :, i] for i in range(4))  # (1,P)
    cx = jnp.where(pos, (gx1 + gx2) * 0.5, pcx)
    cy = jnp.where(pos, (gy1 + gy2) * 0.5, pcy)
    w = jnp.where(pos, gx2 - gx1, pw)
    h = jnp.where(pos, gy2 - gy1, ph)
    cvar, svar = config.center_variance_inv, config.size_variance_inv
    target = jnp.stack([
        (cx - pcx) * cvar / pw,
        (cy - pcy) * cvar / ph,
        jnp.log(w / pw) * svar,
        jnp.log(h / ph) * svar,
    ], axis=1)                                             # (B, 4, P)
    diff = jnp.swapaxes(pred_offsets, 1, 2) - target
    if config.loc_loss == "huber":
        elt = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                        jnp.abs(diff) - 0.5)
    else:
        elt = jnp.abs(diff)
    # nn.L1Loss() means over the gathered (N_pos, 4) tensor -> sum / (4*N_pos)
    loc_sum = jnp.sum(elt * pos_f[:, None, :])
    safe_pos = jnp.maximum(num_pos, 1)
    loc_loss = loc_sum / (4.0 * safe_pos)

    # ---- classification with hard negative mining (`Losses.py:184-197`) ---
    cce = _cross_entropy_class_major(pred_logits, match.matched_class)
    pos_loss_sum = jnp.sum(cce * pos_f)

    neg_cce = jnp.where(pos, 0.0, cce)
    per_image_keep = config.neg_pos_ratio * num_pos_per_image  # (B,)

    def _hn_sum_full_sort(neg: jnp.ndarray) -> jnp.ndarray:
        """Exact reference ranking: full descending sort (`Losses.py:191`)."""
        neg_sorted = -jnp.sort(-neg, axis=1)
        rank = jnp.arange(num_priors)[None, :]
        keep = rank < per_image_keep[:, None]
        return jnp.sum(jnp.where(keep, neg_sorted, 0.0))

    kcap = int(config.hnm_topk)
    if 0 < kcap < num_priors:
        # Only the top 3*N_pos(image) negatives contribute; when every image
        # needs <= kcap of them (always, in practice: N_pos is tens, not
        # thousands), a partial top_k ranks just those candidates instead of
        # sorting all `num_priors`.  The lax.cond guard falls back to the
        # full sort otherwise, so the result is exact for ANY input — both
        # branches sum the same top-k multiset (CE >= 0, ties sum equally).
        def _hn_sum_topk(neg: jnp.ndarray) -> jnp.ndarray:
            vals, _ = jax.lax.top_k(neg, kcap)              # (B, kcap) desc
            rank = jnp.arange(kcap)[None, :]
            keep = rank < per_image_keep[:, None]
            return jnp.sum(jnp.where(keep, vals, 0.0))

        hn_loss_sum = jax.lax.cond(
            jnp.max(per_image_keep) <= kcap,
            _hn_sum_topk, _hn_sum_full_sort, neg_cce)
    else:
        hn_loss_sum = _hn_sum_full_sort(neg_cce)

    cls_loss = (hn_loss_sum + pos_loss_sum) / safe_pos

    total = cls_loss + loc_loss
    return MultiboxLoss(total=total, cls=cls_loss, loc=loc_loss,
                        num_pos=num_pos)


def multibox_loss_single(pred_offsets: jnp.ndarray,
                         pred_logits: jnp.ndarray,
                         gt_boxes_xyxy: jnp.ndarray,
                         gt_classes: jnp.ndarray,
                         priors_cxcywh: jnp.ndarray,
                         config: LossConfig = LossConfig()) -> MultiboxLoss:
    """Single-image multibox loss (the reference's legacy per-image path,
    `ssd1`/`ssd_old`, `Losses.py:100-117,201-225`).

    Thin wrapper over the batched loss with a batch of one and a full
    validity mask; identical math.  Inputs: (P, 4), (P, 21), (n, 4), (n,).
    """
    return multibox_loss(
        pred_offsets[None], pred_logits[None], gt_boxes_xyxy[None],
        gt_classes[None], jnp.ones((1, gt_boxes_xyxy.shape[0]), bool),
        priors_cxcywh, config)


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal loss (reference `Focal_Loss`, `Losses.py:228-242`).

    The reference defines but never uses this; provided for API parity.
    ``targets`` is a {0,1} tensor shaped like ``logits``; the focal weight is
    treated as a constant (detached) multiplier of BCE-with-logits, exactly
    as the reference's `w.detach()` does.
    """
    p = jax.nn.sigmoid(logits)
    pt = p * targets + (1 - p) * (1 - targets)
    w = alpha * targets + (1 - alpha) * (1 - targets)
    w = jax.lax.stop_gradient(w * (1 - pt) ** gamma)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(w * bce)
