"""Prior <-> ground-truth matching — batched, padded, jit-safe.

Reproduces the SSD matching semantics of the reference
(`Losses.py:150-171`, single-image variant `Util.py:333-352`):

  1. per-prior best object:  argmax over objects of the IoU matrix;
  2. per-object best prior override: each object force-claims its
     highest-IoU prior with overlap pinned to 1.0 (`Losses.py:164-167`);
     when two objects share a best prior the reference's in-place loop makes
     the LAST object (highest index) win — reproduced here deterministically;
  3. priors whose (possibly overridden) overlap is below the threshold are
     labeled background, class id 20 (`Losses.py:171`).

The reference iterates Python loops over the batch and relies on ragged GT
lists; here GT is padded to a fixed ``max_boxes`` with a validity mask so the
whole batch matches inside one jitted XLA computation (vmapped over images).
Padded/invalid objects get IoU forced to -1 so they can never win either
argmax.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.config import BACKGROUND_CLASS
from objectdetection_ssd_tpu.ops import boxes as box_ops


class MatchResult(NamedTuple):
    """Per-prior matching targets.

    Attributes:
      matched_class: (..., P) int32 — class id per prior, 20 = background.
      matched_box:   (..., P, 4) f32 — matched GT box, xyxy normalized.
      matched_iou:   (..., P) f32 — overlap used for the decision (1.0 where
        force-assigned).
      matched_obj:   (..., P) int32 — index of the matched GT row.
    """

    matched_class: jnp.ndarray
    matched_box: jnp.ndarray
    matched_iou: jnp.ndarray
    matched_obj: jnp.ndarray


def _iou_gt_priors(gt_boxes_xyxy: jnp.ndarray,
                   priors_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) x (P, 4) -> (M, P) IoU, coordinate-separated.

    TPU layout note: `pairwise_iou` builds (M, P, 2) intermediates whose
    trailing dim of 2 pads to the 128-lane tile (2/128 utilization).  Keeping
    every intermediate (M, P) with P minormost runs the vector units at full
    width — this is the matcher's hot tensor (B x M x P ~ 27M entries/step).
    """
    ax1, ay1, ax2, ay2 = (gt_boxes_xyxy[:, i:i + 1] for i in range(4))  # (M,1)
    bx1, by1, bx2, by2 = (priors_xyxy[None, :, i] for i in range(4))    # (1,P)
    ix = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    iy = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = ix * iy                                             # (M, P)
    area_a = (ax2 - ax1) * (ay2 - ay1)                          # (M, 1)
    area_b = (bx2 - bx1) * (by2 - by1)                          # (1, P)
    return inter / (area_a + area_b - inter)


def match_single(gt_boxes_xyxy: jnp.ndarray, gt_classes: jnp.ndarray,
                 gt_mask: jnp.ndarray, priors_xyxy: jnp.ndarray,
                 iou_threshold: float = 0.5) -> MatchResult:
    """Match one image's padded GT set against all priors.

    Args:
      gt_boxes_xyxy: (M, 4) normalized corner boxes; padded rows arbitrary.
      gt_classes: (M,) int32 class ids in [0, 20).
      gt_mask: (M,) bool — True for real objects.
      priors_xyxy: (P, 4) prior boxes in corner form.
      iou_threshold: background threshold (reference 0.5).
    """
    num_gt = gt_boxes_xyxy.shape[0]

    iou = _iou_gt_priors(gt_boxes_xyxy, priors_xyxy)            # (M, P)
    iou = jnp.where(gt_mask[:, None], iou, -1.0)

    # 1. per-prior best object (`Losses.py:153`).
    overlap_per_prior = jnp.max(iou, axis=0)                    # (P,)
    obj_per_prior = jnp.argmax(iou, axis=0)                     # (P,)

    # 2. per-object best prior (`Losses.py:157`) + forced override
    #    (`Losses.py:164-167`).  Build the (M, P) claim matrix and, per
    #    prior, take the HIGHEST-index claiming object (reference in-place
    #    assignment order).
    best_prior_per_obj = jnp.argmax(iou, axis=1)                # (M,)
    obj_ids = jnp.arange(num_gt, dtype=jnp.int32)
    claim = gt_mask[:, None] & (
        best_prior_per_obj[:, None] ==
        jnp.arange(priors_xyxy.shape[0])[None, :])              # (M, P)
    claimant = jnp.max(jnp.where(claim, obj_ids[:, None], -1), axis=0)  # (P,)
    forced = claimant >= 0
    obj_per_prior = jnp.where(forced, claimant, obj_per_prior)
    overlap_per_prior = jnp.where(forced, 1.0, overlap_per_prior)

    # 3. background where below threshold (`Losses.py:171`), and the matched
    # box/class per prior.  A (P,)-indexed gather from M rows is scalar-unit
    # work on TPU; the one-hot contraction below does the same select at
    # full lane width (class via masked reduce over M, box via a tiny
    # (P, M) @ (M, 4) einsum on the MXU).
    onehot_obj = (obj_per_prior[None, :] ==
                  jnp.arange(num_gt)[:, None])                  # (M, P)
    matched_class = jnp.max(
        jnp.where(onehot_obj, gt_classes[:, None].astype(jnp.int32),
                  jnp.int32(0)), axis=0)
    matched_class = jnp.where(
        overlap_per_prior < iou_threshold,
        jnp.int32(BACKGROUND_CLASS), matched_class)

    matched_box = jnp.einsum(
        "mp,mc->pc", onehot_obj.astype(gt_boxes_xyxy.dtype), gt_boxes_xyxy)
    return MatchResult(matched_class, matched_box, overlap_per_prior,
                       obj_per_prior.astype(jnp.int32))


def match_batch(gt_boxes_xyxy: jnp.ndarray, gt_classes: jnp.ndarray,
                gt_mask: jnp.ndarray, priors_xyxy: jnp.ndarray,
                iou_threshold: float = 0.5) -> MatchResult:
    """Batched matcher: (B, M, ...) GT against shared (P, 4) priors."""
    return jax.vmap(
        lambda b, c, m: match_single(b, c, m, priors_xyxy, iou_threshold)
    )(gt_boxes_xyxy, gt_classes, gt_mask)
