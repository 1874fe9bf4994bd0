"""Detection post-processing: decode -> softmax -> per-class threshold ->
per-class greedy NMS -> global top-k.  Entirely on-device, fixed shapes,
jit/vmap-friendly.

Reference behavior reproduced (`inference`, `Losses.py:11-98`):
  * decode all P offsets against the priors (`Losses.py:23`);
  * softmax over 21 classes (`Losses.py:25`);
  * per foreground class: keep scores >= 0.2 (`Losses.py:32-36`), sort
    descending (`Losses.py:38`), greedy NMS at IoU 0.45 where a box is
    suppressed iff an earlier *unsuppressed* box overlaps it >= threshold
    (`Losses.py:44-56`);
  * global top-200 across classes by score (`Losses.py:77-81`);
  * rescale to the original image size (`Losses.py:87-89`) — exposed here
    via `scale_detections`.

The reference does this with data-dependent shapes, a Python loop over
candidate boxes, and `.cpu()` pulls per class.  Here every stage is static:
each class takes its top-K (default 200) candidate slots, sub-threshold
slots carry score 0 with a validity mask (a mask replaces the gather), and
the sequential suppression dependency runs as a `lax.fori_loop` batched over
all 20 classes at once.  Empty results are expressed as `valid=False` rows
rather than ragged empties.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.config import NUM_CLASSES, PostprocessConfig
from objectdetection_ssd_tpu.ops import boxes as box_ops


class Detections(NamedTuple):
    """Fixed-size detection set for a batch of images.

    boxes_xyxy: (B, top_k, 4) in [0, 1] image-normalized corner coords.
    scores:     (B, top_k) softmax scores (0 where invalid).
    classes:    (B, top_k) int32 class ids in [0, 20) (0 where invalid).
    valid:      (B, top_k) bool.
    """

    boxes_xyxy: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


def greedy_nms_mask(iou: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float,
                    unrolled: bool = True) -> jnp.ndarray:
    """Greedy suppression over score-sorted candidates, batched.

    Args:
      iou: (..., K, K) pairwise IoU of candidates sorted by descending score.
      valid: (..., K) candidate validity (score >= threshold).
      iou_threshold: suppression threshold (reference 0.45).
      unrolled: unroll the K-step recurrence at trace time.  On TPU each
        `lax.fori_loop` iteration pays fixed while-loop overhead that
        dwarfs the tiny per-step vector work; unrolling turns the loop into
        one straight-line fused XLA region (~3x faster at K=128..200).

    Returns (..., K) keep mask.  A candidate is kept iff it is valid and no
    earlier kept candidate overlaps it >= threshold — the exact semantics of
    the reference's suppress-mask loop (`Losses.py:44-56`).
    """
    k = iou.shape[-1]
    suppress = jnp.zeros(iou.shape[:-1], dtype=bool)
    over = iou >= iou_threshold

    if unrolled:
        for i in range(k):
            row = over[..., i, :]
            prev = suppress[..., i]
            active = jnp.logical_and(jnp.logical_not(prev), valid[..., i])
            new = jnp.where(active[..., None],
                            jnp.logical_or(suppress, row), suppress)
            # A box never suppresses itself (`Losses.py:55`).
            suppress = new.at[..., i].set(prev)
        return jnp.logical_and(valid, jnp.logical_not(suppress))

    def body(i, suppress):
        row = jax.lax.dynamic_index_in_dim(
            over, i, axis=over.ndim - 2, keepdims=False)   # (..., K)
        prev = jax.lax.dynamic_index_in_dim(
            suppress, i, axis=suppress.ndim - 1, keepdims=False)  # (...,)
        active = jnp.logical_and(
            jnp.logical_not(prev),
            jax.lax.dynamic_index_in_dim(valid, i, axis=valid.ndim - 1,
                                         keepdims=False))
        new = jnp.where(active[..., None],
                        jnp.logical_or(suppress, row), suppress)
        new = jax.lax.dynamic_update_index_in_dim(
            new, prev, i, axis=suppress.ndim - 1)
        return new

    suppress = jax.lax.fori_loop(0, k, body, suppress)
    return jnp.logical_and(valid, jnp.logical_not(suppress))


def soft_nms_scores(iou: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, method: str = "soft_gaussian",
                    sigma: float = 0.5, iou_threshold: float = 0.45,
                    unrolled: bool = True) -> jnp.ndarray:
    """Soft-NMS (Bodla et al. 2017), fixed-shape and batched.

    The classic algorithm — iteratively pick the current-max-score
    candidate, then DECAY (not zero) the scores of its overlaps — expressed
    as exactly K data-independent rounds so it jits with static shapes:
    each round does a masked argmax, records the pick's current (decayed)
    score, and rescales the survivors by ``exp(-iou^2/sigma)``
    ("soft_gaussian") or ``1 - iou`` where ``iou >= iou_threshold``
    ("soft_linear", the paper's Nt).  Rounds after all positive-score
    candidates are picked are no-ops, which makes the fixed trip count
    equivalent to the data-dependent loop.

    Args match `greedy_nms_mask` plus ``scores`` (...,K), softmax scores
    in descending-sorted candidate order.  Returns the decayed score of
    every candidate at the moment it was picked (0 for never-picked /
    invalid); threshold the result to drop low-confidence survivors.
    """
    k = scores.shape[-1]

    def body(_, carry):
        work, alive, out = carry
        masked = jnp.where(alive, work, -1.0)
        i = jnp.argmax(masked, axis=-1)                    # (...,)
        s = jnp.max(masked, axis=-1)
        has = s > 0.0                                      # anything left?
        onehot = jax.nn.one_hot(i, k, dtype=jnp.bool_)
        pick = jnp.logical_and(onehot, has[..., None])
        out = jnp.where(pick, work, out)
        alive = jnp.logical_and(alive, jnp.logical_not(pick))
        row = jnp.take_along_axis(iou, i[..., None, None],
                                  axis=-2)[..., 0, :]      # (..., K)
        if method == "soft_gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        elif method == "soft_linear":
            decay = jnp.where(row >= iou_threshold, 1.0 - row, 1.0)
        else:
            raise ValueError(f"unknown soft-NMS method {method!r}")
        decay = jnp.where(has[..., None], decay, 1.0)      # no-op rounds
        work = jnp.where(alive, work * decay, work)
        return work, alive, out

    carry = (jnp.where(valid, scores, 0.0), valid,
             jnp.zeros_like(scores))
    if unrolled:
        for _ in range(k):
            carry = body(0, carry)
    else:
        carry = jax.lax.fori_loop(0, k, body, carry)
    return carry[2]


def _class_top_k(cls_scores: jnp.ndarray, k: int,
                 config: PostprocessConfig):
    """(B, 20, P) -> ((B, 20, K) scores sorted desc, (B, 20, K) indices).

    `approx_max_k` is the TPU-native top-k (aggregate-to-topk over lane
    bins) — substantially faster than the sort-based exact `top_k` on the
    (B*20, 8732) candidate matrix.  With threshold 0.2 and a trained model
    the true candidate count per class is tiny, so recall_target=0.95 over
    the top-K slots is lossless in practice; exact mode behind the flag.
    """
    if config.use_approx_top_k:
        scores, idx = jax.lax.approx_max_k(
            cls_scores, k, recall_target=config.approx_recall_target)
    else:
        scores, idx = jax.lax.top_k(cls_scores, k)
    return scores, idx


def postprocess(pred_offsets: jnp.ndarray, pred_logits: jnp.ndarray,
                priors_cxcywh: jnp.ndarray,
                config: PostprocessConfig = PostprocessConfig()) -> Detections:
    """Batched post-processing: (B, P, 4), (B, P, C) -> Detections.

    Safe to wrap in `jax.jit` together with the model forward so that image
    -> final boxes never leaves the device (BASELINE.json north star).
    """
    bs = pred_offsets.shape[0]
    k = min(config.per_class_top_k, pred_offsets.shape[1])

    logz = jax.nn.logsumexp(pred_logits.astype(jnp.float32), axis=-1)

    m = config.anchor_prefilter
    if config.use_approx_top_k and 0 < m < pred_logits.shape[1]:
        # Two-stage selection: the (B, 20, P) per-class ranking dominates
        # postprocess cost, but anchors that matter for ANY class are the
        # ones whose best foreground logit is high — so first keep the top-M
        # anchors by max-class score (one (B, P) top-k), then rank per class
        # among those M.
        max_fg = jnp.max(pred_logits[..., :NUM_CLASSES].astype(jnp.float32),
                         axis=-1) - logz                   # (B, P) log-score
        _, anchor_idx = jax.lax.approx_max_k(
            max_fg, m, recall_target=config.approx_recall_target)
        # gather first, THEN cast: avoids materializing an f32 copy of the
        # full (B, P, 21) logits just to keep M rows of it
        logits_m = jnp.take_along_axis(
            pred_logits, anchor_idx[..., None], axis=1).astype(jnp.float32)
        logz_m = jnp.take_along_axis(logz, anchor_idx, axis=1)
        # Decode only the M surviving anchors (offsets + their priors
        # gathered first): the exp/mul decode and corner conversion on the
        # full (B, P, 4) would write two dense arrays just to keep M rows.
        offsets_m = jnp.take_along_axis(pred_offsets, anchor_idx[..., None],
                                        axis=1)            # (B, M, 4)
        priors_m = priors_cxcywh[anchor_idx]               # (B, M, 4)
        decoded = box_ops.cxcywh_to_xyxy(
            box_ops.decode(offsets_m, priors_m))           # (B, M, 4)
        cls_scores = jnp.exp(
            jnp.swapaxes(logits_m, 1, 2)[:, :NUM_CLASSES]
            - logz_m[:, None, :])                          # (B, 20, M)
        top_scores, top_idx = jax.lax.top_k(cls_scores, k)
    else:
        decoded = box_ops.cxcywh_to_xyxy(
            box_ops.decode(pred_offsets, priors_cxcywh))   # (B, P, 4)
        # Single-stage: softmax scores built directly in the class-major
        # (B, 20, P) layout the top-k wants; bf16 halves the dominant HBM
        # traffic in approx mode (exact mode stays f32).
        score_dtype = (jnp.bfloat16 if config.use_approx_top_k
                       else jnp.float32)
        cls_scores = jnp.exp(
            jnp.swapaxes(pred_logits, 1, 2)[:, :NUM_CLASSES]
            .astype(jnp.float32) - logz[:, None, :]).astype(score_dtype)
        top_scores, top_idx = _class_top_k(cls_scores, k, config)
    top_scores = top_scores.astype(jnp.float32)
    cand_boxes = jnp.take_along_axis(
        decoded[:, None], top_idx[..., None], axis=2)      # (B, 20, K, 4)
    valid = top_scores >= config.score_threshold

    iou = box_ops.pairwise_iou(cand_boxes, cand_boxes)      # (B, 20, K, K)
    if config.nms_method == "hard":
        keep = greedy_nms_mask(iou, valid, config.nms_iou_threshold,
                               unrolled=config.nms_unrolled)
        kept_scores = jnp.where(keep, top_scores, 0.0)     # (B, 20, K)
    else:
        decayed = soft_nms_scores(iou, top_scores, valid,
                                  method=config.nms_method,
                                  sigma=config.soft_nms_sigma,
                                  iou_threshold=config.nms_iou_threshold,
                                  unrolled=config.nms_unrolled)
        # Soft-NMS keeps every candidate at its decayed score; the score
        # threshold then plays the paper's termination criterion.
        kept_scores = jnp.where(decayed >= config.score_threshold,
                                decayed, 0.0)
    flat_scores = kept_scores.reshape(bs, -1)              # (B, 20*K)
    flat_boxes = cand_boxes.reshape(bs, -1, 4)
    flat_classes = jnp.tile(
        jnp.repeat(jnp.arange(NUM_CLASSES, dtype=jnp.int32), k), (bs, 1))

    final_scores, final_idx = jax.lax.top_k(flat_scores, config.top_k)
    final_boxes = jnp.take_along_axis(flat_boxes, final_idx[..., None],
                                      axis=1)
    final_classes = jnp.take_along_axis(flat_classes, final_idx, axis=1)
    final_valid = final_scores > 0.0
    return Detections(final_boxes, final_scores,
                      jnp.where(final_valid, final_classes, 0), final_valid)


def scale_detections(dets: Detections, image_sizes_wh: jnp.ndarray
                     ) -> Detections:
    """Scale normalized boxes to pixel coords (reference `Losses.py:87-89`).

    image_sizes_wh: (B, 2) original (width, height) per image.
    """
    wh = image_sizes_wh.astype(dets.boxes_xyxy.dtype)
    scale = jnp.concatenate([wh, wh], axis=-1)[:, None, :]  # (B, 1, 4)
    return dets._replace(boxes_xyxy=dets.boxes_xyxy * scale)
