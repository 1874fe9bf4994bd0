"""Box geometry primitives — pure, fixed-shape jnp functions.

Coordinate frames (same conventions as the reference stack):
  * ``xyxy``   — corner boxes (x_min, y_min, x_max, y_max)
  * ``cxcywh`` — center boxes (cx, cy, w, h); the reference calls this "xywh"
  * ``gcxgcy`` — scaled regression offsets relative to a prior box

Reference behavior reproduced here:
  * converters `Util.py:57-96`
  * encode (`get_offsets_coords`, `Util.py:98-102`):
      g_cxcy = (cxcy - p_cxcy) / (p_wh / 10);  g_wh = log(wh / p_wh) * 5
  * decode (`gcxgcy_to_cxcy`, `Util.py:86-91`):
      cxcy = g_cxcy * p_wh / 10 + p_cxcy;      wh = exp(g_wh / 5) * p_wh
  * pairwise IoU (`find_intersection` + `get_jaccard_tensor1`,
    `Util.py:252-301`): clamp(min(hi) - max(lo), 0) product over x,y; IoU =
    inter / (area1 + area2 - inter).

Everything broadcasts over arbitrary leading batch dims and compiles to a
single fused XLA computation — no host round-trips (the reference's
`xyxy_to_xywh` bounces through CPU/numpy, `Util.py:57-63`).
"""

from __future__ import annotations

import jax.numpy as jnp

# Variance conventions, written the way the reference writes them
# (`Util.py:86-102`): divide centers by (p_wh / 10), scale log-sizes by 5.
CENTER_VARIANCE_INV = 10.0
SIZE_VARIANCE_INV = 5.0


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center boxes -> corner boxes (reference `Util.py:93-96`)."""
    xy = boxes[..., :2]
    half_wh = boxes[..., 2:] * 0.5
    return jnp.concatenate([xy - half_wh, xy + half_wh], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner boxes -> center boxes (reference `Util.py:57-63`)."""
    lo = boxes[..., :2]
    hi = boxes[..., 2:]
    return jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def encode(boxes_cxcywh: jnp.ndarray, priors_cxcywh: jnp.ndarray,
           *, center_variance_inv: float = CENTER_VARIANCE_INV,
           size_variance_inv: float = SIZE_VARIANCE_INV) -> jnp.ndarray:
    """Box -> regression offsets vs priors (reference `Util.py:98-102`)."""
    g_xy = (boxes_cxcywh[..., :2] - priors_cxcywh[..., :2]) / (
        priors_cxcywh[..., 2:] / center_variance_inv)
    g_wh = jnp.log(boxes_cxcywh[..., 2:] / priors_cxcywh[..., 2:]) * (
        size_variance_inv)
    return jnp.concatenate([g_xy, g_wh], axis=-1)


def decode(offsets: jnp.ndarray, priors_cxcywh: jnp.ndarray,
           *, center_variance_inv: float = CENTER_VARIANCE_INV,
           size_variance_inv: float = SIZE_VARIANCE_INV) -> jnp.ndarray:
    """Regression offsets -> cxcywh boxes (reference `Util.py:86-91`)."""
    xy = (offsets[..., :2] * priors_cxcywh[..., 2:] / center_variance_inv
          + priors_cxcywh[..., :2])
    wh = jnp.exp(offsets[..., 2:] / size_variance_inv) * priors_cxcywh[..., 2:]
    return jnp.concatenate([xy, wh], axis=-1)


def area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (...,) box areas; negative extents are NOT clamped
    (matches reference `Util.py:294-295`)."""
    wh = boxes_xyxy[..., 2:] - boxes_xyxy[..., :2]
    return wh[..., 0] * wh[..., 1]


def pairwise_intersection(a_xyxy: jnp.ndarray,
                          b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., n1, 4) x (..., n2, 4) -> (..., n1, n2) intersection areas
    (reference `find_intersection`, `Util.py:252-265`).

    Coordinate-separated: every intermediate is a full (..., n1, n2) plane
    with n2 minormost.  The stacked form builds (..., n1, n2, 2) tensors
    whose trailing dim of 2 tiles onto the TPU's 128 vector lanes at 2/128
    utilization — this shape sits inside both the NMS hot path
    ((B, 20, K, K) candidate IoU) and the matcher.
    """
    ax1, ay1, ax2, ay2 = (a_xyxy[..., :, None, i] for i in range(4))
    bx1, by1, bx2, by2 = (b_xyxy[..., None, :, i] for i in range(4))
    ix = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    iy = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    return ix * iy


def pairwise_iou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(..., n1, 4) x (..., n2, 4) -> (..., n1, n2) IoU
    (reference `get_jaccard_tensor1`, `Util.py:288-301`)."""
    inter = pairwise_intersection(a_xyxy, b_xyxy)
    union = area(a_xyxy)[..., :, None] + area(b_xyxy)[..., None, :] - inter
    return inter / union


def decode_tanh(pred: jnp.ndarray, priors_cxcywh: jnp.ndarray,
                grid_sizes: jnp.ndarray) -> jnp.ndarray:
    """fastai-style tanh-bounded activation -> box decode for the zoom/ratio
    anchor variant (reference `get_p_bbox_labels_za`, `Util.py:409-424`):

        xy = tanh(p)[..., :2] / 2 * grid_size + prior_xy
        wh = (tanh(p)[..., 2:] / 2 + 1) * prior_wh

    ``grid_sizes`` is the per-anchor cell-size vector produced alongside the
    189 zoom/ratio priors (`ops.priors.zoom_ratio_priors`, `Util.py:18,161`).
    Legacy decode kept for the ResNet-34 family's original head convention;
    the standard `decode` (gcxgcy) path is the default for both models.
    """
    t = jnp.tanh(pred)
    gs = grid_sizes[..., :, None]                            # (..., P, 1)
    xy = t[..., :2] / 2.0 * gs + priors_cxcywh[..., :2]
    wh = (t[..., 2:] / 2.0 + 1.0) * priors_cxcywh[..., 2:]
    return jnp.concatenate([xy, wh], axis=-1)


def mixed_class_nms(boxes_xyxy: jnp.ndarray, classes: jnp.ndarray,
                    probs: jnp.ndarray,
                    overlap_threshold: float = 0.5) -> jnp.ndarray:
    """Single-pass vectorized NMS over a MIXED-class detection set.

    Reproduces the suppression rule of the reference's standalone `nms`
    (`Util.py:519-553`, dead code there — never called by `inference`): a
    box is suppressed iff some OTHER box of the same class overlaps it with
    IoU > threshold and has greater-or-equal probability (ties suppress both
    sides, exactly as the reference's two `where` clauses do; the diagonal
    is excluded via its `fill_diagonal_(0.01)`).  Returns the KEEP mask —
    the reference then inverts this mask before drawing (`Util.py:546-548`),
    which is a bug in its notebook cruft, not a semantic we reproduce.

    Unlike greedy NMS this is one fused comparison, no sequential
    dependency: O(n^2) elementwise work, single XLA kernel.

    Args: boxes_xyxy (..., n, 4); classes (..., n) int; probs (..., n).
    Returns: (..., n) bool keep mask.
    """
    iou = pairwise_iou(boxes_xyxy, boxes_xyxy)
    n = boxes_xyxy.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    over = jnp.logical_and(iou > overlap_threshold, ~eye)
    same = classes[..., :, None] == classes[..., None, :]
    geq = probs[..., None, :] >= probs[..., :, None]   # prob_j >= prob_i
    removed = jnp.any(over & same & geq, axis=-1)
    return ~removed


# --- Legacy yxyx coordinate family (reference notebook cruft) ---------------
# The reference carries a parallel set of (y, x, y, x)-ordered converters
# used only by its fastai-era notebook cells, never by the train path
# (`Util.py:45-54, 65-84, 354-368`).  Reproduced for API completeness; all
# are pure axis shuffles over (..., 4) arrays.

def xyxy_to_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (y1, x1, y2, x2) (`Util.py:45-54`)."""
    return boxes[..., (1, 0, 3, 2)]


def yxyx_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(y1, x1, y2, x2) -> (x1, y1, x2, y2) (`Util.py:65-84`)."""
    return boxes[..., (1, 0, 3, 2)]


def cxcywh_to_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (y1, x1, y2, x2) corners
    (reference `xywh_to_yxyx`, `Util.py:87-96` — its "xywh" is
    center-based)."""
    return xyxy_to_yxyx(cxcywh_to_xyxy(boxes))


def yxyx_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(y1, x1, y2, x2) -> (cx, cy, w, h) (reference `get_xywh_from_yxyx`,
    `Util.py:354-368` — a per-row Python loop there; vectorized here)."""
    return xyxy_to_cxcywh(yxyx_to_xyxy(boxes))


def pairwise_iou_rescaled(raw_gt_xyxy: jnp.ndarray, image_wh: jnp.ndarray,
                          other_xyxy: jnp.ndarray,
                          target_size: float = 300.0) -> jnp.ndarray:
    """IoU of raw-PIXEL GT boxes against ``target_size``-frame boxes.

    The reference's `get_jaccard_tensor` (`Util.py:267-286`, notebook-only)
    rescales an image's absolute-pixel GT by the on-disk image size into the
    300x300 input frame before the IoU.  Functional equivalent (no global
    dataset state): pass the raw boxes and the (w, h) explicitly.
    """
    wh = jnp.asarray(image_wh, jnp.float32)
    scale = (target_size / jnp.concatenate([wh, wh], axis=-1))
    return pairwise_iou(raw_gt_xyxy * scale, other_xyxy)
