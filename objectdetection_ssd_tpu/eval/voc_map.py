"""VOC mAP evaluation: 11-point interpolated AP at IoU 0.5, per-class report.

Reference semantics reproduced (`get_map`, `Util.py:783-885`):
  * detections pooled across images per class, sorted by descending score
    (`Util.py:828-830`);
  * each detection greedily matched to the best-IoU ground truth OF ITS
    CLASS in its image; TP iff IoU > 0.5 (strict) AND that GT is unclaimed;
    claiming marks the GT used (`Util.py:835-868`);
  * cumulative precision/recall; AP = mean over the 11-point recall grid
    0:0.1:1 of the max precision at recall >= r, 0 where unreachable
    (`Util.py:870-882`);
  * difficult GT are expected to be dropped upstream, as the reference's
    dataset does (`Dataset.py:29-31`); standard-VOC "ignore difficult"
    matching is available via ``difficulties`` for completeness.

Host-side numpy (evaluation is not a device hot path); the per-class inner
loop is vectorized down to the sequential greedy claim, which is inherently
order-dependent.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from objectdetection_ssd_tpu.config import NUM_CLASSES, VOC_CLASSES


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo = np.maximum(a[:, None, :2], b[None, :, :2])
    hi = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(hi - lo, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + ab[None, :] - inter)


def eleven_point_ap(cum_precision: np.ndarray,
                    cum_recall: np.ndarray) -> float:
    """11-point interpolated AP (`Util.py:870-882`)."""
    ap = 0.0
    for rec in np.arange(0.0, 1.1, 0.1):
        mask = cum_recall >= rec
        ap += float(cum_precision[mask].max()) if mask.any() else 0.0
    return ap / 11.0


def voc_map(det_boxes: Sequence[np.ndarray],
            det_classes: Sequence[np.ndarray],
            det_scores: Sequence[np.ndarray],
            gt_boxes: Sequence[np.ndarray],
            gt_classes: Sequence[np.ndarray],
            difficulties: Optional[Sequence[np.ndarray]] = None,
            iou_threshold: float = 0.5
            ) -> Tuple[Dict[str, float], float]:
    """Compute per-class AP and mAP over per-image detection/GT lists.

    Args:
      det_boxes[i]: (n_i, 4) xyxy detections for image i (any scale, must
        match gt scale).
      det_classes[i], det_scores[i]: (n_i,) class ids / scores.
      gt_boxes[i], gt_classes[i]: ground truth for image i.
      difficulties: optional per-image bool arrays; when given, difficult GT
        are ignored (neither claimable-as-TP-counted nor penalized) per
        standard VOC.  The reference instead drops difficult GT upstream —
        pass pre-filtered GT and leave this None for reference parity.

    Returns: ({class_name: AP}, mAP).
    """
    n_images = len(det_boxes)
    aps: Dict[str, float] = {}

    for cls in range(NUM_CLASSES):
        # Gather this class's GT per image + claim bookkeeping.
        gt_per_image: List[np.ndarray] = []
        ignore_per_image: List[np.ndarray] = []
        n_positive = 0
        for i in range(n_images):
            sel = np.asarray(gt_classes[i]) == cls
            g = np.asarray(gt_boxes[i], np.float32).reshape(-1, 4)[sel]
            gt_per_image.append(g)
            if difficulties is not None:
                ign = np.asarray(difficulties[i], bool)[sel]
            else:
                ign = np.zeros(len(g), bool)
            ignore_per_image.append(ign)
            n_positive += int((~ign).sum())
        claimed = [np.zeros(len(g), bool) for g in gt_per_image]

        # Pool + sort this class's detections.
        rows = []
        for i in range(n_images):
            sel = np.asarray(det_classes[i]) == cls
            b = np.asarray(det_boxes[i], np.float32).reshape(-1, 4)[sel]
            s = np.asarray(det_scores[i], np.float32).reshape(-1)[sel]
            for j in range(len(b)):
                rows.append((i, s[j], b[j]))
        if not rows:
            aps[VOC_CLASSES[cls]] = 0.0
            continue
        rows.sort(key=lambda r: -r[1])

        tp = np.zeros(len(rows), np.float64)
        fp = np.zeros(len(rows), np.float64)
        for d, (img, _score, box) in enumerate(rows):
            g = gt_per_image[img]
            if len(g) == 0:
                fp[d] = 1.0
                continue
            iou = _iou_matrix(box[None], g)[0]
            best = int(iou.argmax())
            if iou[best] > iou_threshold:
                if ignore_per_image[img][best]:
                    continue                      # ignored GT: no TP, no FP
                if not claimed[img][best]:
                    tp[d] = 1.0
                    claimed[img][best] = True
                else:
                    fp[d] = 1.0
            else:
                fp[d] = 1.0

        cum_tp = tp.cumsum()
        cum_fp = fp.cumsum()
        cum_precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
        cum_recall = cum_tp / max(n_positive, 1)
        aps[VOC_CLASSES[cls]] = eleven_point_ap(cum_precision, cum_recall)

    mean_ap = float(np.mean(list(aps.values())))
    return aps, mean_ap
