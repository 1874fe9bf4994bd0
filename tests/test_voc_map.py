"""Golden tests for the VOC 11-point mAP evaluator on crafted det/GT sets
(reference semantics: `Util.py:783-885`)."""

import numpy as np

from objectdetection_ssd_tpu.config import VOC_CLASSES
from objectdetection_ssd_tpu.eval.voc_map import eleven_point_ap, voc_map


def _img(dets=None, gts=None):
    dets = dets or []
    gts = gts or []
    db = np.asarray([d[0] for d in dets], np.float32).reshape(-1, 4)
    dc = np.asarray([d[1] for d in dets], np.int32)
    ds = np.asarray([d[2] for d in dets], np.float32)
    gb = np.asarray([g[0] for g in gts], np.float32).reshape(-1, 4)
    gc = np.asarray([g[1] for g in gts], np.int32)
    return db, dc, ds, gb, gc


def _run(images, **kw):
    cols = list(zip(*images))
    return voc_map(cols[0], cols[1], cols[2], cols[3], cols[4], **kw)


BOX = [10, 10, 50, 50]
BOX_FAR = [100, 100, 140, 140]


def test_perfect_detection_ap1():
    aps, _ = _run([_img(dets=[(BOX, 0, 0.9)], gts=[(BOX, 0)])])
    assert aps[VOC_CLASSES[0]] == 1.0


def test_missed_gt_halves_recall():
    # 1 det matches 1 of 2 GT: precision 1.0 up to recall 0.5, 0 beyond.
    aps, _ = _run([_img(dets=[(BOX, 0, 0.9)],
                        gts=[(BOX, 0), (BOX_FAR, 0)])])
    # 11-pt: recalls 0,0.1,...,0.5 reachable (6 points at precision 1).
    np.testing.assert_allclose(aps[VOC_CLASSES[0]], 6 / 11)


def test_duplicate_detection_is_fp():
    # Two dets on the same GT: higher-score one claims it, second is FP.
    aps, _ = _run([_img(dets=[(BOX, 0, 0.9), (BOX, 0, 0.8)],
                        gts=[(BOX, 0)])])
    # recall hits 1.0 at det 1 with precision 1.0; 11pt max-precision at
    # every recall level is 1.0 -> AP 1.0 (interpolated metric forgives the
    # trailing FP).
    np.testing.assert_allclose(aps[VOC_CLASSES[0]], 1.0)


def test_fp_before_tp_lowers_precision():
    # Higher-scored FP in empty region, then TP.
    aps, _ = _run([_img(dets=[(BOX_FAR, 0, 0.95), (BOX, 0, 0.9)],
                        gts=[(BOX, 0)])])
    # cum precision: [0, 0.5]; cum recall: [0, 1.0].
    # 11pt: max precision at recall>=0 .. >=1.0 is 0.5 everywhere.
    np.testing.assert_allclose(aps[VOC_CLASSES[0]], 0.5)


def test_iou_exactly_half_is_fp():
    # Strict '>' threshold (Util.py:858).
    gt = [0, 0, 100, 100]
    det = [0, 0, 100, 50]  # IoU = 0.5 exactly
    aps, _ = _run([_img(dets=[(det, 0, 0.9)], gts=[(gt, 0)])])
    assert aps[VOC_CLASSES[0]] == 0.0


def test_wrong_class_never_matches():
    aps, _ = _run([_img(dets=[(BOX, 1, 0.9)], gts=[(BOX, 0)])])
    assert aps[VOC_CLASSES[0]] == 0.0
    assert aps[VOC_CLASSES[1]] == 0.0   # class-1 det is FP (no class-1 GT)


def test_cross_image_pooling():
    # Same class across two images; scores interleave image order.
    imgs = [
        _img(dets=[(BOX, 2, 0.9)], gts=[(BOX, 2)]),
        _img(dets=[(BOX, 2, 0.95), (BOX_FAR, 2, 0.5)], gts=[(BOX, 2)]),
    ]
    aps, mean_ap = _run(imgs)
    # dets sorted: 0.95 TP, 0.9 TP, 0.5 FP -> all recall levels at P=1.
    np.testing.assert_allclose(aps[VOC_CLASSES[2]], 1.0)
    np.testing.assert_allclose(mean_ap, 1.0 / 20)


def test_difficult_gt_ignored_mode():
    db, dc, ds, gb, gc = _img(dets=[(BOX, 0, 0.9)],
                              gts=[(BOX, 0), (BOX_FAR, 0)])
    diffs = [np.asarray([False, True])]
    aps, _ = voc_map([db], [dc], [ds], [gb], [gc], difficulties=diffs)
    # difficult far GT not counted as positive -> full recall with 1 det.
    np.testing.assert_allclose(aps[VOC_CLASSES[0]], 1.0)


def test_eleven_point_ap_golden():
    # precision [1, .5, .67], recall [.5, .5, 1.0]
    p = np.asarray([1.0, 0.5, 2 / 3])
    r = np.asarray([0.5, 0.5, 1.0])
    # recalls 0-0.5 -> max precision 1.0 (6 pts); 0.6-1.0 -> 2/3 (5 pts)
    want = (6 * 1.0 + 5 * 2 / 3) / 11
    np.testing.assert_allclose(eleven_point_ap(p, r), want)


def test_empty_detections():
    aps, mean_ap = _run([_img(dets=[], gts=[(BOX, 0)])])
    assert aps[VOC_CLASSES[0]] == 0.0
    assert mean_ap == 0.0


def test_return_curves_golden():
    """return_curves exposes the cumulative PR arrays the AP integrates:
    1 TP det against 2 GT -> precision [1.0], recall [0.5]; classes with
    no detections get empty arrays."""
    db, dc, ds, gb, gc = _img(dets=[(BOX, 0, 0.9)],
                              gts=[(BOX, 0), (BOX_FAR, 0)])
    aps, mean_ap, curves = voc_map([db], [dc], [ds], [gb], [gc],
                                   return_curves=True)
    c0 = curves[VOC_CLASSES[0]]
    np.testing.assert_allclose(c0["scores"], [0.9])
    np.testing.assert_allclose(c0["precision"], [1.0])
    np.testing.assert_allclose(c0["recall"], [0.5])
    assert len(curves) == len(VOC_CLASSES)
    assert curves[VOC_CLASSES[1]]["scores"].size == 0
    # AP/mAP identical to the non-curves call
    aps2, mean2 = voc_map([db], [dc], [ds], [gb], [gc])
    assert aps == aps2 and mean_ap == mean2
    # Descending-score ordering with a second, lower-score FP det.
    db, dc, ds, gb, gc = _img(dets=[(BOX_FAR, 0, 0.4), (BOX, 0, 0.9)],
                              gts=[(BOX, 0)])
    _, _, curves = voc_map([db], [dc], [ds], [gb], [gc],
                           return_curves=True)
    c0 = curves[VOC_CLASSES[0]]
    np.testing.assert_allclose(c0["scores"], [0.9, 0.4])
    np.testing.assert_allclose(c0["precision"], [1.0, 0.5])
    np.testing.assert_allclose(c0["recall"], [1.0, 1.0])


def test_voc_map_sweep_hand_case():
    """A detection with IoU exactly 0.6 against its GT is a TP at
    thresholds < 0.6 (strict >) and an FP at 0.6+: the 0.50/0.55 rungs
    score mAP 1/20 (one perfect class of 20), the other eight rungs 0, so
    mAP@[.5:.95] = 2/10 * 1/20."""
    from objectdetection_ssd_tpu.eval.voc_map import voc_map_sweep
    gt = [0.0, 0.0, 100.0, 100.0]
    det = [0.0, 0.0, 100.0, 60.0]              # IoU = 60/100 = 0.6
    db, dc, ds, gb, gc = _img(dets=[(det, 0, 0.9)], gts=[(gt, 0)])
    per_thr, mean = voc_map_sweep([db], [dc], [ds], [gb], [gc])
    assert set(per_thr) == {0.5, 0.55, 0.6, 0.65, 0.7,
                            0.75, 0.8, 0.85, 0.9, 0.95}
    np.testing.assert_allclose(per_thr[0.5], 1 / 20)
    np.testing.assert_allclose(per_thr[0.55], 1 / 20)
    for thr in (0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95):
        assert per_thr[thr] == 0.0
    np.testing.assert_allclose(mean, 2 / 10 * 1 / 20)


def test_voc_map_sweep_matches_single_threshold():
    """sweep[thr] must equal a direct voc_map call at that threshold on a
    randomized multi-image, multi-class workload."""
    from objectdetection_ssd_tpu.eval.voc_map import voc_map_sweep
    rng = np.random.default_rng(7)
    images = []
    for _ in range(6):
        dets, gts = [], []
        for _ in range(rng.integers(1, 6)):
            lo = rng.uniform(0, 60, 2)
            wh = rng.uniform(10, 40, 2)
            gts.append(([lo[0], lo[1], lo[0] + wh[0], lo[1] + wh[1]],
                        int(rng.integers(0, 5))))
        for (box, cls) in gts:
            jit = rng.uniform(-8, 8, 4)
            dets.append(([box[0] + jit[0], box[1] + jit[1],
                          box[2] + jit[2], box[3] + jit[3]],
                         cls, float(rng.uniform(0.2, 1.0))))
        images.append(_img(dets=dets, gts=gts))
    cols = list(zip(*images))
    per_thr, mean = voc_map_sweep(cols[0], cols[1], cols[2],
                                  cols[3], cols[4])
    for thr in (0.5, 0.75, 0.95):
        _, direct = voc_map(cols[0], cols[1], cols[2], cols[3], cols[4],
                            iou_threshold=thr)
        np.testing.assert_allclose(per_thr[thr], direct)
    np.testing.assert_allclose(
        mean, np.mean(list(per_thr.values())))
