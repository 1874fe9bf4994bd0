"""Full-stack learnability test: train a small detector on a class-color-
coded synthetic VOC fixture and verify detection mAP rises well above the
untrained baseline — exercising data, loss/matching, optimizer, postprocess,
and the mAP evaluator together as one system."""

import dataclasses
import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.config import (DataConfig, LossConfig,
                                            OptimConfig, PostprocessConfig)
from objectdetection_ssd_tpu.data import synthetic, voc
from objectdetection_ssd_tpu.data.pipeline import Loader
from objectdetection_ssd_tpu.eval.voc_map import voc_map
from objectdetection_ssd_tpu.infer.postprocess import postprocess
from objectdetection_ssd_tpu.train import loop as loop_lib
from objectdetection_ssd_tpu.train.state import create_train_state

IMG = 64
GRID = 8
NUM_FIXTURE_CLASSES = 4


class SmallDet(nn.Module):
    """Detector at an 8x8 grid with 2 anchors per cell (P=128)."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME")(x)   # 32
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME")(x)   # 16
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME")(x)   # 8
        x = nn.relu(x)
        loc = nn.Conv(2 * 4, (3, 3), padding="SAME")(x)
        conf = nn.Conv(2 * 21, (3, 3), padding="SAME")(x)
        return (loc.reshape(x.shape[0], -1, 4),
                conf.reshape(x.shape[0], -1, 21))


def _priors():
    centers = (np.arange(GRID) + 0.5) / GRID
    cy, cx = np.meshgrid(centers, centers, indexing="ij")
    cells = np.stack([cx.ravel(), cy.ravel()], 1)            # (64, 2)
    pri = []
    for (w, h) in [(0.3, 0.3), (0.6, 0.6)]:
        pri.append(np.concatenate(
            [cells, np.tile([[w, h]], (len(cells), 1))], 1))
    # interleave per cell to match head channel layout (k inner)
    pri = np.stack(pri, axis=1).reshape(-1, 4)
    return jnp.asarray(pri, jnp.float32)


def _map_for(state, loader, priors, pp_cfg):
    det_b, det_c, det_s, gt_b, gt_c = [], [], [], [], []
    from objectdetection_ssd_tpu.models.ssd import prepare_input
    for batch in loader.epoch(0):
        # Loader ships raw uint8 by default; custom modules normalize at
        # the boundary like train/loop._forward does.
        images = prepare_input(jnp.asarray(batch["images"]), jnp.float32)
        loc, conf = state.apply_fn({"params": state.params},
                                   images, train=False)
        dets = postprocess(loc, conf, priors, pp_cfg)
        for i in range(batch["images"].shape[0]):
            valid = np.asarray(dets.valid[i])
            det_b.append(np.asarray(dets.boxes_xyxy[i])[valid])
            det_c.append(np.asarray(dets.classes[i])[valid])
            det_s.append(np.asarray(dets.scores[i])[valid])
            m = batch["mask"][i]
            gt_b.append(batch["boxes"][i][m])
            gt_c.append(batch["classes"][i][m])
    _, mean_ap = voc_map(det_b, det_c, det_s, gt_b, gt_c)
    # normalize by the fraction of classes present in the fixture (voc_map
    # averages over all 20)
    return mean_ap * 20 / NUM_FIXTURE_CLASSES


@pytest.mark.slow
def test_detector_learns_synthetic_task(tmp_path):
    synthetic.generate_voc(str(tmp_path), num_2007=40, num_2012=8,
                           image_size=(96, 96), max_objects=2, seed=3,
                           difficult_fraction=0.0,
                           num_classes=NUM_FIXTURE_CLASSES,
                           class_color_coding=True)
    records = voc.load_records(str(tmp_path), train=True)
    cfg = DataConfig(batch_size=16, num_workers=0, max_boxes=4,
                     augment=False)
    loader = Loader(records, cfg, image_size=IMG, train=True, seed=0)
    eval_loader = Loader(records, cfg, image_size=IMG, train=False)

    priors = _priors()
    model = SmallDet()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
        OptimConfig(lr=0.01, use_lr_schedule=False))
    loss_cfg = LossConfig(match_iou_threshold=0.4)
    step_fn, _ = loop_lib.make_jitted_steps(priors, loss_cfg, mesh=None,
                                            donate=False)
    pp_cfg = PostprocessConfig(per_class_top_k=32, top_k=10,
                               score_threshold=0.3, use_approx_top_k=False)

    map_before = _map_for(state, eval_loader, priors, pp_cfg)

    for epoch in range(100):
        for batch in loader.epoch(epoch):
            batch = {k: v for k, v in batch.items() if k != "image_ids"}
            state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    map_after = _map_for(state, eval_loader, priors, pp_cfg)
    assert map_after > 0.6, (map_before, map_after)
    assert map_after > map_before + 0.4


class SmallDetQ(nn.Module):
    """SmallDet built from TorchConv so the int8-PTQ hooks apply; heads
    named loc_head/conf_head so the default exclusion policy covers them."""

    @nn.compact
    def __call__(self, x, train=False):
        from objectdetection_ssd_tpu.models.layers import TorchConv
        x = nn.relu(TorchConv(32, kernel=3, stride=2, padding=1,
                              name="c1")(x))                         # 32
        x = nn.relu(TorchConv(64, kernel=3, stride=2, padding=1,
                              name="c2")(x))                         # 16
        x = nn.relu(TorchConv(64, kernel=3, stride=2, padding=1,
                              name="c3")(x))                         # 8
        loc = TorchConv(2 * 4, kernel=3, padding=1, name="loc_head")(x)
        conf = TorchConv(2 * 21, kernel=3, padding=1, name="conf_head")(x)
        return (loc.reshape(x.shape[0], -1, 4),
                conf.reshape(x.shape[0], -1, 21))


def _map_variant(model, params, loader, priors, pp_cfg, quant=None):
    """mAP through the REAL variant plumbing: forward_for_postprocess
    (TTA included via pp_cfg) + the quant collection when given."""
    from objectdetection_ssd_tpu.infer.detector import forward_for_postprocess
    from objectdetection_ssd_tpu.models.ssd import prepare_input

    @jax.jit
    def infer(params, images):
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        loc, conf, pri = forward_for_postprocess(
            model, variables, prepare_input(images, jnp.float32),
            priors, pp_cfg)
        return postprocess(loc, conf, pri, pp_cfg)

    det_b, det_c, det_s, gt_b, gt_c = [], [], [], [], []
    for batch in loader.epoch(0):
        dets = jax.device_get(infer(params, jnp.asarray(batch["images"])))
        for i in range(batch["images"].shape[0]):
            valid = dets.valid[i]
            det_b.append(dets.boxes_xyxy[i][valid])
            det_c.append(dets.classes[i][valid])
            det_s.append(dets.scores[i][valid])
            m = batch["mask"][i]
            gt_b.append(batch["boxes"][i][m])
            gt_c.append(batch["classes"][i][m])
    _, mean_ap = voc_map(det_b, det_c, det_s, gt_b, gt_c)
    return mean_ap * 20 / NUM_FIXTURE_CLASSES


@pytest.mark.slow
def test_inference_variants_preserve_trained_map(tmp_path):
    """Trained-model value check for the opt-in inference variants: int8
    PTQ, TTA-flip, and Soft-NMS must all score within a small margin of
    the f32/hard-NMS baseline on a detector trained to high mAP (the
    variants' accuracy claims, pinned in CI rather than asserted in
    docs; hardware-scale numbers in benchmarks/quality_ab.py)."""
    from objectdetection_ssd_tpu.infer import quant as quant_lib
    from objectdetection_ssd_tpu.models.ssd import prepare_input

    synthetic.generate_voc(str(tmp_path), num_2007=40, num_2012=8,
                           image_size=(96, 96), max_objects=2, seed=5,
                           difficult_fraction=0.0,
                           num_classes=NUM_FIXTURE_CLASSES,
                           class_color_coding=True)
    records = voc.load_records(str(tmp_path), train=True)
    cfg = DataConfig(batch_size=16, num_workers=0, max_boxes=4,
                     augment=False)
    loader = Loader(records, cfg, image_size=IMG, train=True, seed=0)
    eval_loader = Loader(records, cfg, image_size=IMG, train=False)

    priors = _priors()
    model = SmallDetQ()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
        OptimConfig(lr=0.01, use_lr_schedule=False))
    loss_cfg = LossConfig(match_iou_threshold=0.4)
    step_fn, _ = loop_lib.make_jitted_steps(priors, loss_cfg, mesh=None,
                                            donate=False)
    # Train WITH random flips (the reference's own augmentation regime):
    # TTA's premise is a flip-robust model — on a flip-NAIVE toy the
    # mirrored view alone scores 0.59 vs 0.95 direct and any TTA merge
    # dilutes (measured; benchmarks/RESULTS.md "TTA flip").
    rng = np.random.default_rng(1)
    for epoch in range(100):
        for batch in loader.epoch(epoch):
            batch = {k: v for k, v in batch.items() if k != "image_ids"}
            if rng.random() < 0.5:
                boxes = batch["boxes"].copy()
                boxes[..., 0] = 1.0 - batch["boxes"][..., 2]
                boxes[..., 2] = 1.0 - batch["boxes"][..., 0]
                batch = dict(batch, boxes=boxes,
                             images=batch["images"][:, :, ::-1, :].copy())
            state, metrics = step_fn(state, batch)

    pp = PostprocessConfig(per_class_top_k=32, top_k=10,
                           score_threshold=0.3, use_approx_top_k=False)
    base = _map_variant(model, state.params, eval_loader, priors, pp)
    assert base > 0.6, base

    # int8 PTQ: calibrate on the (normalized) train images themselves.
    batches = [np.asarray(prepare_input(jnp.asarray(b["images"]),
                                        jnp.float32))
               for b in eval_loader.epoch(0)]
    qtree = quant_lib.act_scales(
        quant_lib.calibrate(model, state.params, batches))
    assert quant_lib.count_quantized(qtree) == 3       # heads excluded
    m_int8 = _map_variant(model, state.params, eval_loader, priors, pp,
                          quant=jax.tree_util.tree_map(jnp.asarray, qtree))
    assert m_int8 > base - 0.03, (base, m_int8)

    # Flip-averaged TTA must IMPROVE (or at worst match) the flip-trained
    # model — measured +0.018 mAP on this fixture (RESULTS.md "TTA flip").
    m_tta = _map_variant(model, state.params, eval_loader, priors,
                         dataclasses.replace(pp, tta_flip=True))
    assert m_tta > base - 0.005, (base, m_tta)

    m_soft = _map_variant(model, state.params, eval_loader, priors,
                          dataclasses.replace(pp,
                                              nms_method="soft_gaussian"))
    assert m_soft > base - 0.05, (base, m_soft)
    print(json.dumps({"base": base, "int8": m_int8, "tta": m_tta,
                      "soft_nms": m_soft}))


@pytest.mark.slow
def test_qat_recovers_int8_accuracy(tmp_path):
    """Quantization-aware fine-tuning must close the PTQ accuracy gap:
    train f32, quantize EVERYTHING (heads included, the harsher setting),
    then fine-tune through the fake-quant path with the SAME scales — the
    served int8 mAP must recover to ~the f32 baseline."""
    from objectdetection_ssd_tpu.infer import quant as quant_lib
    from objectdetection_ssd_tpu.models.ssd import prepare_input

    synthetic.generate_voc(str(tmp_path), num_2007=40, num_2012=8,
                           image_size=(96, 96), max_objects=2, seed=9,
                           difficult_fraction=0.0,
                           num_classes=NUM_FIXTURE_CLASSES,
                           class_color_coding=True)
    records = voc.load_records(str(tmp_path), train=True)
    cfg = DataConfig(batch_size=16, num_workers=0, max_boxes=4,
                     augment=False)
    loader = Loader(records, cfg, image_size=IMG, train=True, seed=0)
    eval_loader = Loader(records, cfg, image_size=IMG, train=False)

    priors = _priors()
    model = SmallDetQ()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)),
        OptimConfig(lr=0.01, use_lr_schedule=False))
    loss_cfg = LossConfig(match_iou_threshold=0.4)
    step_fn, _ = loop_lib.make_jitted_steps(priors, loss_cfg, mesh=None,
                                            donate=False)
    for epoch in range(70):
        for batch in loader.epoch(epoch):
            batch = {k: v for k, v in batch.items() if k != "image_ids"}
            state, _ = step_fn(state, batch)

    pp = PostprocessConfig(per_class_top_k=32, top_k=10,
                           score_threshold=0.3, use_approx_top_k=False)
    base = _map_variant(model, state.params, eval_loader, priors, pp)
    assert base > 0.6, base

    batches = [np.asarray(prepare_input(jnp.asarray(b["images"]),
                                        jnp.float32))
               for b in eval_loader.epoch(0)]
    qtree = jax.tree_util.tree_map(jnp.asarray, quant_lib.act_scales(
        quant_lib.calibrate(model, state.params, batches),
        quantize_heads=True))
    m_before = _map_variant(model, state.params, eval_loader, priors, pp,
                            quant=qtree)

    # QAT fine-tune with the SAME scales (train/loop.py quant_ste path).
    qat_step, _ = loop_lib.make_jitted_steps(priors, loss_cfg, mesh=None,
                                             donate=False, quant_ste=qtree)
    for epoch in range(30):
        for batch in loader.epoch(100 + epoch):
            batch = {k: v for k, v in batch.items() if k != "image_ids"}
            state, metrics = qat_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    m_after = _map_variant(model, state.params, eval_loader, priors, pp,
                           quant=qtree)
    print(json.dumps({"base_f32": base, "int8_before_qat": m_before,
                      "int8_after_qat": m_after}))
    # served-int8 after QAT recovers to ~the f32 baseline and never
    # regresses vs pre-QAT PTQ
    assert m_after > base - 0.02, (base, m_before, m_after)
    assert m_after >= m_before - 0.005, (m_before, m_after)
