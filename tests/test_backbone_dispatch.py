"""Backbone-aware prior dispatch + resnet34 end-to-end through the CLI.

Round-1 advisor finding: Trainer/Detector hardcoded the 8732 SSD300 priors,
so `--backbone resnet34` (189 anchors) crashed on shape mismatch.  These
tests pin the dispatch (`ops.priors.priors_for_model`) and run the actual
CLI train/eval path on the ResNet-34 family.
"""

import numpy as np
import pytest

from objectdetection_ssd_tpu.config import Config, ModelConfig
from objectdetection_ssd_tpu.ops import priors as priors_lib


def test_priors_for_model_dispatch():
    vgg = priors_lib.priors_for_model(ModelConfig(backbone="vgg16"))
    assert vgg.shape == (8732, 4)
    res = priors_lib.priors_for_model(ModelConfig(backbone="resnet34"))
    assert res.shape == (189, 4)
    with pytest.raises(ValueError):
        priors_lib.priors_for_model(ModelConfig(backbone="vgg19"))


def test_resnet34_priors_match_head_emission_order():
    """Priors must be (tap, row, col, anchor)-major to line up with
    flatten_head's (B, H, W, k*4) -> (B, H*W*k, 4) flattening."""
    p = priors_lib.resnet34_priors()
    assert p.shape == (189, 4)
    # Tap order 4x4 (144 rows), 2x2 (36), 1x1 (9).
    g4, g2, g1 = p[:144], p[144:180], p[180:]
    # First 9 anchors share the first cell center (0.125, 0.125).
    np.testing.assert_allclose(g4[:9, 0], 0.125)
    np.testing.assert_allclose(g4[:9, 1], 0.125)
    # Anchors 9..17 move one COLUMN right (cx changes, cy fixed): row-major.
    np.testing.assert_allclose(g4[9:18, 0], 0.375)
    np.testing.assert_allclose(g4[9:18, 1], 0.125)
    # Row stride: anchor 4*9=36 starts the second row.
    np.testing.assert_allclose(g4[36, 0], 0.125)
    np.testing.assert_allclose(g4[36, 1], 0.375)
    # Zoom/ratio sizes reproduce the reference generator's values
    # (`Util.py:144-164`): zoom 0.75 square at grid 4 -> w = h = 0.75/4.
    np.testing.assert_allclose(g4[0, 2:], 0.75 / 4)
    # 1x1 tap: single center, sizes = zooms x ratios (zoom 1.3 clipped to 1).
    np.testing.assert_allclose(g1[:, 0], 0.5)
    np.testing.assert_allclose(g1[:, 1], 0.5)
    np.testing.assert_allclose(g1[3, 2:], 1.0)          # zoom 1.0 square
    np.testing.assert_allclose(g1[8, 2:], [0.65, 1.0])  # 1.3 * (0.5, 1) clip
    # Everything in [0, 1] like the SSD300 generator (`Util.py:136`).
    assert (p >= 0).all() and (p <= 1).all()


def test_trainer_uses_backbone_priors():
    """Trainer must pick the 189-anchor set for resnet34 without an explicit
    priors= argument (the round-1 crash)."""
    import dataclasses
    from objectdetection_ssd_tpu.train.trainer import Trainer
    cfg = Config(model=ModelConfig(backbone="resnet34", image_size=64))
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=8))

    class _FakeLoader:
        records = []

        def __len__(self):
            return 1

    trainer = Trainer(cfg, _FakeLoader())
    assert trainer.priors.shape == (189, 4)


@pytest.mark.slow
def test_cli_train_eval_resnet34(tmp_path):
    """The full CLI path on the ResNet-34 family: train one epoch on a tiny
    synthetic VOC, checkpoint, then eval mAP from the checkpoint."""
    from objectdetection_ssd_tpu import cli
    from objectdetection_ssd_tpu.data import synthetic

    root = tmp_path / "VOCdevkit"
    # 16 records -> val split of 1 image (val_fraction 0.1), train 15.
    synthetic.generate_voc(str(root), num_2007=16, num_2012=0,
                           image_size=(96, 96), seed=3)
    ckpt = tmp_path / "ckpt"
    rc = cli.main([
        "train", "--voc-root", str(root), "--epochs", "1",
        "--batch-size", "8", "--num-workers", "0",
        "--backbone", "resnet34",
        "--checkpoint-dir", str(ckpt),
    ])
    assert rc == 0
    assert any(ckpt.iterdir())

    rc = cli.main([
        "eval", "--voc-root", str(root), "--batch-size", "8",
        "--num-workers", "0", "--backbone", "resnet34",
        "--checkpoint-dir", str(ckpt),
    ])
    assert rc == 0
