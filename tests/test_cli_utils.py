"""CLI config plumbing, metrics, and visualization tests."""

import argparse
import logging
import os

import numpy as np
import pytest

from objectdetection_ssd_tpu import cli
from objectdetection_ssd_tpu.utils import metrics, viz


def _parse(argv):
    parser = argparse.ArgumentParser()
    sub_argv = argv
    # reuse the real parser through main's wiring by monkeypatching fn
    ns = None

    class Capture(Exception):
        pass

    def fake_fn(args):
        nonlocal ns
        ns = args
        raise Capture

    import unittest.mock as mock
    with mock.patch.object(cli, "cmd_train", fake_fn), \
         mock.patch.object(cli, "cmd_eval", fake_fn), \
         mock.patch.object(cli, "cmd_detect", fake_fn):
        try:
            cli.main(argv)
        except Capture:
            pass
    return ns


def test_cli_train_flags():
    ns = _parse(["train", "--voc-root", "/tmp/x", "--batch-size", "8",
                 "--epochs", "3", "--parity-split"])
    cfg = cli.build_config(ns)
    assert cfg.data.voc_root == "/tmp/x"
    assert cfg.data.batch_size == 8
    assert cfg.data.parity_split
    assert ns.epochs == 3


def test_cli_backbone_switch_sets_image_size():
    ns = _parse(["train", "--backbone", "resnet34"])
    cfg = cli.build_config(ns)
    assert cfg.model.backbone == "resnet34"
    assert cfg.model.image_size == 224
    ns = _parse(["eval", "--backbone", "vgg16"])
    cfg = cli.build_config(ns)
    assert cfg.model.image_size == 300


def test_cli_detect_args():
    ns = _parse(["detect", "a.jpg", "b.jpg", "--draw"])
    assert ns.images == ["a.jpg", "b.jpg"]
    assert ns.draw


def test_running_average_weighted():
    ra = metrics.RunningAverage()
    ra.update(1.0, weight=2)
    ra.update(4.0, weight=1)
    np.testing.assert_allclose(ra.average, 2.0)


def test_metrics_logger_summary():
    m = metrics.MetricsLogger(log_every=0)
    m.update({"loss": 2.0}, batch_size=4)
    m.update({"loss": 1.0}, batch_size=4)
    np.testing.assert_allclose(m.summary()["loss"], 1.5)


def test_stopwatch_percentiles():
    sw = metrics.Stopwatch()
    for _ in range(5):
        sw.start()
        sw.stop()
    assert sw.mean >= 0
    assert sw.percentile(50) >= 0


def test_write_history(tmp_path):
    p = tmp_path / "hist.json"
    metrics.write_history(str(p), {"train": [1.0, 0.5]})
    import json
    assert json.loads(p.read_text())["train"] == [1.0, 0.5]


def test_draw_detections(tmp_path):
    img = np.zeros((60, 80, 3), np.uint8)
    out = tmp_path / "det.png"
    im = viz.draw_detections(img, np.asarray([[5, 5, 40, 40]]), ["cat"],
                             np.asarray([0.9]), save_path=str(out))
    assert out.exists()
    assert im.size == (80, 60)
    # the box outline must have painted non-black pixels
    assert np.asarray(im).sum() > 0


def test_draw_priors_grid(tmp_path):
    from objectdetection_ssd_tpu.ops import priors
    out = tmp_path / "priors.png"
    viz.draw_priors_grid(300, priors.ssd300_priors(), cell_index=0,
                         save_path=str(out))
    assert out.exists()


def test_viz_legacy_helpers(tmp_path):
    """denormalize / largest_box / indicator / anchor scatter (reference
    `Util.py:37-40,183-196,501-513`)."""
    x = np.zeros((2, 2, 3))
    np.testing.assert_allclose(viz.denormalize(x)[0, 0],
                               [0.485, 0.456, 0.406])
    boxes = np.asarray([[0, 0, 1, 1], [0, 0, 5, 5], [0, 0, 2, 2]], float)
    bb, ll = viz.largest_box(boxes, ["a", "b", "c"])
    assert ll == ["b"] and np.array_equal(bb[0], boxes[1])
    np.testing.assert_array_equal(viz.indicator([0, 3], 5),
                                  [1, 0, 0, 1, 0])
    from objectdetection_ssd_tpu.ops import priors
    out = tmp_path / "centers.png"
    viz.draw_anchor_centers(priors.ssd300_priors()[:16], grid_size=38,
                            save_path=str(out))
    assert out.exists()


def test_profiler_trace_noop():
    with metrics.profiler_trace(None):
        pass  # no-op path must not require jax


def test_metrics_logger_on_log_hook():
    events = []
    m = metrics.MetricsLogger(log_every=2, prefix="t",
                              on_log=lambda s, sc: events.append((s, sc)))
    m.update({"loss": 4.0}, 2)
    assert events == []                      # below cadence: no host pull
    m.update({"loss": 2.0}, 2)
    assert len(events) == 1
    step, scalars = events[0]
    assert step == 2 and scalars["loss"] == 3.0   # weighted average
    assert "img_per_sec" in scalars


def test_tensorboard_writer(tmp_path):
    w = metrics.TensorBoardWriter(str(tmp_path / "tb"))
    w.scalars("train", 1, {"loss": 1.5})
    w.close()
    import glob
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
