"""Golden tests for prior generation against the reference's documented math
(`Util.py:105-137` for SSD300, `Util.py:144-164` for the zoom/ratio variant).
The oracle below is an independent straight-line transcription of that math
(triple loop, per-cell emission order) used only to validate the vectorized
generator."""

import math

import numpy as np
import pytest

from objectdetection_ssd_tpu.config import PriorConfig
from objectdetection_ssd_tpu.ops import priors as priors_lib


def _oracle_ssd300():
    grids = [38, 19, 10, 5, 3, 1]
    scales = [0.1, 0.2, 0.375, 0.55, 0.725, 0.9]
    ratios = [
        [1.0, 2.0, 0.5],
        [1.0, 2.0, 3.0, 0.5, 0.333],
        [1.0, 2.0, 3.0, 0.5, 0.333],
        [1.0, 2.0, 3.0, 0.5, 0.333],
        [1.0, 2.0, 0.5],
        [1.0, 2.0, 0.5],
    ]
    rows = []
    for idx, g in enumerate(grids):
        for i in range(g):
            for j in range(g):
                cx = (j + 0.5) / g
                cy = (i + 0.5) / g
                for a in ratios[idx]:
                    rows.append([cx, cy,
                                 scales[idx] * math.sqrt(a),
                                 scales[idx] / math.sqrt(a)])
                    if a == 1.0:
                        if idx + 1 < len(scales):
                            s = math.sqrt(scales[idx] * scales[idx + 1])
                        else:
                            s = 1.0
                        rows.append([cx, cy, s, s])
    return np.clip(np.asarray(rows, dtype=np.float32), 0.0, 1.0)


def test_ssd300_prior_count():
    p = priors_lib.ssd300_priors()
    assert p.shape == (8732, 4)
    assert PriorConfig().num_priors == 8732


def test_ssd300_priors_match_reference_math():
    got = priors_lib.ssd300_priors()
    want = _oracle_ssd300()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_ssd300_priors_clamped_and_valid():
    p = priors_lib.ssd300_priors()
    assert p.min() >= 0.0 and p.max() <= 1.0
    assert (p[:, 2:] > 0).all()


def test_ssd300_per_map_segment_sizes():
    cfg = PriorConfig()
    sizes = [g * g * k
             for g, k in zip(cfg.feature_map_sizes, cfg.boxes_per_cell)]
    assert sizes == [38 * 38 * 4, 19 * 19 * 6, 10 * 10 * 6,
                     5 * 5 * 6, 3 * 3 * 4, 1 * 1 * 4]
    assert sum(sizes) == 8732


def test_zoom_ratio_priors():
    p, gs = priors_lib.zoom_ratio_priors()
    assert p.shape == (189, 4)
    assert gs.shape == (189,)
    # grid-size vector: 144 cells of 1/4, 36 of 1/2, 9 of 1 (Util.py:18).
    np.testing.assert_allclose(gs[:144], 0.25)
    np.testing.assert_allclose(gs[144:180], 0.5)
    np.testing.assert_allclose(gs[180:], 1.0)
    # first anchor of 4x4 grid: centers at offset 1/8, zoom .75 ratio (1,1)
    # -> w = h = .75/4; columns swapped to (y, x, w, h).
    np.testing.assert_allclose(p[0], [0.125, 0.125, 0.1875, 0.1875],
                               atol=1e-6)


def test_custom_prior_config():
    cfg = PriorConfig(feature_map_sizes=(2, 1), scales=(0.5, 0.9),
                      aspect_ratios=((1.0, 2.0), (1.0,)))
    p = priors_lib.ssd300_priors(cfg)
    assert p.shape == (cfg.num_priors, 4) == (2 * 2 * 3 + 1 * 1 * 2, 4)
