"""Prior (anchor) box generation — vectorized, no Python loops over cells.

Reproduces the reference generators exactly, including row ordering:

* `create_priors_ssd300` (`Util.py:105-137`): 6 feature-map grids
  [38, 19, 10, 5, 3, 1], scales [0.1, 0.2, 0.375, 0.55, 0.725, 0.9], per-cell
  aspect ratios {1, 2, 1/2} (+extra) on maps 0, 4, 5 and {1, 2, 3, 1/2, .333}
  (+extra) on maps 1-3.  Ratio 1 additionally emits an extra square box with
  side sqrt(s_k * s_{k+1}) (scale 1.0 on the last map, `Util.py:129-134`).
  Cells are emitted row-major (i outer, j inner) with cx = (j+.5)/g,
  cy = (i+.5)/g (`Util.py:122-126`); per-cell box order is
  [ratio-1, extra, ratio-2, (ratio-3), ratio-1/2, (ratio-.333)] because the
  extra box is appended immediately after the ratio-1 box (`Util.py:128-134`).
  Total 8732 priors, clamped to [0, 1], cxcywh.

* `create_ancs_xywh_zoom_ratio` (`Util.py:144-164`): grids [4, 2, 1] x zooms
  [0.75, 1, 1.3] x ratio pairs [(1,1), (1,.5), (.5,1)] -> 189 priors, emitted
  with the reference's (y, x, w, h)-swapped column order, plus the companion
  per-anchor grid-size vector (`Util.py:18,161`).

The reference builds these with a triple-nested Python loop of 8732
iterations at import time (`Losses.py:6`); here it is a handful of
broadcasted numpy ops evaluated once and cached.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import numpy as np

from objectdetection_ssd_tpu.config import PriorConfig


def _cell_wh(scale: float, next_scale: float,
             ratios: Sequence[float]) -> np.ndarray:
    """Per-cell (k, 2) box sizes in the reference's emission order."""
    whs = []
    for a in ratios:
        whs.append((scale * math.sqrt(a), scale / math.sqrt(a)))
        if a == 1.0:
            extra = math.sqrt(scale * next_scale) if next_scale > 0 else 1.0
            whs.append((extra, extra))
    return np.asarray(whs, dtype=np.float32)


@functools.lru_cache(maxsize=None)
def _ssd300_priors_cached(cfg_key: Tuple) -> np.ndarray:
    sizes, scales, ratios = cfg_key
    per_map = []
    for idx, (g, s) in enumerate(zip(sizes, scales)):
        next_scale = scales[idx + 1] if idx + 1 < len(scales) else -1.0
        wh = _cell_wh(s, next_scale, ratios[idx])          # (k, 2)
        k = wh.shape[0]
        # Row-major cell centers: i (rows/cy) outer, j (cols/cx) inner.
        centers = (np.arange(g, dtype=np.float32) + 0.5) / g
        cy, cx = np.meshgrid(centers, centers, indexing="ij")  # (g, g)
        cxy = np.stack([cx, cy], axis=-1)                   # (g, g, 2)
        cell = np.concatenate(
            [np.broadcast_to(cxy[:, :, None, :], (g, g, k, 2)),
             np.broadcast_to(wh[None, None, :, :], (g, g, k, 2))],
            axis=-1)                                        # (g, g, k, 4)
        per_map.append(cell.reshape(-1, 4))
    priors = np.concatenate(per_map, axis=0)
    return np.clip(priors, 0.0, 1.0)


def ssd300_priors(config: PriorConfig | None = None) -> np.ndarray:
    """(P, 4) cxcywh priors in [0, 1]; P = 8732 for the default config."""
    cfg = config or PriorConfig()
    key = (tuple(cfg.feature_map_sizes), tuple(cfg.scales),
           tuple(tuple(r) for r in cfg.aspect_ratios))
    return _ssd300_priors_cached(key)


@functools.lru_cache(maxsize=None)
def zoom_ratio_priors(reference_order: bool = True
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """189-prior zoom/ratio generator for the ResNet-34 variant.

    Returns ``(priors, grid_sizes)``: priors are (189, 4) and grid_sizes is
    the per-anchor cell-size vector (`Util.py:18,161`).

    ``reference_order=True`` reproduces the reference's swapped
    (y, x, w, h) column order (`Util.py:164`) as consumed by its legacy tanh
    decode path; ``False`` returns standard (cx, cy, w, h) suitable for this
    framework's matcher/codec pipeline (use this to train `SSDResNet34`).
    """
    grids = (4, 2, 1)
    zooms = (0.75, 1.0, 1.3)
    ratio_pairs = ((1.0, 1.0), (1.0, 0.5), (0.5, 1.0))
    scales = np.asarray(
        [(z * i, z * j) for z in zooms for (i, j) in ratio_pairs],
        dtype=np.float32)                                   # (9, 2)
    k = scales.shape[0]

    ctrs, sizes, grid_sizes = [], [], []
    for g in grids:
        offset = 1.0 / (2 * g)
        lin = np.linspace(offset, 1 - offset, g, dtype=np.float32)
        # Reference: anc_x repeats each value g times, anc_y tiles
        # (`Util.py:157-158`), i.e. x is the slow axis.
        anc_x = np.repeat(lin, g)
        anc_y = np.tile(lin, g)
        cxy = np.repeat(np.stack([anc_x, anc_y], axis=1), k, axis=0)
        wh = np.tile(scales / g, (g * g, 1))
        ctrs.append(cxy)
        sizes.append(wh)
        grid_sizes.append(np.full((g * g * k,), 1.0 / g, dtype=np.float32))

    ancs = np.concatenate(
        [np.concatenate(ctrs, 0), np.concatenate(sizes, 0)], axis=1)
    if reference_order:
        # Swap into the reference's (y, x, w, h) order (`Util.py:164`).
        ancs = np.stack(
            [ancs[:, 1], ancs[:, 0], ancs[:, 2], ancs[:, 3]], axis=1)
    return ancs, np.concatenate(grid_sizes, 0)


@functools.lru_cache(maxsize=None)
def resnet34_priors() -> np.ndarray:
    """(189, 4) cxcywh priors aligned with `SSDResNet34`'s head emission.

    The reference ships a ResNet variant whose k=3 heads contradict its own
    189-anchor zoom/ratio generator (`Model.py:37-47` vs `Util.py:144-164`;
    SURVEY.md §2 row 13) — the pairing was never coherent.  This is the
    framework-native coherent pairing: taps 4x4, 2x2, 1x1 in model order,
    cells **row-major** (row slow, col fast) to match `flatten_head`'s
    (row, col, anchor) flattening, 9 zoom x ratio anchors per cell using the
    reference generator's zoom/ratio values, standard (cx, cy, w, h)
    columns, clipped to [0, 1] like the SSD300 generator (`Util.py:136`).

    `zoom_ratio_priors` keeps the reference's own (col-slow, (y,x,w,h))
    emission for its legacy tanh-decode parity path.
    """
    grids = (4, 2, 1)
    zooms = (0.75, 1.0, 1.3)
    ratio_pairs = ((1.0, 1.0), (1.0, 0.5), (0.5, 1.0))
    scales = np.asarray(
        [(z * i, z * j) for z in zooms for (i, j) in ratio_pairs],
        dtype=np.float32)                                   # (9, 2) (w, h)
    k = scales.shape[0]
    per_map = []
    for g in grids:
        centers = (np.arange(g, dtype=np.float32) + 0.5) / g
        cy, cx = np.meshgrid(centers, centers, indexing="ij")  # row-major
        cxy = np.stack([cx, cy], axis=-1)                   # (g, g, 2)
        wh = scales / g                                     # (k, 2)
        cell = np.concatenate(
            [np.broadcast_to(cxy[:, :, None, :], (g, g, k, 2)),
             np.broadcast_to(wh[None, None, :, :], (g, g, k, 2))],
            axis=-1)
        per_map.append(cell.reshape(-1, 4))
    return np.clip(np.concatenate(per_map, axis=0), 0.0, 1.0)


def priors_for_model(model_config, prior_config: PriorConfig | None = None
                     ) -> np.ndarray:
    """Priors matching ``model_config.backbone``'s head layout.

    vgg16 -> 8732 SSD300 priors; resnet34 -> 189 coherent zoom/ratio priors.
    This is the single dispatch point Trainer/Detector/eval use so a
    backbone switch can never pair a model with the wrong anchor set.
    """
    backbone = getattr(model_config, "backbone", model_config)
    if backbone == "vgg16":
        return ssd300_priors(prior_config)
    if backbone == "resnet34":
        return resnet34_priors()
    raise ValueError(f"unknown backbone: {backbone!r}")


def ssd_paper_scale(k: int) -> float:
    """The SSD paper's scale formula s_k = 0.2 + 0.7 (k-1)/5, rounded to 2
    decimals — the reference defines it (`Util.py:140-141`) as an unused
    alternative to its hand-picked scale list; kept for API completeness.
    ssd_paper_scale(1..6) = [0.2, 0.34, 0.48, 0.62, 0.76, 0.9].
    """
    return round(0.2 + 0.7 * (k - 1) / 5.0, 2)
