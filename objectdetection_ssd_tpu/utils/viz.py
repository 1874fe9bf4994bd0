"""Host-side visualization: draw GT/predicted boxes on images.

Covers the reference's matplotlib drawing utilities
(`draw_image_with_ancs_xyxy` and friends, `Util.py:429-513`) with a
dependency-light PIL implementation (matplotlib optional, headless-safe).
"""

from __future__ import annotations

import colorsys
from typing import Optional, Sequence

import numpy as np

from objectdetection_ssd_tpu.config import NUM_CLASSES, VOC_CLASSES


def class_color(class_id: int) -> tuple:
    """Deterministic distinct color per class (reference `distinct_colors`,
    `Util.py:33-35`)."""
    h = (class_id * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, 0.95)
    return int(r * 255), int(g * 255), int(b * 255)


def draw_detections(image, boxes_xyxy: np.ndarray,
                    labels: Sequence[str],
                    scores: Optional[np.ndarray] = None,
                    save_path: Optional[str] = None):
    """Draw labeled boxes; ``image`` is a path or an HWC uint8/float array.

    Returns the annotated PIL image (and saves it when ``save_path`` given).
    """
    from PIL import Image, ImageDraw
    if isinstance(image, str):
        im = Image.open(image).convert("RGB")
    else:
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        im = Image.fromarray(arr)
    draw = ImageDraw.Draw(im)
    name_to_id = {n: i for i, n in enumerate(VOC_CLASSES)}
    for i, (box, label) in enumerate(zip(np.asarray(boxes_xyxy), labels)):
        cid = name_to_id.get(str(label), NUM_CLASSES)
        color = class_color(cid)
        x1, y1, x2, y2 = [float(v) for v in box]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        text = str(label)
        if scores is not None:
            text += f" {float(scores[i]):.2f}"
        ty = max(y1 - 12, 0)
        draw.rectangle([x1, ty, x1 + 7 * len(text), ty + 12], fill=color)
        draw.text((x1 + 1, ty), text, fill=(0, 0, 0))
    if save_path:
        im.save(save_path)
    return im


def denormalize(image: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization for display (reference `denormalize`,
    `Util.py:37-40`): std * x + mean, channels last."""
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    return np.asarray(image) * std + mean


def largest_box(boxes_xyxy: np.ndarray, labels: Sequence) -> tuple:
    """Return ([box], [label]) of the largest-area box (reference
    `get_largest_bbox_with_label`, `Util.py:501-507`).  Ties resolve to the
    earliest index, like the reference's stable sort."""
    b = np.asarray(boxes_xyxy)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    idx = int(np.argmax(areas))
    return [b[idx]], [labels[idx]]


def indicator(indices, n: int) -> np.ndarray:
    """{0,1} vector of length n with 1 at the given indices (reference
    `one_zero`, `Util.py:509-513`)."""
    out = np.zeros(n, np.float32)
    out[np.asarray(indices, np.int64)] = 1.0
    return out


def draw_anchor_centers(priors_cxcywh: np.ndarray, grid_size: int,
                        image_size: int = 400,
                        save_path: Optional[str] = None):
    """Scatter anchor centers on a grid (reference `show_anchors`,
    `Util.py:183-196`) — PIL, headless-safe.  ``grid_size`` draws the
    feature-map cell lattice behind the centers."""
    from PIL import Image, ImageDraw
    im = Image.new("RGB", (image_size, image_size), (255, 255, 255))
    draw = ImageDraw.Draw(im)
    for i in range(grid_size + 1):
        t = i / grid_size * (image_size - 1)
        draw.line([(t, 0), (t, image_size)], fill=(220, 220, 220))
        draw.line([(0, t), (image_size, t)], fill=(220, 220, 220))
    pri = np.asarray(priors_cxcywh)
    for i, (cx, cy) in enumerate(pri[:, :2]):
        x, y = cx * (image_size - 1), cy * (image_size - 1)
        draw.ellipse([x - 2, y - 2, x + 2, y + 2], fill=(30, 90, 200))
    if save_path:
        im.save(save_path)
    return im


def draw_priors_grid(image_size: int, priors_cxcywh: np.ndarray,
                     cell_index: int = 0, save_path: Optional[str] = None):
    """Visualize a handful of priors (reference anchor overlays,
    `Util.py:449-473`)."""
    from PIL import Image, ImageDraw
    im = Image.new("RGB", (image_size, image_size), (245, 245, 245))
    draw = ImageDraw.Draw(im)
    pri = np.asarray(priors_cxcywh)
    sel = pri[cell_index:cell_index + 6]
    for i, (cx, cy, w, h) in enumerate(sel):
        x1 = (cx - w / 2) * image_size
        y1 = (cy - h / 2) * image_size
        x2 = (cx + w / 2) * image_size
        y2 = (cy + h / 2) * image_size
        draw.rectangle([x1, y1, x2, y2], outline=class_color(i), width=1)
    if save_path:
        im.save(save_path)
    return im
