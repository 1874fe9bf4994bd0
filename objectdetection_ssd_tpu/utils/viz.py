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
