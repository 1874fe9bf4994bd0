"""Packed decoded-image cache: decode every JPEG once, then serve raw uint8
pixels from a memory-mapped flat file on all later epochs.

The reference re-decodes every JPEG through PIL in the DataLoader workers on
every epoch (`Dataset.py:25`) — for VOC07+12 that's ~16.5k decodes/epoch and
the input-pipeline bottleneck SURVEY.md §7 calls out ("pre-decode to a
packed array format").  Layout:

  <path>.bin   — concatenated C-order uint8 HWC pixel blobs
  <path>.idx.npz — offsets (n+1,), heights (n,), widths (n,)

Readers mmap the .bin once per process; `get_image` returns a zero-copy
view scaled to float32 only at use time.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Tuple

import numpy as np

_handles: Dict[str, Tuple[np.memmap, np.ndarray, np.ndarray, np.ndarray]] = {}
_lock = threading.Lock()


def build(image_paths: List[str], cache_path: str,
          num_workers: int = 0) -> str:
    """Decode all images into the packed cache (idempotent)."""
    idx_path = cache_path + ".idx.npz"
    bin_path = cache_path + ".bin"
    if os.path.exists(idx_path) and os.path.exists(bin_path):
        idx = np.load(idx_path)
        if len(idx["heights"]) == len(image_paths):
            return cache_path
    from objectdetection_ssd_tpu.data.pipeline import load_image

    def decode(p):
        img = load_image(p)
        return (img * 255.0 + 0.5).astype(np.uint8)

    if num_workers:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            imgs = list(pool.map(decode, image_paths))
    else:
        imgs = [decode(p) for p in image_paths]

    heights = np.asarray([im.shape[0] for im in imgs], np.int64)
    widths = np.asarray([im.shape[1] for im in imgs], np.int64)
    sizes = heights * widths * 3
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    with open(bin_path, "wb") as f:
        for im in imgs:
            f.write(np.ascontiguousarray(im).tobytes())
    np.savez(idx_path, offsets=offsets, heights=heights, widths=widths)
    return cache_path


def _open(cache_path: str):
    with _lock:
        h = _handles.get(cache_path)
        if h is None:
            idx = np.load(cache_path + ".idx.npz")
            data = np.memmap(cache_path + ".bin", dtype=np.uint8, mode="r")
            h = (data, idx["offsets"], idx["heights"], idx["widths"])
            _handles[cache_path] = h
        return h


def num_images(cache_path: str) -> int:
    return len(_open(cache_path)[2])


def get_image(cache_path: str, index: int) -> np.ndarray:
    """(h, w, 3) float32 in [0, 1] — decoded-pixel view, no JPEG work."""
    data, offsets, heights, widths = _open(cache_path)
    h, w = int(heights[index]), int(widths[index])
    blob = data[int(offsets[index]):int(offsets[index + 1])]
    return blob.reshape(h, w, 3).astype(np.float32) / 255.0
