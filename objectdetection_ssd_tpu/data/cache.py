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

import hashlib
import os
import threading
from collections import deque
from typing import Dict, List, Tuple

import numpy as np

_handles: Dict[str, Tuple[np.memmap, np.ndarray, np.ndarray, np.ndarray]] = {}
_lock = threading.Lock()


def _paths_digest(image_paths: List[str]) -> str:
    return hashlib.sha256("\n".join(image_paths).encode()).hexdigest()


def build(image_paths: List[str], cache_path: str,
          num_workers: int = 0) -> str:
    """Decode all images into the packed cache (idempotent, streaming).

    Idempotence is keyed on a hash of the full ordered path list (not just
    the count — a changed split/order/root must trigger a rebuild).  The
    build streams: each decoded image is written immediately and at most
    ~2x num_workers decoded images are in flight, so memory stays constant
    regardless of corpus size (VOC07+12 fully decoded is ~8-9 GB — the
    round-1 list-building version would OOM small hosts).  Output files are
    written to temp names and atomically renamed, index last, and the whole
    .bin+.idx pair replacement runs under an fcntl file lock — per-file
    renames alone are not enough: two concurrent builds of DIFFERENT path
    lists could interleave to pair one build's bin with the other's index,
    which the sha256 check cannot detect.
    """
    idx_path = cache_path + ".idx.npz"
    bin_path = cache_path + ".bin"
    digest = _paths_digest(image_paths)

    def _is_current() -> bool:
        if not (os.path.exists(idx_path) and os.path.exists(bin_path)):
            return False
        idx = np.load(idx_path)
        return ("paths_sha256" in idx
                and str(idx["paths_sha256"]) == digest
                and len(idx["heights"]) == len(image_paths))

    if _is_current():
        return cache_path
    import fcntl
    with open(cache_path + ".lock", "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        return _build_locked(image_paths, cache_path, num_workers,
                             bin_path, idx_path, digest, _is_current)


def _build_locked(image_paths, cache_path, num_workers, bin_path, idx_path,
                  digest, _is_current):
    if _is_current():                 # another process built it meanwhile
        return cache_path
    from objectdetection_ssd_tpu.data.pipeline import load_image

    def decode(p):
        img = load_image(p)
        return (img * 255.0 + 0.5).astype(np.uint8)

    heights: List[int] = []
    widths: List[int] = []
    tmp_bin = bin_path + f".tmp.{os.getpid()}"

    def write_all(sink):
        if num_workers:
            # Windowed submission: bounded in-flight decodes, in-order write.
            from concurrent.futures import ThreadPoolExecutor
            window = max(2 * num_workers, 4)
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                pending: deque = deque()
                it = iter(image_paths)

                def submit_next() -> bool:
                    p = next(it, None)
                    if p is None:
                        return False
                    pending.append(pool.submit(decode, p))
                    return True

                for _ in range(window):
                    if not submit_next():
                        break
                while pending:
                    im = pending.popleft().result()
                    heights.append(im.shape[0])
                    widths.append(im.shape[1])
                    sink.write(np.ascontiguousarray(im).tobytes())
                    submit_next()
        else:
            for p in image_paths:
                im = decode(p)
                heights.append(im.shape[0])
                widths.append(im.shape[1])
                sink.write(np.ascontiguousarray(im).tobytes())

    try:
        with open(tmp_bin, "wb") as f:
            write_all(f)
        os.replace(tmp_bin, bin_path)
    finally:
        if os.path.exists(tmp_bin):
            os.unlink(tmp_bin)
    h = np.asarray(heights, np.int64)
    w = np.asarray(widths, np.int64)
    offsets = np.concatenate([[0], np.cumsum(h * w * 3)])
    tmp_idx = idx_path + f".tmp.{os.getpid()}.npz"
    np.savez(tmp_idx, offsets=offsets, heights=h, widths=w,
             paths_sha256=digest)
    os.replace(tmp_idx, idx_path)
    with _lock:
        _handles.pop(cache_path, None)       # drop any stale mmap
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
