"""ctypes bindings for the native (C++) data-path kernels.

Builds `native/src/voc_native.cpp` with g++ on first use (cached next to the
source as build/libvoc_native.so) and exposes:
  * `parse_voc_xml(path)` — reference-parity VOC annotation parsing
    (`DataLists.py:8-30`) without ElementTree;
  * `resize_normalize(img, size)` — PIL-BILINEAR-compatible resample fused
    with ImageNet normalization (`Dataset.py:10-13`), OpenMP-parallel.

Everything degrades gracefully: if g++ or the build is unavailable,
`available()` is False and callers fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from objectdetection_ssd_tpu.config import IMAGENET_MEAN, IMAGENET_STD

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "src", "voc_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvoc_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
           "-o", _LIB_PATH, _SRC]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.voc_parse_xml.restype = ctypes.c_int
        lib.voc_parse_xml.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.resize_normalize.restype = None
        lib.resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_voc_xml(xml_path: str, max_objects: int = 256
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native VOC XML parse -> (boxes_xyxy f32, class_ids i32, difficult bool).

    Matches `data.voc.parse_voc_xml` (and the reference `DataLists.py:8-30`)
    exactly; raises RuntimeError if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    with open(xml_path, "rb") as f:
        data = f.read()
    boxes = np.zeros((max_objects, 4), np.float32)
    classes = np.zeros((max_objects,), np.int32)
    difficult = np.zeros((max_objects,), np.uint8)
    n = lib.voc_parse_xml(
        data, len(data),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        classes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        difficult.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        max_objects)
    if n < 0:
        raise ValueError(f"malformed VOC XML: {xml_path}")
    return boxes[:n].copy(), classes[:n].copy(), difficult[:n].astype(bool)


def resize_normalize(img: np.ndarray, size: int) -> np.ndarray:
    """(h, w, 3) float32 [0,1] -> (size, size, 3) normalized float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    lib.resize_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
