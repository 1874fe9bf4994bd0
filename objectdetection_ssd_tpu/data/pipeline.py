"""Batched input pipeline: decode -> augment -> resize -> normalize -> pad.

Replaces the reference's torch DataLoader + ragged-list collate
(`Dataset.py:7-53`, `train.py:29,40`) with a TPU-friendly design:

  * ragged per-image GT becomes a dense ``(B, max_boxes)`` pad + validity
    mask (SURVEY.md §7: padded batching replaces ragged lists), so the whole
    batch enters one jitted computation;
  * images are NHWC float32, resized to 300x300 and ImageNet-normalized
    exactly like the reference's torchvision Compose (`Dataset.py:10-13`);
  * box coordinates are normalized by the post-augmentation image size
    (`Dataset.py:35-36`);
  * an optional process pool parallelizes decode+augment (the reference uses
    2 DataLoader workers, `train.py:29`), and `prefetch_to_device` overlaps
    host batching with device compute.
"""

from __future__ import annotations

import dataclasses
import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from objectdetection_ssd_tpu.config import (IMAGENET_MEAN, IMAGENET_STD,
                                            DataConfig)
from objectdetection_ssd_tpu.data import augment
from objectdetection_ssd_tpu.data.voc import ImageRecord


def load_image(path: str) -> np.ndarray:
    """Decode an image file to float32 RGB HWC in [0, 1]."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def resize_image(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize to (size, size) — matches transforms.Resize
    (`Dataset.py:10`)."""
    from PIL import Image
    im = Image.fromarray((img * 255.0).astype(np.uint8))
    im = im.resize((size, size), Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def normalize_image(img: np.ndarray) -> np.ndarray:
    """ImageNet mean/std normalization (`Dataset.py:12`)."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (img - mean) / std


def preprocess_image(img: np.ndarray, size: int,
                     normalize: bool = True) -> np.ndarray:
    """Fused resize (+ normalize): native C++ kernel when built (skips PIL's
    uint8 quantization — strictly higher fidelity), PIL fallback otherwise.
    ``normalize=False`` returns the raw [0, 1] resample (uint8 transfer
    mode quantizes it and lets the model normalize on device)."""
    try:
        from objectdetection_ssd_tpu import native
        if native.available():
            return native.resize_normalize(img, size, normalize=normalize)
    except Exception:
        pass
    resized = resize_image(img, size)
    return normalize_image(resized) if normalize else resized


def quantize_uint8(img: np.ndarray) -> np.ndarray:
    """[0, 1] float image -> raw uint8 RGB (round-to-nearest)."""
    return np.clip(img * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


@dataclasses.dataclass
class Example:
    image: np.ndarray        # (S, S, 3): uint8 raw RGB (default transfer
                             # dtype) or float32 ImageNet-normalized
    boxes: np.ndarray        # (n, 4) float32, xyxy in [0, 1]
    classes: np.ndarray      # (n,) int32
    image_id: int


def prepare_example(record: ImageRecord, image_size: int,
                    augment_example: bool, keep_difficult: bool,
                    seed: Optional[int] = None,
                    cache_path: Optional[str] = None,
                    cache_index: int = -1,
                    use_native_augment: bool = True,
                    transfer_dtype: str = "uint8") -> Example:
    """Decode + (optionally) augment one record into a fixed-size example.

    With ``cache_path`` set, pixels come from the packed decoded-image cache
    (data/cache.py) instead of a per-epoch JPEG decode.  Augmentation runs
    in the native C++ pipeline when built (one fused call including resize +
    normalize), numpy otherwise.  ``transfer_dtype="uint8"`` emits raw
    0-255 pixels (device-side normalization, 4x less H2D traffic).
    """
    want_u8 = transfer_dtype == "uint8"
    rec = record if keep_difficult else record.without_difficult()
    if cache_path is not None and cache_index >= 0:
        from objectdetection_ssd_tpu.data import cache as cache_lib
        img = cache_lib.get_image(cache_path, cache_index)
    else:
        img = load_image(rec.image_path)
    boxes = rec.boxes_xyxy.astype(np.float32)
    classes = rec.classes
    if augment_example and use_native_augment:
        try:
            from objectdetection_ssd_tpu import native
            if native.available():
                out_img, out_boxes, out_labels = native.train_augment(
                    img, boxes, classes, seed or 0, image_size,
                    normalize=not want_u8)
                if want_u8:
                    out_img = quantize_uint8(out_img)
                return Example(out_img, out_boxes,
                               out_labels.astype(np.int32), rec.image_id)
        except Exception:
            pass  # fall through to the numpy pipeline
    if augment_example:
        rng = np.random.default_rng(seed)
        img, boxes, classes = augment.train_transform(img, boxes, classes,
                                                      rng)
    h, w = img.shape[:2]
    # Normalize boxes by the post-augmentation size (`Dataset.py:35-36`).
    if len(boxes):
        boxes = boxes / np.asarray([w, h, w, h], np.float32)
        boxes = np.clip(boxes, 0.0, 1.0)
    img = preprocess_image(img, image_size, normalize=not want_u8)
    if want_u8:
        img = quantize_uint8(img)
    return Example(img, boxes.reshape(-1, 4), classes.astype(np.int32),
                   rec.image_id)


def collate(examples: Sequence[Example], max_boxes: int,
            image_size: Optional[int] = None,
            image_dtype: Optional[np.dtype] = None) -> Dict[str, np.ndarray]:
    """Stack examples into one dense padded batch.

    ``image_size``/``image_dtype`` make an EMPTY example list collatable (a
    sharded loader's slice of a short tail batch can hold zero rows — the
    dtype must still match the other processes' shards).
    """
    bs = len(examples)
    if bs == 0 and (image_size is None or image_dtype is None):
        raise ValueError(
            "empty example list needs explicit image_size + image_dtype")
    s = examples[0].image.shape[0] if examples else image_size
    dt = examples[0].image.dtype if examples else np.dtype(image_dtype)
    batch = {
        "images": np.zeros((bs, s, s, 3), dt),
        "boxes": np.zeros((bs, max_boxes, 4), np.float32),
        "classes": np.zeros((bs, max_boxes), np.int32),
        "mask": np.zeros((bs, max_boxes), bool),
        "image_ids": np.zeros((bs,), np.int32),
    }
    for i, ex in enumerate(examples):
        n = min(len(ex.boxes), max_boxes)
        batch["images"][i] = ex.image
        batch["boxes"][i, :n] = ex.boxes[:n]
        batch["classes"][i, :n] = ex.classes[:n]
        batch["mask"][i, :n] = True
        batch["image_ids"][i] = ex.image_id
    return batch


def _prepare_star(args):
    return prepare_example(*args)


class Loader:
    """Epoch iterator over ImageRecords yielding dense padded batches.

    ``drop_last`` defaults to True in training so every step has the same
    static batch shape (one XLA compilation).
    """

    def __init__(self, records: List[ImageRecord], config: DataConfig,
                 image_size: int = 300, train: bool = True,
                 seed: int = 0, drop_last: Optional[bool] = None,
                 cache_path: Optional[str] = None,
                 shard: Optional[Tuple[int, int]] = None):
        """``shard=(index, count)``: multi-host mode — this process prepares
        only rows ``[index*b/count, (index+1)*b/count)`` of every global
        batch (same (seed, epoch) permutation on every host, so the global
        batch is consistent; `parallel.mesh.shard_batch` assembles the
        global device array from each host's slice).  Batches then carry a
        ``global_size`` scalar with the REAL global row count so the
        consumer can weight metrics correctly on tail batches.
        """
        self.records = records
        self.config = config
        self.image_size = image_size
        self.train = train
        self.seed = seed
        self.drop_last = train if drop_last is None else drop_last
        self.cache_path = cache_path
        self.shard = shard
        if shard is not None:
            idx, cnt = shard
            if not (0 <= idx < cnt):
                raise ValueError(f"bad shard {shard}")
            if config.batch_size % cnt:
                raise ValueError(
                    f"global batch {config.batch_size} not divisible by "
                    f"{cnt} processes")
        if cache_path is not None:
            from objectdetection_ssd_tpu.data import cache as cache_lib
            cache_lib.build([r.image_path for r in records], cache_path,
                            num_workers=max(config.num_workers, 4))
        self._pool = None
        if config.num_workers > 0:
            # spawn (not fork): the parent typically has JAX/TPU runtime
            # threads, and forking such a process can deadlock. Workers only
            # import numpy/PIL/native — no device runtime.
            self._pool = ProcessPoolExecutor(
                max_workers=config.num_workers,
                mp_context=multiprocessing.get_context("spawn"))

    def __len__(self) -> int:
        n = len(self.records)
        b = self.config.batch_size
        return n // b if self.drop_last else -(-n // b)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = (rng.permutation(len(self.records)) if self.train
                 else np.arange(len(self.records)))
        b = self.config.batch_size
        n_batches = len(self)
        for bi in range(n_batches):
            idx = order[bi * b:(bi + 1) * b]
            n_global = len(idx)
            augment_now = self.train and self.config.augment
            # Seeds are drawn for the FULL global batch before any shard
            # slicing, so every host consumes the rng identically and a
            # sharded run prepares bit-identical examples to the
            # single-host run for the rows it owns.
            args = [
                (self.records[i], self.image_size, augment_now,
                 self.config.keep_difficult,
                 int(rng.integers(0, 2**31)) if augment_now else None,
                 self.cache_path, int(i),
                 self.config.use_native_augment,
                 self.config.transfer_dtype)
                for i in idx
            ]
            if self.shard is not None:
                si, sn = self.shard
                per = b // sn
                args = args[si * per:(si + 1) * per]
            if self._pool is not None:
                examples = list(self._pool.map(_prepare_star, args))
            else:
                examples = [prepare_example(*a) for a in args]
            batch = collate(examples, self.config.max_boxes,
                            image_size=self.image_size,
                            image_dtype=(np.uint8
                                         if self.config.transfer_dtype
                                         == "uint8" else np.float32))
            if self.shard is not None:
                batch["global_size"] = np.int32(n_global)
            yield batch

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread prefetch so host batching overlaps device steps.

    If the consumer abandons the generator early (exception mid-epoch,
    `break`), the producer is cancelled instead of blocking forever on a
    full queue pinning the underlying loader/process-pool iterator.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    cancelled = threading.Event()

    def _put(item) -> bool:
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        # A loader exception must NOT look like a clean end-of-epoch: ship
        # the exception itself to the consumer (re-raised there) instead of
        # only the sentinel — silent epoch truncation trains on partial
        # data with no error.
        try:
            for item in iterator:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
            _put(e)
            return
        _put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancelled.set()
        # Drain so a producer blocked mid-put can observe cancellation.
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
