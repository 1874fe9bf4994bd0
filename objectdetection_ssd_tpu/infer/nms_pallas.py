"""Pallas TPU kernel for greedy NMS suppression.

One kernel program per (image, class) pair: computes the K x K IoU matrix
in VMEM from the score-sorted candidate boxes and runs the sequential
suppression recurrence entirely on-chip — the recurrence's per-step work is
a single (1, K) VPU op, so keeping the loop inside one kernel avoids both
XLA while-loop per-iteration overhead and materializing (B, 20, K, K) IoU
tensors in HBM.

Semantics are identical to `postprocess.greedy_nms_mask` (and therefore to
the reference's suppression loop, `Losses.py:44-56`): a candidate is kept
iff it is valid (score >= threshold) and no earlier kept candidate overlaps
it at IoU >= threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref,
                over_scr, *, iou_threshold: float):
    """One (image, class) candidate set.

    boxes_ref:   (1, K, 4) f32 xyxy, sorted by descending score.
    boxes_t_ref: (1, 4, K) f32 — the same boxes transposed (prepared by XLA;
                 cheaper than an in-kernel relayout).
    valid_ref:   (1, 1, K) f32 {0, 1}.
    keep_ref:    (1, 1, K) f32 {0, 1} output.
    over_scr:    (K, K) f32 scratch — overlap >= threshold matrix.
    """
    k = boxes_ref.shape[1]
    x1c, y1c = boxes_ref[0, :, 0:1], boxes_ref[0, :, 1:2]  # (K, 1)
    x2c, y2c = boxes_ref[0, :, 2:3], boxes_ref[0, :, 3:4]
    x1r, y1r = boxes_t_ref[0, 0:1, :], boxes_t_ref[0, 1:2, :]  # (1, K)
    x2r, y2r = boxes_t_ref[0, 2:3, :], boxes_t_ref[0, 3:4, :]

    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = iw * ih                                         # (K, K)
    area_c = (x2c - x1c) * (y2c - y1c)                      # (K, 1)
    area_r = (x2r - x1r) * (y2r - y1r)                      # (1, K)
    union = area_c + area_r - inter
    over_scr[:] = jnp.where(inter >= iou_threshold * union, 1.0, 0.0)

    # The greedy recurrence, expressed in pure vector form (no per-element
    # scalar VMEM reads or dynamic-index stores — Mosaic-friendly):
    #   active_i = valid_i AND not-yet-suppressed_i        (scalar via 1-hot)
    #   sup     |= over[i, :] * active_i, except at column i (self-overlap).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid_v = valid_ref[0]                                  # (1, K)

    def body(i, sup):
        row = over_scr[pl.ds(i, 1), :]                      # (1, K)
        onehot = (lane == i).astype(jnp.float32)            # (1, K)
        act = jnp.sum((1.0 - sup) * valid_v * onehot)       # scalar
        # A box never suppresses itself (`Losses.py:55`): mask column i.
        return jnp.maximum(sup, row * (1.0 - onehot) * act)

    sup = jax.lax.fori_loop(
        0, k, body, jnp.zeros((1, k), jnp.float32))
    keep_ref[0] = valid_v * (1.0 - sup)


def _nms_kernel_multiclass(boxes_ref, boxes_t_ref, valid_ref, keep_ref,
                           over_scr, *, iou_threshold: float):
    """A block of G candidate sets (several images x all their classes).

    boxes_ref:   (G, K, 4); boxes_t_ref: (G, 4, K);
    valid_ref / keep_ref: (G, 1, K); over_scr: (G, K, K) scratch.

    Identical recurrence to `_nms_kernel`, vectorized over the set dim so
    one kernel program amortizes its launch/DMA/loop overhead across many
    candidate sets (all classes of several images).
    """
    g = boxes_ref.shape[0]
    k = boxes_ref.shape[1]
    x1c, y1c = boxes_ref[:, :, 0:1], boxes_ref[:, :, 1:2]   # (G, K, 1)
    x2c, y2c = boxes_ref[:, :, 2:3], boxes_ref[:, :, 3:4]
    x1r, y1r = boxes_t_ref[:, 0:1, :], boxes_t_ref[:, 1:2, :]   # (G, 1, K)
    x2r, y2r = boxes_t_ref[:, 2:3, :], boxes_t_ref[:, 3:4, :]

    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = iw * ih                                         # (G, K, K)
    area_c = (x2c - x1c) * (y2c - y1c)
    area_r = (x2r - x1r) * (y2r - y1r)
    union = area_c + area_r - inter
    over_scr[:] = jnp.where(inter >= iou_threshold * union, 1.0, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (g, 1, k), 2)
    valid_v = valid_ref[:]                                  # (G, 1, K)

    def body(i, sup):
        row = over_scr[:, pl.ds(i, 1), :]                   # (G, 1, K)
        onehot = (lane == i).astype(jnp.float32)
        act = jnp.sum((1.0 - sup) * valid_v * onehot, axis=-1,
                      keepdims=True)                        # (G, 1, 1)
        return jnp.maximum(sup, row * (1.0 - onehot) * act)

    sup = jax.lax.fori_loop(
        0, k, body, jnp.zeros((g, 1, k), jnp.float32))
    keep_ref[:] = valid_v * (1.0 - sup)


def greedy_nms_keep_batched(cand_boxes: jnp.ndarray, valid: jnp.ndarray,
                            iou_threshold: float,
                            interpret: bool | None = None,
                            images_per_block: int = 2) -> jnp.ndarray:
    """(B, C, K, 4) boxes + (B, C, K) validity -> (B, C, K) keep mask.

    Each kernel program suppresses ``images_per_block`` images' C class
    candidate sets together in VMEM (G = images_per_block * C sets per
    program), so the K-step sequential recurrence runs on wide (G, 1, K)
    vectors instead of per-image slivers.  2 images/block is the VMEM
    frontier (measured on v5e, 16 MB scoped limit): at 4 images/block both
    the (G, K, 4) packed-columns operand (pads 4 -> 128 lanes; 21.75 MB)
    and a variant deriving (K, 1) columns in-kernel (four separately
    lane-padded column buffers; 21.68 MB) exceed it.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, c, k, _ = cand_boxes.shape
    ib = images_per_block
    while b % ib:
        ib //= 2
    g = ib * c
    boxes = cand_boxes.astype(jnp.float32).reshape(b * c, k, 4)
    boxes_t = jnp.swapaxes(boxes, 1, 2)                     # (B*C, 4, K)
    valid_f = valid.reshape(b * c, 1, k).astype(jnp.float32)

    kernel = functools.partial(_nms_kernel_multiclass,
                               iou_threshold=iou_threshold)
    keep = pl.pallas_call(
        kernel,
        grid=(b // ib,),
        in_specs=[
            pl.BlockSpec((g, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, 1, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g, k, k), jnp.float32),
        ],
        interpret=interpret,
    )(boxes, boxes_t, valid_f)
    return keep.reshape(b, c, k) > 0.5


def greedy_nms_keep(cand_boxes: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float,
                    interpret: bool | None = None) -> jnp.ndarray:
    """(..., K, 4) boxes + (..., K) validity -> (..., K) keep mask.

    With a 4-D (B, C, K, 4) input, dispatches to the per-image multiclass
    kernel; otherwise flattens all leading dims into the kernel grid (one
    program per candidate set).  ``interpret`` defaults to True off-TPU so
    tests run on the CPU backend via the Pallas interpreter.
    """
    if cand_boxes.ndim == 4:
        return greedy_nms_keep_batched(cand_boxes, valid, iou_threshold,
                                       interpret)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = cand_boxes.shape[:-2]
    k = cand_boxes.shape[-2]
    g = 1
    for d in lead:
        g *= d
    boxes = cand_boxes.reshape(g, k, 4).astype(jnp.float32)
    boxes_t = jnp.swapaxes(boxes, 1, 2)                     # (G, 4, K)
    valid_f = valid.reshape(g, 1, k).astype(jnp.float32)

    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold)
    keep = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.float32),
        ],
        interpret=interpret,
    )(boxes, boxes_t, valid_f)
    return keep.reshape(*lead, k) > 0.5
