"""Pallas filter-gradient (dW) kernel for 3x3 / stride-1 / pad-1 convs.

Why this exists (round-4 measurement, benchmarks/dw_experiment.py): the
train step's backward runs at ~62% MFU and the per-layer stop-gradient
attribution ladder localized the waste to the CONV1 BLOCK's filter
gradients — ~13.5 ms/step at bs=128 where the FLOP-ideal is ~4.5 ms
(~33% MFU), while conv2-conv5/fc dW all measure 84-106%.  The cause is
MXU tiling: a filter gradient contracts over batch*spatial (huge K) into
a tiny (3*3*Cin, Cout) output; with Cin=Cout=64 both output dims sit at
half a 128-lane tile, and XLA's chosen layout leaves the array mostly
idle.

The kernel computes dW TRANSPOSED — ``dWT (Cout, 9*Cin)`` — so the minor
(lane) axis carries ``9*Cin`` (576 for 64 channels: four and a half full
128-lane tiles) and the sublane axis carries Cout: full MXU occupancy
from the same FLOPs.  Shape: one ``dot_general`` per (image, row-block)
grid step between the g block ``(hb*W, Cout)`` and an im2col patch
``(hb*W, 9*Cin)`` built in VMEM from a haloed input slice DMA'd from HBM
(x is NOT pre-padded — padding would cost a full extra HBM round trip of
the activation).

Integration: `models/layers.py:TorchConv(dw_pallas=True)` routes its
backward through `conv3x3p1`'s custom VJP (identical forward + dX — both
stay XLA-native convs; only dW changes).  The kernel is exact up to f32
accumulation order; tests pin it against `jax.grad` of the reference conv
in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Patch-buffer budget (bytes) used to pick the row-block height.
_PATCH_BYTES_TARGET = 5 * 1024 * 1024


def _pick_hb(h: int, w: int, cin: int, itemsize: int) -> int:
    """Largest divisor of ``h`` whose im2col patch fits the VMEM budget."""
    per_row = w * 9 * cin * itemsize
    best = 1
    for hb in range(1, h + 1):
        if h % hb == 0 and hb * per_row <= _PATCH_BYTES_TARGET:
            best = hb
    return best


def _dwt_kernel(x_hbm, g_ref, out_ref, xs, sem, *, hb: int, w: int,
                cin: int, cout: int):
    """One (image, row-block) step: halo-DMA the input slice, build the
    9-tap im2col patch in VMEM, accumulate g^T @ patch into dWT."""
    n = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    # Haloed input rows [j*hb - 1, j*hb + hb + 1) with SAME-pad semantics:
    # missing edge rows and the two pad columns stay zero.
    xs[:] = jnp.zeros_like(xs)

    def copy(src0, rows, dst0):
        dma = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(src0, rows), :, :],
            xs.at[pl.ds(dst0, rows), pl.ds(1, w), :],
            sem)
        dma.start()
        dma.wait()

    if n_j == 1:                      # whole image in one block
        copy(0, hb, 1)
    else:
        @pl.when(j == 0)
        def _():
            copy(0, hb + 1, 1)

        @pl.when(j == n_j - 1)
        def _():
            copy(j * hb - 1, hb + 1, 0)

        @pl.when(jnp.logical_and(j > 0, j < n_j - 1))
        def _():
            copy(j * hb - 1, hb + 2, 0)

    # im2col patch (hb*W, 9*Cin): tap-major lane layout matches the
    # (ky, kx, ci) ordering of an HWIO kernel's leading dims, so the
    # caller's reshape back to (3, 3, Cin, Cout) is a pure view.
    patch = jnp.concatenate(
        [xs[ky:ky + hb, kx:kx + w, :].reshape(hb * w, cin)
         for ky in range(3) for kx in range(3)], axis=1)
    g2 = g_ref[0].reshape(hb * w, cout)
    acc = lax.dot_general(g2, patch, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(n == 0, j == 0))
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_or(n > 0, j > 0))
    def _():
        out_ref[:] += acc


def dw_conv3x3p1(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Filter gradient of a 3x3/stride-1/pad-1 NHWC conv.

    ``x (N, H, W, Cin)``, ``g (N, H, W, Cout)`` -> ``dW (3, 3, Cin, Cout)``
    in f32 (cast to the kernel dtype by the caller).  Exact up to f32
    accumulation order.
    """
    n, h, w, cin = x.shape
    cout = g.shape[-1]
    assert g.shape == (n, h, w, cout), (x.shape, g.shape)
    hb = _pick_hb(h, w, cin, x.dtype.itemsize)
    kern = functools.partial(_dwt_kernel, hb=hb, w=w, cin=cin, cout=cout)
    dwt = pl.pallas_call(
        kern,
        grid=(n, h // hb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x stays in HBM
            pl.BlockSpec((1, hb, w, cout), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, 9 * cin), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, 9 * cin), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hb + 2, w + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * cin * cout,
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + g.size * g.dtype.itemsize),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(x, g)
    # (Cout, 9*Cin) -> (3, 3, Cin, Cout); the lane layout was chosen so
    # this is a pure (reshape, transpose) view.
    return dwt.reshape(cout, 3, 3, cin).transpose(1, 2, 3, 0)


def _conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3p1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1/pad-1 NHWC conv whose backward routes the filter
    gradient through the Pallas dWT kernel (forward and dX stay
    XLA-native convs — they already run at forward MFU)."""
    return _conv(x, w)


def _fwd(x, w):
    return _conv(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dX: conv of g with the spatially-flipped, IO-swapped kernel —
    # exactly XLA's own transpose of a stride-1 SAME conv.
    wt = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dx = _conv(g, wt).astype(x.dtype)
    dw = dw_conv3x3p1(x, g).astype(w.dtype)
    return dx, dw


conv3x3p1.defvjp(_fwd, _bwd)
