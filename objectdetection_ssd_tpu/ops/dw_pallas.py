"""Pallas filter-gradient (dW) kernel for 3x3 / stride-1 / pad-1 convs.

VERDICT (round-4, measured): NEGATIVE — do not enable in production.
The kernel is numerically correct on hardware (max rel err ~5e-4 vs the
XLA filter gradient) but loses the full-graph A/B decisively: 177 ms/step
XLA native vs 293 ms with the kernel at bs=128 (copy-bound: the per-step
pad/roll/concat shuffles dwarf the one small dot; full post-mortem in
benchmarks/RESULTS.md "Pallas dW kernel: a rigorous NEGATIVE result").
Kept in-tree, default-off (`ModelConfig.dw_pallas_convs = ()`), as the
documented experiment that retired the "maybe a hand kernel would fix
conv1_2's dW" question.

Why this exists (round-4 measurement, benchmarks/dw_experiment.py): the
train step's backward runs at ~62% MFU and the per-layer stop-gradient
attribution ladder localized the waste to the CONV1 BLOCK's filter
gradients — ~13.2 ms/step at bs=128 where the FLOP-ideal is ~4.3 ms
(~33% MFU), while conv2-conv5/fc dW all measure 84-106%.  The cause is
MXU tiling: a filter gradient contracts over batch*spatial (huge K) into
a tiny (3*3*Cin, Cout) output; with Cin=Cout=64 both output dims sit at
half a 128-lane tile, and XLA's chosen layout leaves the array mostly
idle.

Design (v4 — v1's halo-DMA/im2col kernel was rejected by Mosaic on real
hardware: DMA slices over tile-PADDED trailing dims must be tile-aligned,
"Slice shape along dimension 2 must be aligned to tiling (8), but is
300", and even aligned-W manual DMAs of a 64-lane array fail; v2/v3's
whole-image blocks + in-kernel chunking blew the 128 MB VMEM because
64-channel residents lane-pad to 128.  Every constraint below was
probe-verified on the chip; the probe matrix is archived in
benchmarks/RESULTS.md):

  * Grid = (image, row-chunk).  Each step gets its g chunk plus THREE
    blocks of the same x input — the chunk and its row neighbors via
    clamped index maps — because a one-row halo cannot be loaded any
    other way (partial/dynamic loads of a block's row dim don't lower).
    x streams from HBM 3x (part of why it loses — see VERDICT).
  * Each block is flattened to a 2D ``(rows * Wp, C)`` value (W
    zero-padded to a sublane-aligned Wp first, so the collapse reshape
    is a probe-legal aligned one).  In flat space BOTH conv taps become
    static sublane ROLLS: a column tap is a roll by +-1, a row tap a
    roll by +-Wp.  Roll wraparound lands exclusively on zero padding
    (the W pad columns and the zero halo rows), so SAME-pad semantics
    need no masks beyond the image-edge halo zeroing.
  * The 9 (ky, kx) taps factor as ONE dot: A = lane-concat of the 3
    kx-rolled x chunks ``(flat, 3*Cin)``, B = lane-concat of the 3
    ky-rolled g chunks ``(flat, 3*Cout)``, and ``A^T B`` is the
    ``(3*Cin, 3*Cout)`` tap matrix — for 64-channel convs that is
    192x192, 75% x 75% MXU tile occupancy vs XLA's (576, 64) layout at
    50% on the lane axis.  f32 accumulation across chunks and images.

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


def _pick_hb(h: int) -> int:
    """Largest divisor of ``h`` <= 32 — bounds the per-chunk VMEM patch
    while keeping the zero-halo row overhead ((hb+2)/hb FLOPs) small."""
    best = 1
    for hb in range(1, min(h, 32) + 1):
        if h % hb == 0:
            best = hb
    return best


def _flat(ref, w, wp, c):
    """Block (1, hb, w, c) -> zero-padded flat (hb*wp, c) value."""
    hb = ref.shape[1]
    return jnp.pad(ref[0], ((0, 0), (0, wp - w), (0, 0))).reshape(
        hb * wp, c)


def _dwt_kernel(xu_ref, xc_ref, xd_ref, g_ref, out_ref, *, nj: int,
                w: int, wp: int, cin: int, cout: int):
    """One (image, row-chunk) step: accumulate the (3*Cin, 3*Cout) tap
    matrix.  All shifts are sublane rolls of flattened (rows*Wp, C)
    values whose wrap regions land on zero padding by construction.

    Mosaic constraints that shaped this (probe-verified on hardware,
    benchmarks/RESULTS.md):  partial/dynamic loads of a block's row dim
    and `lax.dynamic_slice` on values don't lower, and a Python-unrolled
    chunk loop stacks every iteration's temporaries simultaneously (no
    reuse) — so chunking lives on the GRID, and the one-row halos come
    from NEIGHBOR blocks of the same x input (clamped index maps, edge
    rows masked to zero), at the price of streaming x thrice."""
    n = pl.program_id(0)
    j = pl.program_id(1)
    hb = xc_ref.shape[1]
    top = _flat(xu_ref, w, wp, cin)[(hb - 1) * wp:]          # (wp, cin)
    top = jnp.where(j > 0, top, 0)
    bot = _flat(xd_ref, w, wp, cin)[:wp]
    bot = jnp.where(j < nj - 1, bot, 0)
    xf = jnp.concatenate([top, _flat(xc_ref, w, wp, cin), bot], axis=0)
    gf = jnp.pad(_flat(g_ref, w, wp, cout), ((wp, wp), (0, 0)))

    # A[p, (kx, ci)] = x[p + kx - 1]; B[p, (ky, co)] = g[p - (ky-1)*Wp]
    # => (A^T B)[(kx,ci),(ky,co)] = sum_r x[r+(ky-1)*Wp+kx-1] * g[r].
    # jnp.roll with shift 0 lowers to a zero-size slice Mosaic rejects —
    # pass the unshifted value through directly.
    def _roll(v, s):
        return jnp.roll(v, s, axis=0) if s else v

    a = jnp.concatenate([_roll(xf, 1 - kx) for kx in range(3)], axis=1)
    b = jnp.concatenate([_roll(gf, (ky - 1) * wp)
                         for ky in range(3)], axis=1)
    acc = lax.dot_general(a, b, (((0,), (0,)), ((), ())),
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
    # >=1 zero pad column (roll wrap target), sublane-aligned for the
    # collapse reshape (16 covers both f32 (8) and bf16 (16) tiling).
    wp = ((w + 1 + 15) // 16) * 16
    hb = _pick_hb(h)
    nj = h // hb
    kern = functools.partial(_dwt_kernel, nj=nj, w=w, wp=wp,
                             cin=cin, cout=cout)
    xspec = lambda f: pl.BlockSpec(                     # noqa: E731
        (1, hb, w, cin), lambda i, j: (i, f(j), 0, 0),
        memory_space=pltpu.VMEM)
    taps = pl.pallas_call(
        kern,
        grid=(n, nj),
        in_specs=[
            xspec(lambda j: jnp.maximum(j - 1, 0)),     # row-above halo
            xspec(lambda j: j),
            xspec(lambda j: jnp.minimum(j + 1, nj - 1)),  # row-below halo
            pl.BlockSpec((1, hb, w, cout), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * cin, 3 * cout), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * cin, 3 * cout), jnp.float32),
        # One chunk's flats + tap concats can exceed the 16 MB default
        # scoped-VMEM budget at 64 channels (lane padding to 128 doubles
        # every resident); well under the chip's 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * cin * cout,
            bytes_accessed=int(x.size * x.dtype.itemsize
                               + g.size * g.dtype.itemsize),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(x, x, x, g)
    # (3*Cin, 3*Cout) = [(kx, ci), (ky, co)] -> (ky, kx, ci, co).
    return taps.reshape(3, cin, 3, cout).transpose(2, 0, 1, 3)


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
