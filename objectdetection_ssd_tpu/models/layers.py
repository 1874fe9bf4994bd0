"""Building-block layers with exact torch-convolution spatial semantics.

The SSD300 feature pyramid only lines up with the 8732-prior grid if every
conv/pool reproduces torch's output-size arithmetic
(out = floor((in + 2p - k)/s) + 1).  XLA's 'SAME' padding places windows
differently for some stride-2 cases (e.g. 10 -> 5 pads (0,1) where torch pads
(1,1)), which would silently misalign imported pretrained weights — so every
layer here uses explicit symmetric padding.

Layout is NHWC throughout (TPU-native); the reference is NCHW
(`Model.py:203-235`) but only channel order at the head reshape matters for
parity, and NHWC reshape matches torch's permute(0,2,3,1)+view flattening.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Xavier-uniform + zero bias: the reference's init for all non-backbone convs
# (`Model.py:198-200`).
xavier_conv_kwargs = dict(
    kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros,
)


def _ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through gradient (identity VJP) — the
    standard QAT estimator for the zero-gradient rounding step."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


class Int8Conv(nn.Module):
    """Int8 post-training-quantized conv, param-path-compatible with the
    ``nn.Conv`` child of `TorchConv` (same ``kernel``/``bias`` names and
    shapes, so a trained f32 checkpoint drives it unchanged).

    Math (standard symmetric PTQ):
      * weights per-OUTPUT-channel: ``s_w[c] = absmax(w[..., c]) / 127``,
        quantized at trace time from the f32 params — under AOT export the
        int8 weights constant-fold into the artifact;
      * activations per-tensor with a CALIBRATED scale (`infer/quant.py`):
        ``x_q = clip(round(x / s_a), -127, 127)``;
      * int8 x int8 -> int32 convolution on the MXU
        (``preferred_element_type=int32`` — v5e int8 peak is 2x bf16),
        then one f32 rescale by ``s_a * s_w`` fused with the bias add.

    ``straight_through=True`` is the QAT (quantization-aware training)
    mode: the SAME quantization math expressed differentiably — values are
    fake-quantized in f32 (``ste_round(clip(v/s)) * s``, identical numbers
    to the int8 path up to f32 rounding) and the conv runs f32 so the
    rounding passes gradients straight through while clip saturation
    zeroes them (standard STE).  Scales are stop-gradiented (treated as
    calibrated constants).

    Requant CHAINING (round-4 throughput fix, `infer/quant.py:chain_scales`):
      * int8 INPUT — an ``x`` already in int8 is taken as pre-quantized in
        THIS conv's activation scale (the upstream conv emitted it);
      * int8 OUTPUT — when ``out_scale`` (the NEXT conv's activation
        scale) is given, the epilogue requantizes straight to int8:
        ``clip(round(y/s_next))`` — one fused rescale, no bf16/f32
        materialization between chained convs (HALF the inter-conv HBM
        bytes, and the next conv's separate quantize pass disappears).
        EXACT by construction: ``y`` is first rounded through the compute
        dtype exactly as the unchained path materializes it, and
        relu/max-pool between convs commute with symmetric quantization
        (monotone; pinned bit-for-bit in tests/test_quant.py).
      * QAT (``straight_through``) ignores ``out_scale`` — chaining is an
        inference-graph rewrite with identical numbers, so QAT-trained
        scales serve chained unchanged.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    straight_through: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 act_scale: jnp.ndarray,
                 out_scale: jnp.ndarray = None) -> jnp.ndarray:
        w = self.param(
            "kernel", self.kernel_init,
            (self.kernel, self.kernel, x.shape[-1], self.features))
        w = w.astype(jnp.float32)
        s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0        # (out,)
        s_w = jnp.maximum(s_w, 1e-12)
        s_a = jnp.maximum(act_scale.astype(jnp.float32), 1e-12)
        p = self.padding
        conv_kw = dict(
            window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.straight_through:
            s_w = jax.lax.stop_gradient(s_w)
            s_a = jax.lax.stop_gradient(s_a)
            w_fq = _ste_round(jnp.clip(w / s_w, -127, 127)) * s_w
            x_fq = _ste_round(jnp.clip(x.astype(jnp.float32) / s_a,
                                       -127, 127)) * s_a
            y = jax.lax.conv_general_dilated(x_fq, w_fq, **conv_kw)
        else:
            w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
            if x.dtype == jnp.int8:
                # Chained input: the upstream conv already emitted int8 in
                # THIS conv's activation scale (out_scale threading,
                # infer/quant.py:chain_scales).
                x_q = x
            else:
                x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a),
                               -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x_q, w_q, preferred_element_type=jnp.int32, **conv_kw)
            y = y.astype(jnp.float32) * (s_a * s_w)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init,
                               (self.features,)).astype(jnp.float32)
        y = y.astype(self.dtype)
        if out_scale is not None and not self.straight_through:
            # Chained output: requantize the epilogue straight to the NEXT
            # conv's int8 domain.  Rounding through self.dtype FIRST keeps
            # this bit-identical to the unchained path (which materializes
            # y in the compute dtype before the next conv quantizes it).
            s_o = jnp.maximum(out_scale.astype(jnp.float32), 1e-12)
            return jnp.clip(jnp.round(y.astype(jnp.float32) / s_o),
                            -127, 127).astype(jnp.int8)
        return y


class _DWPallasConv(nn.Module):
    """3x3/s1/p1 conv routed through the Pallas filter-gradient kernel
    (`ops/dw_pallas.py`) — identical forward and dX (XLA-native convs),
    custom dW.  Param-path-compatible with the ``nn.Conv`` child of
    `TorchConv` (same ``Conv_0/{kernel,bias}`` names/shapes)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from objectdetection_ssd_tpu.ops import dw_pallas
        w = self.param("kernel", self.kernel_init,
                       (3, 3, x.shape[-1], self.features))
        y = dw_pallas.conv3x3p1(x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            y = y + self.param("bias", self.bias_init,
                               (self.features,)).astype(self.dtype)
        return y


class TorchConv(nn.Module):
    """Conv2D with torch-style symmetric explicit padding and dilation.

    ``dw_pallas``: route the backward's FILTER gradient through the Pallas
    tap-matrix kernel (`ops/dw_pallas.py`).  MEASURED NEGATIVE — the
    round-4 full-graph A/B has XLA native at 177 ms/step vs 293 ms with
    the kernel (benchmarks/RESULTS.md "Pallas dW kernel"); the flag stays
    for the documented experiment, default OFF everywhere.
    3x3/stride-1/pad-1 geometry only; ignored when a quant collection
    selects the int8/QAT path (inference graphs have no dW).

    Quantization hooks (see `infer/quant.py`):
      * calibration — applying the model with ``mutable=["quant_stats"]``
        records this conv's input absmax (running max across calls, so a
        weight-shared module applied at several taps gets ONE covering
        scale);
      * int8 inference — when the caller passes a ``"quant"`` variable
        collection holding an ``act_scale`` for this module's path, the
        conv runs as `Int8Conv` (identical param tree) instead of f32.
        Convs whose path has no ``act_scale`` stay f32, which is how the
        head-exclusion policy is expressed.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dw_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # No-op unless the caller made "quant_stats" mutable (calibration).
        # Degenerate-geometry models (tiny image sizes where a VALID
        # pyramid conv sees a zero-sized input) still initialize: max over
        # an empty array is a ValueError, so sow 0 for them (static shape
        # check, free at trace time).
        absmax = (jnp.max(jnp.abs(x.astype(jnp.float32)))
                  if x.size else jnp.zeros(()))
        self.sow("quant_stats", "absmax", absmax,
                 init_fn=lambda: jnp.zeros(()), reduce_fn=jnp.maximum)
        geo = dict(features=self.features, kernel=self.kernel,
                   stride=self.stride, padding=self.padding,
                   dilation=self.dilation, use_bias=self.use_bias,
                   dtype=self.dtype, kernel_init=self.kernel_init,
                   bias_init=self.bias_init)
        if self.has_variable("quant", "act_scale"):
            # Optional chained-epilogue scale (the NEXT conv's act_scale);
            # present only on edges infer/quant.py:chain_scales marked.
            out_scale = (self.get_variable("quant", "out_scale")
                         if self.has_variable("quant", "out_scale") else None)
            return Int8Conv(name="Conv_0", **geo)(
                x, self.get_variable("quant", "act_scale"), out_scale)
        if self.has_variable("quant_ste", "act_scale"):
            # QAT: same scales under a different collection name select the
            # differentiable fake-quant path (see infer/quant.py).
            return Int8Conv(name="Conv_0", straight_through=True, **geo)(
                x, self.get_variable("quant_ste", "act_scale"))
        if (self.dw_pallas and self.kernel == 3 and self.stride == 1
                and self.padding == 1 and self.dilation == 1):
            return _DWPallasConv(
                name="Conv_0", features=self.features,
                use_bias=self.use_bias, dtype=self.dtype,
                kernel_init=self.kernel_init, bias_init=self.bias_init)(x)
        p = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="Conv_0",
        )(x)


def max_pool(x: jnp.ndarray, window: int, stride: int,
             padding: int = 0, ceil_mode: bool = False) -> jnp.ndarray:
    """Max pool with torch semantics, including ceil_mode.

    torch's ceil_mode pool (reference pool3, `Model.py:137`) extends the
    output grid to ceil((in + 2p - k)/s) + 1 by implicitly padding the
    bottom/right edge; padded lanes never win the max because we pad with
    -inf.  Plain padding (reference pool5's padding=1, `Model.py:142`) is
    also -inf in torch max-pooling.
    """
    h, w = x.shape[1], x.shape[2]

    def pad_amounts(size: int) -> Tuple[int, int]:
        lo = padding
        if ceil_mode:
            out = -(-(size + 2 * padding - window) // stride) + 1
        else:
            out = (size + 2 * padding - window) // stride + 1
        hi = max((out - 1) * stride + window - size - lo, 0)
        return lo, hi

    pads = (pad_amounts(h), pad_amounts(w))  # spatial dims only
    if jnp.issubdtype(x.dtype, jnp.integer):
        # int8 pooling (requant-chained inference, `Int8Conv` docstring):
        # max-pool commutes with monotone symmetric quantization, so the
        # chained graph pools the int8 tensor directly — half the HBM
        # bytes through the pool.  flax's nn.max_pool initializes with
        # -inf (float-only); integers need the dtype's own identity, and
        # the padding value (INT_MIN) can never win against real values
        # (int8 quant output is clipped to [-127, 127]).
        return jax.lax.reduce_window(
            x, jnp.array(jnp.iinfo(x.dtype).min, x.dtype), jax.lax.max,
            (1, window, window, 1), (1, stride, stride, 1),
            ((0, 0), pads[0], pads[1], (0, 0)))
    # Perf note (measured on v5e, bs=128 full train step): leaving this as
    # reduce_window is FASTER (690 img/s) than a reshape+max formulation of
    # the non-overlapping pools (637 img/s) — JAX lowers the max-pool
    # gradient via select_and_gather_add (not SelectAndScatter), which fuses
    # well in the full backward graph, while the reshape breaks XLA's conv
    # layout assignment.
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=pads)


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learnable per-channel rescale.

    Matches the reference conv4_3 treatment (`Model.py:132-133,206-210`):
    x / ||x||_2(channels) * scale, scale initialized to 20.
    """

    scale_init: float = 20.0
    epsilon: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.scale_init, jnp.float32),
            (x.shape[-1],))
        # Channel sum-of-squares as a matvec with a ones-vector.  Channels
        # are the minor (lane) dim; a standalone jnp.sum reduce over lanes
        # lowers pathologically on TPU (72 ms vs 5.9 ms for this dot at
        # (256, 38, 38, 512), bit-identical output).  Inside the full model
        # graph XLA fuses the reduce into the conv epilogue so e2e is a
        # wash either way — the dot form is kept because it is robust to
        # fusion context (and its VJP is dots too).
        sumsq = jax.lax.dot_general(
            jnp.square(x.astype(jnp.float32)),
            jnp.ones((x.shape[-1],), jnp.float32),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        norm = jnp.sqrt(sumsq + self.epsilon)[..., None]
        return (x / norm.astype(x.dtype)) * scale.astype(x.dtype)


def flatten_head(x: jnp.ndarray, last: int) -> jnp.ndarray:
    """(B, H, W, k*last) -> (B, H*W*k, last).

    Equivalent to the reference's permute(0,2,3,1)+view (`Model.py:212`):
    rows ordered by (row, col, anchor), matching prior-generation order.
    """
    b = x.shape[0]
    return x.reshape(b, -1, last)
