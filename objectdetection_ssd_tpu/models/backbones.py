"""Feature-extractor trunks: VGG-16 (SSD300 flavor) and ResNet-34.

These are new Flax/NHWC designs that reproduce the *feature-map geometry*
the reference obtains from torchvision trunks:

* VGG-16 (`Model.py:131-162`): conv1_1..conv4_3 with a ceil-mode pool3 so
  300 -> 150 -> 75 -> 38; conv4_3 tap at 38x38x512; pool4 -> 19; conv5 block;
  3x3-stride-1 pool5; atrous conv_fc6 (3x3, dilation 4, padding 4) and 1x1
  conv_fc7 -> 19x19x1024.  The fc6/fc7 layers are convs whose pretrained
  weights come from subsampling VGG's fully-connected layers
  (`Model.py:145-161`, see models/convert.py).

* ResNet-34 (`Model.py:21-30`): 7x7/2 stem + maxpool, stages [3,4,6,3] with
  channels [64,128,256,512]; the reference runs it frozen under
  torch.no_grad() (`Model.py:81-86`), reproduced via stop_gradient.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from objectdetection_ssd_tpu.models.layers import TorchConv, max_pool

Dtype = Any

# Names attached to trunk activations for remat policies (transparent in
# normal execution — they only matter under `jax.checkpoint`):
#   VGG_STAGE_CKPT — stage boundaries (pool outputs + SSD taps).
#     `save_only_these_names(VGG_STAGE_CKPT)` = full-trunk remat: measured
#     WORSE than plain XLA at bs=256 (556 vs 668 img/s — the recompute
#     exceeds the spill it saves; benchmarks/RESULTS.md round 3).
#   VGG_HIRES_CKPT — conv1/conv2 interiors, the largest activations
#     (300^2 x 64 and 150^2 x 128) with the cheapest recompute.
#     `save_anything_except_these_names(VGG_HIRES_CKPT)` = surgical remat:
#     ONLY those are recomputed — what train/loop.py's --remat uses.
VGG_STAGE_CKPT = "vgg_stage_boundary"
VGG_HIRES_CKPT = "vgg_hires_interior"


# Param names per VGG stage — used both for the stop_gradient cut below and
# for the optimizer's zero-update mask (train/state.py).
VGG_STAGE_PARAMS = (
    ("conv1_1", "conv1_2"),
    ("conv2_1", "conv2_2"),
    ("conv3_1", "conv3_2", "conv3_3"),
    ("conv4_1", "conv4_2", "conv4_3"),
    ("conv5_1", "conv5_2", "conv5_3", "conv_fc6", "conv_fc7"),
)


def vgg_frozen_prefixes(freeze_stages: int) -> Tuple[str, ...]:
    """Slash-joined param prefixes for the first ``freeze_stages`` stages."""
    out = []
    for stage in VGG_STAGE_PARAMS[:freeze_stages]:
        out.extend(f"trunk/{name}" for name in stage)
    return tuple(out)


def apply_vgg_stages(carry, *, first: int = 1, last: int = 5,
                     dtype: Dtype = jnp.float32, freeze_stages: int = 0,
                     dw_pallas_convs: Tuple[str, ...] = ()):
    """Apply VGG-16 stages ``[first..last]`` (1-based, inclusive).

    Must run inside an ``nn.compact`` ``__call__`` — the TorchConv
    submodules register on the CALLER, so both the monolithic `VGG16Trunk`
    and the pipeline-parallel trunk slices (`parallel/pipeline.py`) share
    this ONE implementation and one param-name layout; a slice chain can
    never drift from the monolith's forward.

    Stage map (geometry for 300x300 inputs, reference `Model.py:131-162`):
      1: conv1_1-2 + pool          -> (B, 150, 150,  64)
      2: conv2_1-2 + pool          -> (B,  75,  75, 128)
      3: conv3_1-3 + ceil pool     -> (B,  38,  38, 256)   (Model.py:137)
      4: conv4_1-3                 -> conv4_3 tap (B, 38, 38, 512)
      5: pool4 + conv5_1-3 + 3x3/1 pool5 + atrous fc6 + fc7
                                   -> (B, 19, 19, 1024)    (Model.py:142-162)

    Carry contract at each possible cut: input is ``x`` for ``first <= 4``
    and the ``conv4_3`` tap for ``first == 5``; output is ``x`` for
    ``last <= 3``, ``conv4_3`` for ``last == 4``, and the SSD tap pair
    ``(conv4_3, x)`` for ``last == 5`` (conv4_3 is what stage 5 pools, so
    a 4|5 cut carries exactly one tensor).
    """

    def block(x, features, n, name, mark=None):
        for i in range(n):
            conv_name = f"{name}_{i + 1}"
            x = TorchConv(features, kernel=3, padding=1, dtype=dtype,
                          dw_pallas=conv_name in dw_pallas_convs,
                          name=conv_name)(x)
            x = nn.relu(x)
            if mark:
                x = checkpoint_name(x, mark)
        return x

    def cut(x, stage):
        return jax.lax.stop_gradient(x) if freeze_stages >= stage else x

    x = carry
    conv4_3 = carry if first == 5 else None
    if first <= 1 <= last:
        x = block(x, 64, 2, "conv1", mark=VGG_HIRES_CKPT)
        x = cut(x, 1)
        x = checkpoint_name(max_pool(x, 2, 2), VGG_STAGE_CKPT)  # 300 -> 150
    if first <= 2 <= last:
        x = block(x, 128, 2, "conv2", mark=VGG_HIRES_CKPT)
        x = cut(x, 2)
        x = checkpoint_name(max_pool(x, 2, 2), VGG_STAGE_CKPT)  # 150 -> 75
    if first <= 3 <= last:
        x = block(x, 256, 3, "conv3")
        x = cut(x, 3)
        # 75 -> 38 (ceil-mode, Model.py:137)
        x = checkpoint_name(max_pool(x, 2, 2, ceil_mode=True), VGG_STAGE_CKPT)
    if first <= 4 <= last:
        x = block(x, 512, 3, "conv4")
        x = cut(x, 4)
        conv4_3 = checkpoint_name(x, VGG_STAGE_CKPT)  # (B, 38, 38, 512)
    if last < 4:
        return x
    if last == 4:
        return conv4_3

    x = max_pool(conv4_3, 2, 2)                 # 38 -> 19
    x = block(x, 512, 3, "conv5")
    x = max_pool(x, 3, 1, padding=1)            # 19 -> 19 (Model.py:142)

    # Atrous fc6/fc7-as-convs (Model.py:149-162).
    x = TorchConv(1024, kernel=3, padding=4, dilation=4,
                  dtype=dtype, name="conv_fc6")(x)
    x = nn.relu(x)
    x = TorchConv(1024, kernel=1, dtype=dtype, name="conv_fc7")(x)
    x = nn.relu(x)
    return conv4_3, checkpoint_name(cut(x, 5), VGG_STAGE_CKPT)


class VGG16Trunk(nn.Module):
    """VGG-16 features through conv_fc7, returning the two SSD taps.

    Returns (conv4_3 tap (B,38,38,512) BEFORE L2-norm, fc7 tap (B,19,19,1024)).
    The stage graph lives in `apply_vgg_stages` (shared with the pipeline
    slices).

    ``freeze_stages``: freeze the first N conv stages (1=conv1, ... 5=whole
    trunk incl. fc6/fc7) via stop_gradient at the stage boundary — the
    standard fine-tuning recipe when starting from pretrained weights, and
    the VGG analog of the reference's fully-frozen ResNet trunk
    (`Model.py:81-86`).  Cutting at the boundary makes XLA drop the frozen
    stages' entire backward sweep (their dW convs and the dX chain below),
    a large train-step saving since the early high-resolution convs
    dominate backward cost.  Pair with the optimizer mask
    (`vgg_frozen_prefixes` -> `create_train_state(frozen_prefixes=...)`) so
    the frozen params also skip weight decay.
    """

    dtype: Dtype = jnp.float32
    freeze_stages: int = 0
    # Trunk conv names (e.g. "conv1_2") whose filter gradient routes
    # through the Pallas dWT kernel — see TorchConv.dw_pallas.
    dw_pallas_convs: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return apply_vgg_stages(x, first=1, last=5, dtype=self.dtype,
                                freeze_stages=self.freeze_stages,
                                dw_pallas_convs=self.dw_pallas_convs)


class BasicBlock(nn.Module):
    """ResNet v1 basic block (two 3x3 convs + identity/projection)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        residual = x
        y = TorchConv(self.features, kernel=3, stride=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = TorchConv(self.features, kernel=3, padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        if residual.shape != y.shape:
            residual = TorchConv(self.features, kernel=1, stride=self.stride,
                                 use_bias=False, dtype=self.dtype,
                                 name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet34Trunk(nn.Module):
    """ResNet-34 trunk; returns the final 512-channel stage output.

    For 224x224 inputs the stage outputs are 56/28/14/7 px, matching the
    reference's seq1..seq5 taps (`Model.py:82-86`).
    """

    dtype: Dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = TorchConv(64, kernel=7, stride=2, padding=3, use_bias=False,
                      dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)
        for s, (n, f) in enumerate(zip(self.stage_sizes, self.stage_features)):
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                x = BasicBlock(f, stride=stride, dtype=self.dtype,
                               name=f"layer{s + 1}_block{b + 1}")(x, train)
        return x
