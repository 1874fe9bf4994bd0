"""SSD detection networks: SSD300 (VGG-16) and the ResNet-34 variant.

Both compile to a single XLA forward graph producing
``(loc (B, P, 4), conf (B, P, num_classes))`` exactly like the reference's
`SSD_300.forward` / `SSD_resnet34.forward` (`Model.py:203-235`, `Model.py:72-126`).

SSD300 structure (reference `Model.py:128-235`):
  * VGG trunk taps conv4_3 (38x38x512, L2-normalized + learnable rescale
    init 20) and conv_fc7 (19x19x1024);
  * extra pyramid: seq8 (1x1 1024->256, 3x3/2 ->512, 10x10), seq9 (1x1
    512->128, 3x3/2 ->256, 5x5), seq10/seq11 (1x1 ->128, VALID 3x3 ->256,
    3x3 then 1x1);
  * per-tap 3x3 loc/conf heads with k = [4, 6, 6, 6, 4, 4] anchors/cell,
    Xavier-uniform weights, zero biases (`Model.py:168-200`);
  * head outputs flattened (row, col, anchor)-major and concatenated in tap
    order -> 8732 rows aligned with `ops.priors.ssd300_priors`.

ResNet-34 variant (reference `Model.py:12-126`): frozen trunk, 3x3 neck
convs (Conv->ReLU->BN->Dropout blocks, with the reference's stride-2 neck
conv applied TWICE with shared weights, `Model.py:91-96`), heads at
4x4/2x2/1x1 taps; conf-head biases init to -2 (`Model.py:39`).  The
reference ships k=3 heads that contradict its own 189-anchor generator
(SURVEY.md §2 row 13); here k defaults to 9 so the model and the zoom/ratio
prior generator (`ops.priors.zoom_ratio_priors`) agree; k=3 reproduces the
reference heads verbatim.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from objectdetection_ssd_tpu.config import (IMAGENET_MEAN, IMAGENET_STD,
                                            ModelConfig, NUM_CLASSES_WITH_BG)
from objectdetection_ssd_tpu.models.backbones import ResNet34Trunk, VGG16Trunk
from objectdetection_ssd_tpu.models.layers import (L2Norm, TorchConv,
                                                   flatten_head,
                                                   xavier_conv_kwargs)

Dtype = Any


def prepare_input(x: jnp.ndarray, dtype: Dtype) -> jnp.ndarray:
    """Model input adapter: uint8 RGB -> ImageNet-normalized activations.

    The data pipeline ships batches as RAW uint8 by default
    (`DataConfig.transfer_dtype`): 4x less host->device traffic than
    normalized float32, and it matches the reference even more closely —
    torchvision's ToTensor reads a uint8 PIL image, so the reference's
    inputs are uint8-quantized too (`Dataset.py:10-13`).  Normalization
    runs here in f32 (XLA fuses it into the first conv) before casting to
    the compute dtype; float inputs are treated as already normalized and
    pass through.
    """
    if x.dtype == jnp.uint8:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x.astype(jnp.float32) * (1.0 / 255.0) - mean) / std
    return x.astype(dtype)


def ssd300_post_trunk(conv4_3: jnp.ndarray, x: jnp.ndarray, *,
                      num_classes: int, l2_norm_scale_init: float,
                      dtype: Dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Everything after the VGG trunk: L2Norm, extra pyramid, heads.

    A free function (must run inside an ``nn.compact`` ``__call__``) so the
    monolithic `SSD300` and the pipeline-parallel stage module
    (`parallel/pipeline.py:SSD300HeadStage`) share ONE implementation and
    one param-name layout — the stage split can never drift from the
    flagship forward.
    """
    conv4_3 = L2Norm(scale_init=l2_norm_scale_init,
                     name="l2norm_4_3")(conv4_3)

    def extra(x, mid, out, stride, padding, name):
        x = TorchConv(mid, kernel=1, dtype=dtype,
                      name=f"{name}_1", **xavier_conv_kwargs)(x)
        x = nn.relu(x)
        x = TorchConv(out, kernel=3, stride=stride, padding=padding,
                      dtype=dtype, name=f"{name}_2",
                      **xavier_conv_kwargs)(x)
        return nn.relu(x)

    taps: List[Tuple[jnp.ndarray, int]] = [(conv4_3, 4), (x, 6)]
    x = extra(x, 256, 512, 2, 1, "seq8")      # 19 -> 10
    taps.append((x, 6))
    x = extra(x, 128, 256, 2, 1, "seq9")      # 10 -> 5
    taps.append((x, 6))
    x = extra(x, 128, 256, 1, 0, "seq10")     # 5 -> 3 (VALID)
    taps.append((x, 4))
    x = extra(x, 128, 256, 1, 0, "seq11")     # 3 -> 1 (VALID)
    taps.append((x, 4))

    locs, confs = [], []
    for i, (tap, k) in enumerate(taps):
        loc = TorchConv(4 * k, kernel=3, padding=1, dtype=dtype,
                        name=f"loc_head_{i}", **xavier_conv_kwargs)(tap)
        conf = TorchConv(num_classes * k, kernel=3, padding=1,
                         dtype=dtype, name=f"conf_head_{i}",
                         **xavier_conv_kwargs)(tap)
        locs.append(flatten_head(loc, 4))
        confs.append(flatten_head(conf, num_classes))
    return (jnp.concatenate(locs, axis=1),
            jnp.concatenate(confs, axis=1))


class SSD300(nn.Module):
    """VGG-16 SSD300. Input (B, 300, 300, 3) -> ((B, 8732, 4), (B, 8732, C))."""

    num_classes: int = NUM_CLASSES_WITH_BG
    l2_norm_scale_init: float = 20.0
    dtype: Dtype = jnp.float32
    # Freeze the first N VGG stages (fine-tuning from pretrained weights);
    # see VGG16Trunk.freeze_stages.
    freeze_stages: int = 0
    # Trunk convs whose filter gradient routes through the Pallas dWT
    # kernel (train-step MFU fix for the conv1 block — see
    # ops/dw_pallas.py and ModelConfig.dw_pallas_convs).
    dw_pallas_convs: Tuple[str, ...] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del train  # no BN/dropout in this architecture
        x = prepare_input(x, self.dtype)
        conv4_3, x = VGG16Trunk(dtype=self.dtype,
                                freeze_stages=self.freeze_stages,
                                dw_pallas_convs=self.dw_pallas_convs,
                                name="trunk")(x)
        return ssd300_post_trunk(
            conv4_3, x, num_classes=self.num_classes,
            l2_norm_scale_init=self.l2_norm_scale_init, dtype=self.dtype)


class _NeckBlock(nn.Module):
    """Conv -> ReLU -> BN -> Dropout2d (reference `Model.py:56-62`)."""

    features: int
    stride: int = 1
    dropout_rate: float = 0.4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = TorchConv(self.features, kernel=3, stride=self.stride, padding=1,
                      dtype=self.dtype, name="conv")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(x)
        # Dropout2d drops whole channels (torch semantics).
        x = nn.Dropout(self.dropout_rate,
                       broadcast_dims=(1, 2),
                       deterministic=not train, name="drop")(x)
        return x


class _LocHead(nn.Module):
    """Conv -> BN -> Dropout2d, no ReLU (reference `conv2d_final`,
    `Model.py:64-70`)."""

    out: int
    dropout_rate: float = 0.4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = TorchConv(self.out, kernel=3, padding=1, dtype=self.dtype,
                      name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(x)
        x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train, name="drop")(x)
        return x


class SSDResNet34(nn.Module):
    """ResNet-34 SSD variant. Input (B, 224, 224, 3) -> ((B, P, 4), (B, P, C));
    P = 21*k (k=9 -> 189 anchors, matching `zoom_ratio_priors`)."""

    num_classes: int = NUM_CLASSES_WITH_BG
    k: int = 9
    dropout_rate: float = 0.4
    freeze_backbone: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = prepare_input(x, self.dtype)
        feats = ResNet34Trunk(dtype=self.dtype, name="trunk")(
            x, train=train and not self.freeze_backbone)   # (B, 7, 7, 512)
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)           # Model.py:81-86

        feats = nn.Dropout(self.dropout_rate, deterministic=not train,
                           name="trunk_drop")(nn.relu(feats))
        x = _NeckBlock(256, stride=1, dropout_rate=self.dropout_rate,
                       dtype=self.dtype, name="neck0")(feats, train)   # 7x7
        # The reference applies its single stride-2 neck conv twice with the
        # SAME weights (`Model.py:91-96`); reproduced via module reuse.
        down = _NeckBlock(256, stride=2, dropout_rate=self.dropout_rate,
                          dtype=self.dtype, name="neck_down")
        x4 = down(x, train)                                # 4x4
        x2 = down(x4, train)                               # 2x2
        x1 = _NeckBlock(256, stride=2, dropout_rate=self.dropout_rate,
                        dtype=self.dtype, name="neck_down2")(x2, train)  # 1x1

        conf_bias_init = nn.initializers.constant(-2.0)    # Model.py:39
        locs, confs = [], []
        for name, tap in (("t4", x4), ("t2", x2), ("t1", x1)):
            loc = _LocHead(4 * self.k, dropout_rate=self.dropout_rate,
                           dtype=self.dtype, name=f"loc_{name}")(tap, train)
            conf = TorchConv(self.num_classes * self.k, kernel=3, padding=1,
                             dtype=self.dtype, bias_init=conf_bias_init,
                             name=f"conf_{name}")(tap)
            locs.append(flatten_head(loc, 4))
            confs.append(flatten_head(conf, self.num_classes))
        return (jnp.concatenate(locs, axis=1),
                jnp.concatenate(confs, axis=1))


def build_model(config: ModelConfig) -> nn.Module:
    """Model registry keyed on ``config.backbone``."""
    dtype = jnp.dtype(config.compute_dtype)
    if config.backbone == "vgg16":
        return SSD300(num_classes=config.num_classes,
                      l2_norm_scale_init=config.l2_norm_scale_init,
                      freeze_stages=config.freeze_stages,
                      dw_pallas_convs=tuple(config.dw_pallas_convs),
                      dtype=dtype)
    if config.backbone == "resnet34":
        return SSDResNet34(num_classes=config.num_classes,
                           dropout_rate=config.dropout_rate,
                           freeze_backbone=config.freeze_backbone,
                           dtype=dtype)
    raise ValueError(f"unknown backbone: {config.backbone!r}")
