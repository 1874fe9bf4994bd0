"""Pretrained-weight import: torch state_dicts -> Flax params.

Covers two sources (pure numpy transforms; torch tensors accepted but never
required — pass any mapping of name -> array):

1. A torchvision ``vgg16`` state_dict (features.* + classifier.*): builds the
   SSD300 trunk exactly the way the reference constructs it from torchvision
   (`Model.py:131-162`), including the fc->conv subsampling trick:
     * fc6 (4096, 25088) viewed as (4096, 512, 7, 7), decimated with strides
       [4, -, 3, 3] -> (1024, 512, 3, 3) atrous conv weights
       (`Model.py:145-146` + `subsampling`, `Util.py:555-560`);
     * fc7 (4096, 4096) viewed as (4096, 4096, 1, 1), decimated [4, 4, -, -]
       -> (1024, 1024, 1, 1) (`Model.py:156-157`).

2. A full reference SSD_300 checkpoint's ``cnn_state_dict``
   (`train_function.py:114-120`): trunk + extra layers + heads + the conv4_3
   rescale parameter, remapped onto this package's module names.

Layout conversion: torch convs are (out, in, kh, kw); Flax wants
(kh, kw, in, out).  Out-channel order is preserved, so the per-cell
(anchor, coord/class) interleaving of the head outputs matches the
reference's permute+view flattening (`Model.py:212`).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np


def _np(x) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def subsample(x: np.ndarray, steps: Sequence[Optional[int]]) -> np.ndarray:
    """Strided decimation per dimension; None keeps the dim
    (the reference's `subsampling`, `Util.py:555-560`)."""
    for d, s in enumerate(steps):
        if s is None:
            continue
        x = np.take(x, np.arange(0, x.shape[d], s), axis=d)
    return x


def _conv(w, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(w).transpose(2, 3, 1, 0)}
    if b is not None:
        out["bias"] = _np(b)
    return out


# torchvision vgg16 `features.<idx>` conv indices -> our trunk module names.
_VGG_FEATURE_MAP = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def vgg16_trunk_params(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision vgg16 state_dict -> params for `backbones.VGG16Trunk`."""
    trunk: Dict[str, Any] = {}
    for idx, name in _VGG_FEATURE_MAP.items():
        trunk[name] = {"Conv_0": _conv(state_dict[f"features.{idx}.weight"],
                                       state_dict[f"features.{idx}.bias"])}

    fc6_w = _np(state_dict["classifier.0.weight"]).reshape(4096, 512, 7, 7)
    fc6_w = subsample(fc6_w, [4, None, 3, 3])          # (1024, 512, 3, 3)
    fc6_b = subsample(_np(state_dict["classifier.0.bias"]), [4])
    trunk["conv_fc6"] = {"Conv_0": _conv(fc6_w, fc6_b)}

    fc7_w = _np(state_dict["classifier.3.weight"]).reshape(4096, 4096, 1, 1)
    fc7_w = subsample(fc7_w, [4, 4, None, None])       # (1024, 1024, 1, 1)
    fc7_b = subsample(_np(state_dict["classifier.3.bias"]), [4])
    trunk["conv_fc7"] = {"Conv_0": _conv(fc7_w, fc7_b)}
    return trunk


# Reference SSD_300 module names -> (our module name, head tap index).
_REF_EXTRA_MAP = {
    "seq8": "seq8", "seq9": "seq9", "seq10": "seq10", "seq11": "seq11",
}
_REF_HEAD_MAP = {
    "c_4_bb": "loc_head_0", "c_4_cl": "conf_head_0",
    "c_7_bb": "loc_head_1", "c_7_cl": "conf_head_1",
    "c_8_bb": "loc_head_2", "c_8_cl": "conf_head_2",
    "c_9_bb": "loc_head_3", "c_9_cl": "conf_head_3",
    "c_10_bb": "loc_head_4", "c_10_cl": "conf_head_4",
    "c_11_bb": "loc_head_5", "c_11_cl": "conf_head_5",
}
# conv_4_3 Sequential: vgg features 0..15 at the same positions, the ceil
# pool at 16, then conv4_x at 17/19/21 (`Model.py:135-139`).  seq5 holds
# conv5_x at Sequential positions 1/3/5 (`Model.py:140-143`).
_REF_CONV43_IDX = {k: v for k, v in _VGG_FEATURE_MAP.items() if k <= 21}
_REF_SEQ5_IDX = {1: "conv5_1", 3: "conv5_2", 5: "conv5_3"}


def ssd300_reference_params(cnn_state_dict: Mapping[str, Any]
                            ) -> Dict[str, Any]:
    """Reference SSD_300 checkpoint -> params for `ssd.SSD300`."""
    sd = cnn_state_dict
    trunk: Dict[str, Any] = {}
    for idx, name in _REF_CONV43_IDX.items():
        trunk[name] = {"Conv_0": _conv(sd[f"conv_4_3.{idx}.weight"],
                                       sd[f"conv_4_3.{idx}.bias"])}
    for idx, name in _REF_SEQ5_IDX.items():
        trunk[name] = {"Conv_0": _conv(sd[f"seq5.{idx}.weight"],
                                       sd[f"seq5.{idx}.bias"])}
    trunk["conv_fc6"] = {"Conv_0": _conv(sd["conv_fc6.weight"],
                                         sd["conv_fc6.bias"])}
    trunk["conv_fc7"] = {"Conv_0": _conv(sd["conv_fc7.weight"],
                                         sd["conv_fc7.bias"])}

    params: Dict[str, Any] = {"trunk": trunk}
    params["l2norm_4_3"] = {
        "scale": _np(sd["rescaling_conv_4_3"]).reshape(-1)}  # (1,512,1,1)->(512,)

    for ref, ours in _REF_EXTRA_MAP.items():
        # Sequential(conv, relu, conv, relu): convs at 0 and 2
        # (`Model.py:163-166`).
        params[f"{ours}_1"] = {"Conv_0": _conv(sd[f"{ref}.0.weight"],
                                               sd[f"{ref}.0.bias"])}
        params[f"{ours}_2"] = {"Conv_0": _conv(sd[f"{ref}.2.weight"],
                                               sd[f"{ref}.2.bias"])}
    for ref, ours in _REF_HEAD_MAP.items():
        params[ours] = {"Conv_0": _conv(sd[f"{ref}.weight"],
                                        sd[f"{ref}.bias"])}
    return params


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference torch checkpoint file and convert
    (requires torch; the dict format is `train_function.py:114-120`)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["cnn_state_dict"] if "cnn_state_dict" in ckpt else ckpt
    return ssd300_reference_params(sd)


def _bn(sd: Mapping[str, Any], prefix: str):
    """torch BatchNorm2d -> (flax params, flax batch_stats)."""
    return ({"scale": _np(sd[f"{prefix}.weight"]),
             "bias": _np(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])})


def resnet34_trunk_params(state_dict: Mapping[str, Any]
                          ) -> Dict[str, Dict[str, Any]]:
    """torchvision resnet34 state_dict -> {'params', 'batch_stats'} for
    `backbones.ResNet34Trunk` (the reference's pretrained frozen trunk,
    `Model.py:21-30,81-86`)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem_conv"] = {"Conv_0": _conv(state_dict["conv1.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn(state_dict, "bn1")
    for si, n_blocks in enumerate((3, 4, 6, 3)):
        for b in range(n_blocks):
            t = f"layer{si + 1}.{b}"
            name = f"layer{si + 1}_block{b + 1}"
            blk_p: Dict[str, Any] = {
                "conv1": {"Conv_0": _conv(state_dict[f"{t}.conv1.weight"])},
                "conv2": {"Conv_0": _conv(state_dict[f"{t}.conv2.weight"])},
            }
            blk_s: Dict[str, Any] = {}
            blk_p["bn1"], blk_s["bn1"] = _bn(state_dict, f"{t}.bn1")
            blk_p["bn2"], blk_s["bn2"] = _bn(state_dict, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in state_dict:
                blk_p["downsample_conv"] = {
                    "Conv_0": _conv(state_dict[f"{t}.downsample.0.weight"])}
                (blk_p["downsample_bn"],
                 blk_s["downsample_bn"]) = _bn(state_dict, f"{t}.downsample.1")
            params[name] = blk_p
            stats[name] = blk_s
    return {"params": params, "batch_stats": stats}


def merge_params(base: Mapping[str, Any], overrides: Mapping[str, Any],
                 strict_shapes: bool = True):
    """Override a subset of a params pytree with converted weights.

    Every override leaf must exist in ``base`` with the same shape —
    catching a converter/model drift loudly instead of training from a
    silently-partial init.  Returns a tree of base's structure (leaves cast
    to base's dtypes).
    """
    import flax
    import jax.numpy as jnp
    unfrozen = flax.core.unfreeze(base)
    flat_base = flax.traverse_util.flatten_dict(unfrozen)
    flat_over = flax.traverse_util.flatten_dict(dict(overrides))
    for key, val in flat_over.items():
        if key not in flat_base:
            raise KeyError(
                f"init override {'/'.join(key)} not present in the model "
                f"(model leaves: {sorted('/'.join(k) for k in flat_base)[:8]}...)")
        if strict_shapes and tuple(flat_base[key].shape) != tuple(
                np.shape(val)):
            raise ValueError(
                f"init override {'/'.join(key)}: shape "
                f"{np.shape(val)} != model {tuple(flat_base[key].shape)}")
        flat_base[key] = jnp.asarray(val, flat_base[key].dtype)
    merged = flax.traverse_util.unflatten_dict(flat_base)
    if isinstance(base, flax.core.FrozenDict):
        return flax.core.freeze(merged)
    return merged
