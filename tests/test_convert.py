"""Weight-conversion tests: numerical parity between a torch VGG/SSD trunk
and the Flax trunk loaded with converted weights.

The torch model below is built in the test from the well-known VGG-16/SSD300
geometry (torchvision feature indices, ceil-mode pool3, 3x3-stride-1 pool5,
atrous fc6/fc7 convs — see `Model.py:131-162` for what the reference does
with torchvision).  If any pooling/padding/dilation semantic differs between
the torch graph and our XLA graph, these tests fail loudly.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from objectdetection_ssd_tpu.models import convert
from objectdetection_ssd_tpu.models.backbones import VGG16Trunk


def _build_torch_vgg16_features():
    """torchvision-vgg16-shaped features Sequential (indices 0..30)."""
    cfg = [(64, 64), (128, 128), (256, 256, 256),
           (512, 512, 512), (512, 512, 512)]
    layers = collections.OrderedDict()
    idx = 0
    in_ch = 3
    for block in cfg:
        for out_ch in block:
            layers[str(idx)] = nn.Conv2d(in_ch, out_ch, 3, padding=1)
            idx += 1
            layers[str(idx)] = nn.ReLU()
            idx += 1
            in_ch = out_ch
        layers[str(idx)] = nn.MaxPool2d(2, 2)
        idx += 1
    return nn.Sequential(layers)


class TorchSSDTrunk(nn.Module):
    """The SSD300 trunk exactly as assembled from torchvision vgg16:
    conv1_1..conv4_3 with ceil-mode pool3, pool4, conv5 block, 3x3/1 pool5,
    atrous conv_fc6 (d=4, p=4), 1x1 conv_fc7."""

    def __init__(self, features: nn.Sequential, fc6_w, fc6_b, fc7_w, fc7_b):
        super().__init__()
        mods = list(features.children())
        self.pre_pool3 = nn.Sequential(*mods[0:16])       # conv1_1..conv3_3+relu
        self.pool3 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = nn.Sequential(*mods[17:23])          # conv4_1..conv4_3+relu
        self.pool4 = nn.MaxPool2d(2, 2)
        self.conv5 = nn.Sequential(*mods[24:30])          # conv5_1..conv5_3+relu
        self.pool5 = nn.MaxPool2d(3, 1, padding=1)
        self.conv_fc6 = nn.Conv2d(512, 1024, 3, padding=4, dilation=4)
        self.conv_fc6.weight = nn.Parameter(torch.tensor(fc6_w))
        self.conv_fc6.bias = nn.Parameter(torch.tensor(fc6_b))
        self.conv_fc7 = nn.Conv2d(1024, 1024, 1)
        self.conv_fc7.weight = nn.Parameter(torch.tensor(fc7_w))
        self.conv_fc7.bias = nn.Parameter(torch.tensor(fc7_b))

    def forward(self, x):
        x = self.conv4(self.pool3(self.pre_pool3(x)))
        conv4_3 = x
        x = self.pool5(self.conv5(self.pool4(x)))
        x = torch.relu(self.conv_fc6(x))
        x = torch.relu(self.conv_fc7(x))
        return conv4_3, x


@pytest.fixture(scope="module")
def torch_state_dict():
    torch.manual_seed(0)
    features = _build_torch_vgg16_features()
    sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    # torchvision classifier: Linear(25088, 4096) at .0, Linear(4096, 4096)
    # at .3 — random weights stand in for pretrained ones.
    sd["classifier.0.weight"] = torch.randn(4096, 25088) * 0.01
    sd["classifier.0.bias"] = torch.randn(4096) * 0.01
    sd["classifier.3.weight"] = torch.randn(4096, 4096) * 0.01
    sd["classifier.3.bias"] = torch.randn(4096) * 0.01
    return features, sd


def test_subsample_matches_reference_semantics():
    x = np.arange(4 * 6).reshape(4, 6).astype(np.float32)
    got = convert.subsample(x, [2, None])
    np.testing.assert_array_equal(got, x[::2])
    got = convert.subsample(x, [None, 3])
    np.testing.assert_array_equal(got, x[:, ::3])
    # fc6 shape transform: (4096,512,7,7) -[4,-,3,3]-> (1024,512,3,3)
    y = np.zeros((8, 2, 7, 7), np.float32)
    assert convert.subsample(y, [4, None, 3, 3]).shape == (2, 2, 3, 3)


def test_vgg16_conversion_shapes(torch_state_dict):
    _, sd = torch_state_dict
    params = convert.vgg16_trunk_params(sd)
    assert params["conv_fc6"]["Conv_0"]["kernel"].shape == (3, 3, 512, 1024)
    assert params["conv_fc6"]["Conv_0"]["bias"].shape == (1024,)
    assert params["conv_fc7"]["Conv_0"]["kernel"].shape == (1, 1, 1024, 1024)
    assert params["conv1_1"]["Conv_0"]["kernel"].shape == (3, 3, 3, 64)
    # must exactly match the Flax init tree structure+shapes
    trunk = VGG16Trunk()
    ref = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes


def test_trunk_numerical_parity_torch_vs_flax(torch_state_dict):
    features, sd = torch_state_dict
    params = convert.vgg16_trunk_params(sd)

    fc6_w = convert.subsample(
        convert._np(sd["classifier.0.weight"]).reshape(4096, 512, 7, 7),
        [4, None, 3, 3])
    fc6_b = convert.subsample(convert._np(sd["classifier.0.bias"]), [4])
    fc7_w = convert.subsample(
        convert._np(sd["classifier.3.weight"]).reshape(4096, 4096, 1, 1),
        [4, 4, None, None])
    fc7_b = convert.subsample(convert._np(sd["classifier.3.bias"]), [4])
    tmodel = TorchSSDTrunk(features, fc6_w, fc6_b, fc7_w, fc7_b).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 3, 300, 300)).astype(np.float32)
    with torch.no_grad():
        t_conv43, t_fc7 = tmodel(torch.tensor(x))

    trunk = VGG16Trunk()
    f_conv43, f_fc7 = trunk.apply({"params": params},
                                  jnp.asarray(x.transpose(0, 2, 3, 1)))

    assert t_conv43.shape[-2:] == (38, 38)
    np.testing.assert_allclose(
        np.asarray(f_conv43), t_conv43.numpy().transpose(0, 2, 3, 1),
        atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(f_fc7), t_fc7.numpy().transpose(0, 2, 3, 1),
        atol=2e-3, rtol=1e-3)


def test_reference_checkpoint_conversion_shapes():
    """Synthesize a reference-format cnn_state_dict (random values, correct
    shapes per `Model.py:128-200`) and check the converted tree loads into
    SSD300 with exact structure/shape agreement."""
    rng = np.random.default_rng(1)

    def conv(out, inp, k):
        return (rng.normal(0, 0.01, (out, inp, k, k)).astype(np.float32),
                rng.normal(0, 0.01, (out,)).astype(np.float32))

    sd = {}
    vgg_cfg = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
               10: (256, 128), 12: (256, 256), 14: (256, 256),
               17: (512, 256), 19: (512, 512), 21: (512, 512)}
    for idx, (o, i) in vgg_cfg.items():
        w, b = conv(o, i, 3)
        sd[f"conv_4_3.{idx}.weight"] = w
        sd[f"conv_4_3.{idx}.bias"] = b
    for idx in (1, 3, 5):
        w, b = conv(512, 512, 3)
        sd[f"seq5.{idx}.weight"] = w
        sd[f"seq5.{idx}.bias"] = b
    sd["conv_fc6.weight"], sd["conv_fc6.bias"] = conv(1024, 512, 3)
    sd["conv_fc7.weight"], sd["conv_fc7.bias"] = conv(1024, 1024, 1)
    sd["rescaling_conv_4_3"] = np.full((1, 512, 1, 1), 20.0, np.float32)
    extras = {"seq8": ((256, 1024, 1), (512, 256, 3)),
              "seq9": ((128, 512, 1), (256, 128, 3)),
              "seq10": ((128, 256, 1), (256, 128, 3)),
              "seq11": ((128, 256, 1), (256, 128, 3))}
    for name, ((o1, i1, k1), (o2, i2, k2)) in extras.items():
        w, b = conv(o1, i1, k1)
        sd[f"{name}.0.weight"], sd[f"{name}.0.bias"] = w, b
        w, b = conv(o2, i2, k2)
        sd[f"{name}.2.weight"], sd[f"{name}.2.bias"] = w, b
    heads = {"c_4_bb": (16, 512), "c_4_cl": (84, 512),
             "c_7_bb": (24, 1024), "c_7_cl": (126, 1024),
             "c_8_bb": (24, 512), "c_8_cl": (126, 512),
             "c_9_bb": (24, 256), "c_9_cl": (126, 256),
             "c_10_bb": (16, 256), "c_10_cl": (84, 256),
             "c_11_bb": (16, 256), "c_11_cl": (84, 256)}
    for name, (o, i) in heads.items():
        w, b = conv(o, i, 3)
        sd[f"{name}.weight"], sd[f"{name}.bias"] = w, b

    params = convert.ssd300_reference_params(sd)

    from objectdetection_ssd_tpu.models.ssd import SSD300
    model = SSD300()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes

    loc, conf = model.apply({"params": params}, jnp.zeros((1, 300, 300, 3)))
    assert loc.shape == (1, 8732, 4) and conf.shape == (1, 8732, 21)


def test_head_flatten_order_matches_torch():
    """The (row, col, anchor, coord) interleave of flattened head outputs
    must match the reference's permute(0,2,3,1)+view (`Model.py:212`), or
    converted head weights would pair predictions with the wrong priors."""
    torch.manual_seed(1)
    k, C = 4, 21
    head = nn.Conv2d(32, C * k, 3, padding=1)
    x = torch.randn(1, 32, 5, 5)
    with torch.no_grad():
        t_out = head(x).permute(0, 2, 3, 1).contiguous().view(1, -1, C)

    from objectdetection_ssd_tpu.models.layers import TorchConv, flatten_head
    params = {"Conv_0": convert._conv(head.weight, head.bias)}
    f_conv = TorchConv(C * k, kernel=3, padding=1)
    f_raw = f_conv.apply({"params": params},
                         jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    f_out = flatten_head(f_raw, C)
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(),
                               atol=2e-5, rtol=1e-4)
