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


# ---------------------------------------------------------------------------
# ResNet-34 trunk conversion (torchvision state_dict naming, hand-built here
# because torchvision isn't installed in this image)
# ---------------------------------------------------------------------------

class _TorchBasicBlock(nn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.conv2 = nn.Conv2d(out, out, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        idt = x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(y + idt)


class _TorchResNet34(nn.Module):
    """torchvision-resnet34-shaped module (state_dict key compatible)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, padding=1)
        inp = 64
        for si, (n, f) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512))):
            blocks = []
            for b in range(n):
                stride = 2 if (si > 0 and b == 0) else 1
                blocks.append(_TorchBasicBlock(inp, f, stride))
                inp = f
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        return x


def test_resnet34_trunk_conversion_numerical_parity():
    """Converted ResNet-34 trunk (params + BN running stats) reproduces the
    torch trunk's eval-mode features."""
    from objectdetection_ssd_tpu.models.backbones import ResNet34Trunk

    torch.manual_seed(3)
    tmodel = _TorchResNet34()
    # Non-trivial BN running stats: a few train-mode passes.
    tmodel.train()
    with torch.no_grad():
        for i in range(3):
            tmodel(torch.randn(2, 3, 64, 64))
    tmodel.eval()

    tree = convert.resnet34_trunk_params(tmodel.state_dict())
    trunk = ResNet34Trunk()
    ref = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape,
                                        tree["params"])
    assert ref_shapes == got_shapes

    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)
    f_out = trunk.apply({"params": tree["params"],
                         "batch_stats": tree["batch_stats"]},
                        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(f_out), t_out,
                               atol=2e-3, rtol=1e-3)


def test_merge_params_strictness():
    base = {"a": {"w": np.zeros((2, 2), np.float32)},
            "b": {"w": np.ones((3,), np.float32)}}
    merged = convert.merge_params(base, {"a": {"w": np.ones((2, 2))}})
    np.testing.assert_array_equal(merged["a"]["w"], 1.0)
    np.testing.assert_array_equal(merged["b"]["w"], 1.0)  # untouched
    with pytest.raises(KeyError, match="nope"):
        convert.merge_params(base, {"nope": {"w": np.zeros(1)}})
    with pytest.raises(ValueError, match="shape"):
        convert.merge_params(base, {"a": {"w": np.zeros((5, 5))}})


@pytest.mark.slow
def test_trainer_pretrained_vgg16_init_end_to_end(torch_state_dict,
                                                  tmp_path):
    """VERDICT item 2: the reference's flagship recipe — pretrained VGG
    trunk into SSD300 training (`Model.py:131-161` + `train.py:43-59`) —
    runs end-to-end: Trainer starts FROM the converted weights and one SGD
    step moves the trunk away from them."""
    import dataclasses
    from objectdetection_ssd_tpu.config import (Config, DataConfig,
                                                OptimConfig, TrainConfig)
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    from objectdetection_ssd_tpu.train.trainer import Trainer

    _, sd = torch_state_dict
    trunk_params = convert.vgg16_trunk_params(sd)
    cfg = Config(
        data=DataConfig(batch_size=1, num_workers=0),
        optim=OptimConfig(lr=0.05, use_lr_schedule=False),
        train=TrainConfig(seed=0, checkpoint_dir=str(tmp_path / "ck"),
                          donate_state=False),
    )

    class _FakeLoader:
        records = []

        def __len__(self):
            return 1

    mesh = mesh_lib.create_mesh(devices=jax.devices()[:1])
    trainer = Trainer(cfg, _FakeLoader(), mesh=mesh,
                      init_params={"trunk": trunk_params})

    got = np.asarray(trainer.state.params["trunk"]["conv1_1"]["Conv_0"]
                     ["kernel"])
    want = trunk_params["conv1_1"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(got, want, atol=1e-7)
    got_fc6 = np.asarray(trainer.state.params["trunk"]["conv_fc6"]["Conv_0"]
                         ["kernel"])
    np.testing.assert_allclose(got_fc6,
                               trunk_params["conv_fc6"]["Conv_0"]["kernel"],
                               atol=1e-7)

    rng = np.random.default_rng(7)
    batch = {
        "images": rng.normal(0, 1, (1, 300, 300, 3)).astype(np.float32),
        "boxes": np.asarray([[[0.2, 0.2, 0.8, 0.8]]], np.float32),
        "classes": np.asarray([[5]], np.int32),
        "mask": np.ones((1, 1), bool),
    }
    batch = mesh_lib.shard_batch(batch, mesh)
    new_state, metrics = trainer.train_step(trainer.state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = np.asarray(new_state.params["trunk"]["conv1_1"]["Conv_0"]
                       ["kernel"])
    assert not np.allclose(moved, want)


def test_cli_init_flag_loading(torch_state_dict, tmp_path):
    import argparse
    from objectdetection_ssd_tpu import cli
    from objectdetection_ssd_tpu.config import Config

    _, sd = torch_state_dict
    path = tmp_path / "vgg16.pth"
    torch.save(dict(sd), str(path))

    ns = argparse.Namespace(init_torch_vgg16=str(path),
                            init_torch_resnet34=None,
                            init_reference_ckpt=None)
    init_params, init_stats = cli._load_init_weights(ns, Config())
    assert init_stats is None
    assert "conv1_1" in init_params["trunk"]
    assert init_params["trunk"]["conv_fc6"]["Conv_0"]["kernel"].shape == (
        3, 3, 512, 1024)

    from objectdetection_ssd_tpu.config import ModelConfig
    bad_cfg = Config(model=ModelConfig(backbone="resnet34"))
    with pytest.raises(SystemExit, match="vgg16"):
        cli._load_init_weights(ns, bad_cfg)

    ns_none = argparse.Namespace(init_torch_vgg16=None,
                                 init_torch_resnet34=None,
                                 init_reference_ckpt=None)
    assert cli._load_init_weights(ns_none, Config()) == (None, None)
