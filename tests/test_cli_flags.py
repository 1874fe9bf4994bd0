"""CLI flag -> Config plumbing (cli.build_config and subparser wiring).

Pure-host tests: no model build, no device work — they pin that every
training/eval knob actually lands in the Config it claims to set."""

import os
import pathlib
import unittest.mock as mock

import pytest

from objectdetection_ssd_tpu import cli

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _parse(argv):
    """Run cli.main with every cmd_* stubbed out; return the parsed args.

    main() binds `fn=cmd_train` etc. from module globals when it builds the
    parser, so patching the module attributes before the call intercepts
    dispatch."""
    captured = {}

    def fake_fn(args):
        captured["args"] = args
        return 0

    with mock.patch.object(cli, "cmd_train", fake_fn), \
            mock.patch.object(cli, "cmd_eval", fake_fn), \
            mock.patch.object(cli, "cmd_detect", fake_fn), \
            mock.patch.object(cli, "cmd_export", fake_fn):
        assert cli.main(argv) == 0
    return captured["args"]


def test_train_flags_reach_config():
    args = _parse([
        "train", "--bf16", "--backbone", "vgg16",
        "--freeze-trunk-stages", "2", "--grad-accum", "4",
        "--tb-dir", "/tmp/tb", "--batch-size", "16",
        "--parity-split", "--hnm-topk", "0",
    ])
    cfg = cli.build_config(args)
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.model.freeze_stages == 2
    assert cfg.optim.grad_accum_steps == 4
    assert cfg.train.tensorboard_dir == "/tmp/tb"
    assert cfg.data.batch_size == 16
    assert cfg.data.parity_split is True
    assert cfg.loss.hnm_topk == 0


def test_device_prefetch_flags():
    cfg = cli.build_config(_parse(["train", "--device-prefetch"]))
    assert cfg.train.device_prefetch is True
    cfg = cli.build_config(_parse(["train", "--no-device-prefetch"]))
    assert cfg.train.device_prefetch is False
    # no flag -> dataclass default untouched
    from objectdetection_ssd_tpu.config import TrainConfig
    cfg = cli.build_config(_parse(["train"]))
    assert cfg.train.device_prefetch == TrainConfig().device_prefetch


def test_compilation_cache_flag(tmp_path):
    cache = str(tmp_path / "xla_cache")
    cfg = cli.build_config(_parse(["eval", "--compilation-cache", cache]))
    assert cfg.train.compilation_cache_dir == cache
    cfg = cli.build_config(_parse(["eval"]))
    assert cfg.train.compilation_cache_dir is None


def test_compilation_cache_populates(tmp_path):
    """apply_compilation_cache makes jit compiles persist: a fresh
    subprocess writes cache entries, a second subprocess reuses them
    (entry count stays flat while both produce the same result)."""
    import subprocess
    import sys

    cache = str(tmp_path / "xla_cache")
    prog = (
        "import sys; sys.path.insert(0, %r)\n"
        "from objectdetection_ssd_tpu import cli\n"
        "cli.apply_compilation_cache(%r)\n"
        "import jax, jax.numpy as jnp\n"
        "print(float(jax.jit(lambda x: (x @ x).sum())"
        "(jnp.ones((64, 64)))))\n"
        % (str(ROOT), cache)
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out1 = subprocess.run([sys.executable, "-c", prog], env=env,
                          capture_output=True, text=True, check=True)
    files = list((tmp_path / "xla_cache").iterdir())
    assert files, "no cache entries written"
    out2 = subprocess.run([sys.executable, "-c", prog], env=env,
                          capture_output=True, text=True, check=True)
    assert out1.stdout == out2.stdout
    assert len(list((tmp_path / "xla_cache").iterdir())) == len(files)


def test_resnet_backbone_sets_image_size():
    args = _parse(["train", "--backbone", "resnet34"])
    cfg = cli.build_config(args)
    assert cfg.model.backbone == "resnet34"
    assert cfg.model.image_size == 224


def test_ema_flags():
    cfg = cli.build_config(_parse(["train", "--ema-decay", "0.999"]))
    assert cfg.train.ema_decay == 0.999
    assert cli.build_config(_parse(["train"])).train.ema_decay == 0.0
    # eval accepts both knobs (target reconstruction + EMA-weight read)
    args = _parse(["eval", "--ema-decay", "0.999", "--use-ema"])
    assert args.use_ema is True
    assert cli.build_config(args).train.ema_decay == 0.999


def test_eval_iou_sweep_flag():
    assert _parse(["eval", "--iou-sweep"]).iou_sweep is True
    assert _parse(["eval"]).iou_sweep is False


def test_scoped_vmem_flag():
    cfg = cli.build_config(_parse(["train", "--scoped-vmem-kib", "32768"]))
    assert cfg.train.scoped_vmem_limit_kib == 32768
    # 0 = compiler default (stored as None)
    cfg = cli.build_config(_parse(["train", "--scoped-vmem-kib", "0"]))
    assert cfg.train.scoped_vmem_limit_kib is None
    # flag absent: measured-best default stands
    cfg = cli.build_config(_parse(["train"]))
    assert cfg.train.scoped_vmem_limit_kib == 65536


def test_eval_split_flag():
    args = _parse(["eval", "--split", "train"])
    assert args.split == "train"
    args = _parse(["eval"])
    assert args.split == "val"


def test_export_flags():
    args = _parse(["export", "--out-dir", "/tmp/a",
                   "--serve-batch-size", "4"])
    assert args.out_dir == "/tmp/a"
    assert args.serve_batch_size == 4


def test_fsdp_rejects_indivisible_device_count():
    """cmd_train errors out before any heavy work when --fsdp does not
    divide the available devices."""
    import jax
    n = len(jax.devices())
    bad = n + 3  # never divides n (bad > n)
    args = _parse(["train", "--fsdp", str(bad)])
    with pytest.raises(SystemExit, match="does not divide"):
        cli.cmd_train(args)


def test_latency_profile_preset():
    """--latency-profile bundles the measured serving knobs; explicit
    flags override their piece."""
    cfg = cli.build_config(_parse(["export", "--out-dir", "/tmp/x",
                                   "--latency-profile"]))
    assert cfg.postprocess.per_class_top_k == 32
    assert cfg.quant.int8
    assert cfg.quant.chain_requant          # chain stays on by default
    # explicit override wins over the preset: the quant flags are applied
    # AFTER the preset block in build_config, so --no-int8-chain flips
    # the preset-enabled int8 path's chaining off.
    cfg = cli.build_config(_parse(["export", "--out-dir", "/tmp/x",
                                   "--latency-profile",
                                   "--no-int8-chain"]))
    assert cfg.quant.int8                   # preset piece survives
    assert cfg.quant.chain_requant is False  # override piece wins
    # no preset -> defaults untouched
    cfg = cli.build_config(_parse(["export", "--out-dir", "/tmp/x"]))
    assert cfg.postprocess.per_class_top_k == 64
    assert not cfg.quant.int8


def test_int8_chain_and_recalibrate_flags():
    cfg = cli.build_config(_parse(["eval", "--int8", "--no-int8-chain",
                                   "--recalibrate"]))
    assert cfg.quant.int8
    assert cfg.quant.chain_requant is False
    assert cfg.quant.recalibrate is True
    cfg = cli.build_config(_parse(["eval", "--int8"]))
    assert cfg.quant.chain_requant is True
    assert cfg.quant.recalibrate is False


def test_stale_qat_scales_hard_error(tmp_path):
    """quant_scales.json bound to different weights must hard-error (with
    --recalibrate as the escape) instead of silently misquantizing —
    round-3 verdict item 7."""
    import dataclasses
    import numpy as np
    import pytest as _pytest
    from objectdetection_ssd_tpu.infer import quant as quant_lib

    params_a = {"trunk": {"conv1_1": {"kernel": np.ones((2,), np.float32)}}}
    params_b = {"trunk": {"conv1_1": {"kernel": np.zeros((2,), np.float32)}}}
    qtree = {"trunk": {"conv1_1": {"act_scale": np.float32(0.031)}}}
    path = str(tmp_path / quant_lib.SCALES_FILENAME)
    quant_lib.save_scales(qtree, path,
                          fingerprint=quant_lib.param_fingerprint(params_a),
                          epoch=3)
    assert quant_lib.load_scales_meta(path)["epoch"] == 3

    cfg = cli.config_lib.Config()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, checkpoint_dir=str(tmp_path)),
        quant=dataclasses.replace(cfg.quant, int8=True))
    # matching weights: scales load fine
    out = cli._build_quant(cfg, params=params_a, batch_stats=None,
                           records=None)
    np.testing.assert_allclose(out["trunk"]["conv1_1"]["act_scale"], 0.031,
                               rtol=1e-6)
    # retrained weights: hard error naming --recalibrate
    with _pytest.raises(SystemExit, match="recalibrate"):
        cli._build_quant(cfg, params=params_b, batch_stats=None,
                         records=None)
    # EMA fingerprint list: serving the EMA tree also passes
    quant_lib.save_scales(
        qtree, path,
        fingerprint=[quant_lib.param_fingerprint(params_a),
                     quant_lib.param_fingerprint(params_b)])
    out = cli._build_quant(cfg, params=params_b, batch_stats=None,
                           records=None)
    assert out is not None


def test_no_int8_chain_strips_saved_out_scales(tmp_path):
    """A QAT run saves the CHAINED tree (out_scale leaves persist in
    quant_scales.json); loading with --no-int8-chain must STRIP them, or
    the served graph chains anyway and the A/B the flag exists for
    measures nothing (round-4 advisor finding)."""
    import dataclasses
    import numpy as np
    from objectdetection_ssd_tpu.infer import quant as quant_lib

    params = {"trunk": {"conv1_1": {"kernel": np.ones((2,), np.float32)}}}
    qtree = {"trunk": {"conv1_1": {"act_scale": np.float32(0.031),
                                   "out_scale": np.float32(0.017)}}}
    path = str(tmp_path / quant_lib.SCALES_FILENAME)
    quant_lib.save_scales(qtree, path,
                          fingerprint=quant_lib.param_fingerprint(params))

    cfg = cli.config_lib.Config()
    base = cfg.replace(
        train=dataclasses.replace(cfg.train, checkpoint_dir=str(tmp_path)))
    # chain on (default): out_scale survives the load
    on = base.replace(quant=dataclasses.replace(base.quant, int8=True))
    out = cli._build_quant(on, params=params, batch_stats=None, records=None)
    assert "out_scale" in out["trunk"]["conv1_1"]
    # chain off: out_scale is stripped
    off = base.replace(quant=dataclasses.replace(
        base.quant, int8=True, chain_requant=False))
    out = cli._build_quant(off, params=params, batch_stats=None,
                           records=None)
    assert "out_scale" not in out["trunk"]["conv1_1"]
    np.testing.assert_allclose(out["trunk"]["conv1_1"]["act_scale"], 0.031,
                               rtol=1e-6)


def test_unchain_scales_inverts_chain_scales():
    """quant.unchain_scales removes exactly the out_scale leaves
    chain_scales adds (and leaves a chained input untouched)."""
    import numpy as np
    from objectdetection_ssd_tpu.infer import quant as quant_lib
    src, dst = quant_lib.CHAIN_EDGES["vgg16"][0]
    qtree = {}
    for path in (src, dst):
        node = qtree
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = {"act_scale": np.float32(0.5)}
    chained = quant_lib.chain_scales(qtree, "vgg16")
    assert "out_scale" in quant_lib._subtree(chained, src)
    unchained = quant_lib.unchain_scales(chained)
    assert "out_scale" not in quant_lib._subtree(unchained, src)
    assert quant_lib._subtree(unchained, dst)["act_scale"] == np.float32(0.5)
    # chain input untouched by unchain (deep copy semantics)
    assert "out_scale" in quant_lib._subtree(chained, src)


def test_pp_flags_reach_config():
    cfg = cli.build_config(_parse(["train", "--pp", "2",
                                   "--pp-microbatches", "4",
                                   "--pp-dp", "2"]))
    assert cfg.train.pp_stages == 2
    assert cfg.train.pp_microbatches == 4
    assert cfg.train.pp_dp == 2
    cfg = cli.build_config(_parse(["train"]))
    assert cfg.train.pp_stages == 0
    assert cfg.train.pp_microbatches == 1
    assert cfg.train.pp_dp == 1


def test_pp_dp_and_microbatches_require_pp():
    """--pp-dp / --pp-microbatches without --pp must be a hard error, not
    silent single-mesh training the user mistakes for the composition."""
    with pytest.raises(SystemExit, match="require --pp"):
        cli.build_config(_parse(["train", "--pp-dp", "4"]))
    with pytest.raises(SystemExit, match="require --pp"):
        cli.build_config(_parse(["train", "--pp-microbatches", "4"]))
    with pytest.raises(SystemExit, match="require --pp"):
        cli.build_config(_parse(["train", "--pp", "1", "--pp-dp", "2"]))


def test_image_cache_flag_reaches_config():
    cfg = cli.build_config(_parse(["train", "--image-cache", "/tmp/c"]))
    assert cfg.data.image_cache == "/tmp/c"
    cfg = cli.build_config(_parse(["eval", "--image-cache", "/tmp/c"]))
    assert cfg.data.image_cache == "/tmp/c"
    cfg = cli.build_config(_parse(["train"]))
    assert cfg.data.image_cache is None


def test_pp_mutually_exclusive_with_mesh_strategies():
    args = _parse(["train", "--pp", "2", "--tp", "2"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.cmd_train(args)


def test_pp_rejects_qat():
    args = _parse(["train", "--pp", "2", "--qat"])
    with pytest.raises(SystemExit, match="qat"):
        cli.build_config(args)


def test_freeze_stages_rejected_for_resnet34():
    args = _parse(["train", "--backbone", "resnet34",
                   "--freeze-trunk-stages", "2"])
    with pytest.raises(SystemExit, match="VGG-16"):
        cli.build_config(args)


def test_eval_data_parallel_flag():
    args = _parse(["eval", "--data-parallel", "4"])
    assert args.data_parallel == 4
    args = _parse(["eval"])
    assert args.data_parallel == 0


def test_eval_sp_flag():
    args = _parse(["eval", "--sp", "2"])
    assert args.sp == 2
    args = _parse(["eval"])
    assert args.sp == 0


def test_nms_method_flags_reach_config():
    args = _parse(["eval", "--nms-method", "soft_gaussian",
                   "--soft-nms-sigma", "0.7"])
    cfg = cli.build_config(args)
    assert cfg.postprocess.nms_method == "soft_gaussian"
    assert cfg.postprocess.soft_nms_sigma == 0.7
    # default: reference-parity hard NMS, untouched config
    cfg = cli.build_config(_parse(["eval"]))
    assert cfg.postprocess.nms_method == "hard"


def test_int8_flags_reach_config():
    args = _parse(["eval", "--int8", "--int8-calib-images", "8",
                   "--int8-quantize-heads"])
    cfg = cli.build_config(args)
    assert cfg.quant.int8
    assert cfg.quant.calib_images == 8
    assert cfg.quant.quantize_heads
    # default: quantization off, standard policy
    cfg = cli.build_config(_parse(["eval"]))
    assert not cfg.quant.int8
    assert cfg.quant.calib_images == 64
    assert not cfg.quant.quantize_heads


def test_eval_map_every_scores_ema_weights_when_enabled():
    """--eval-map-every must score the weights the run will SERVE: the EMA
    average when --ema-decay is on, raw params otherwise."""
    class _S:
        params = {"w": 1}
        ema_params = {"w": 2}
    assert cli._eval_weights(_S()) == {"w": 2}
    _S.ema_params = None
    assert cli._eval_weights(_S()) == {"w": 1}


def test_int8_uses_saved_qat_scales(tmp_path):
    """A checkpoint dir with quant_scales.json (written by train --qat)
    must make --int8 serve the QAT-trained scales instead of recalibrating
    on the fine-tuned weights."""
    import dataclasses
    import numpy as np
    from objectdetection_ssd_tpu.infer import quant as quant_lib

    qtree = {"trunk": {"conv1_1": {"act_scale": np.float32(0.031)}}}
    quant_lib.save_scales(qtree, str(tmp_path / quant_lib.SCALES_FILENAME))

    cfg = cli.config_lib.Config()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, checkpoint_dir=str(tmp_path)),
        quant=dataclasses.replace(cfg.quant, int8=True))
    # params/records are never touched on the short-circuit path
    out = cli._build_quant(cfg, params=None, batch_stats=None, records=None)
    np.testing.assert_allclose(out["trunk"]["conv1_1"]["act_scale"], 0.031,
                               rtol=1e-6)
    # without the file, int8 off -> None
    cfg2 = cfg.replace(quant=dataclasses.replace(cfg.quant, int8=False))
    assert cli._build_quant(cfg2, None, None, records=None) is None
