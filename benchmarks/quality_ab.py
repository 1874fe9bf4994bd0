"""Accuracy + throughput A/B of the opt-in inference variants on a TRAINED
SSD300: int8 PTQ (heads-f32 and full), TTA-flip, and Soft-NMS, against the
exact-postprocess f32 baseline.

Why this exists: the variant implementations are correctness-pinned by unit
tests, but their VALUE claims — "int8 costs ~no mAP", "TTA boosts mAP",
"soft-NMS helps crowded scenes" — need a trained model.  This drives the
real SSD300 (trained via the map_rehearsal recipe on the learnable
synthetic VOC) through the real eval path for each variant, then runs a
same-process bf16-vs-int8 throughput A/B with bench.py's chained-dependency
methodology (CLAUDE.md: never compare numbers across relay processes).

Usage:
  python benchmarks/quality_ab.py [workdir] [--qat-epochs N] [--skip-qat]
Reuses ``workdir``'s checkpoint when one exists (e.g. a prior
map_rehearsal.py or full_scale_rehearsal.py run passed the same workdir);
otherwise trains first (~25 min on a v5e).  The QAT stage fine-tunes
``--qat-epochs`` (default 5) MORE epochs from whatever epoch the restored
checkpoint is at.  Prints one JSON line per measurement.
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_IMAGES_2007 = 1200
TRAIN_IMAGES_2012 = 200
EPOCHS = 30
BATCH = 64
BENCH_BATCH = 256


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/quality_ab")
    ap.add_argument("--qat-epochs", type=int, default=5)
    ap.add_argument("--skip-qat", action="store_true")
    args = ap.parse_args()
    work = args.workdir
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "voc")
    ckpt = os.path.join(work, "ckpt")

    from objectdetection_ssd_tpu import cli
    from objectdetection_ssd_tpu.data import synthetic, voc

    if not os.path.isdir(root):
        synthetic.generate_voc(root, num_2007=TRAIN_IMAGES_2007,
                               num_2012=TRAIN_IMAGES_2012,
                               image_size=(400, 300), max_objects=4,
                               seed=11, class_color_coding=True)
    if not os.path.isdir(ckpt):
        t0 = time.perf_counter()
        cli.main([
            "train", "--voc-root", root, "--epochs", str(EPOCHS),
            "--batch-size", str(BATCH), "--num-workers", "0",
            "--checkpoint-dir", ckpt, "--bf16",
            "--lr", "5e-4", "--warmup-steps", "300", "--no-lr-decay",
            "--image-cache", os.path.join(work, "cache"),
        ])
        print(json.dumps({"stage": "trained", "epochs": EPOCHS,
                          "wall_seconds":
                          round(time.perf_counter() - t0, 1)}))

    class _A:
        voc_root = root
        batch_size = BATCH
        num_workers = 0
        checkpoint_dir = ckpt
        backbone = None
        parity_split = False
        allow_partial_voc = False
        bf16 = True
        synthetic = False
        transfer_dtype = None

    cfg = cli.build_config(_A)
    params, batch_stats = cli._restore_params(cfg)
    train_recs, val_recs = cli._load_split(cfg, _A)

    from objectdetection_ssd_tpu.eval.evaluate import (evaluate_records,
                                                       exact_eval_postprocess)
    from objectdetection_ssd_tpu.infer.detector import Detector

    # One calibration serves every int8 variant (the head-exclusion policy
    # is applied to the SAME stats tree).
    from objectdetection_ssd_tpu.infer import quant as quant_lib
    qcfg = dataclasses.replace(cfg.quant, int8=True)
    qtree = cli._build_quant(cfg.replace(quant=qcfg), params, batch_stats,
                             records=train_recs)
    qcfg_heads = dataclasses.replace(qcfg, quantize_heads=True)
    qtree_heads = cli._build_quant(cfg.replace(quant=qcfg_heads), params,
                                   batch_stats, records=train_recs)

    pp_exact = exact_eval_postprocess(cfg.postprocess)
    variants = {
        "baseline_f32_exact": dict(),
        "int8": dict(quant=qtree),
        "int8_quantized_heads": dict(quant=qtree_heads),
        "tta_flip": dict(postprocess=dataclasses.replace(
            pp_exact, tta_flip=True)),
        "soft_nms_gaussian": dict(postprocess=dataclasses.replace(
            pp_exact, nms_method="soft_gaussian")),
    }
    base_map = None
    for name, kw in variants.items():
        det = Detector(cfg, params, batch_stats,
                       postprocess_config=kw.get("postprocess", pp_exact),
                       quant=kw.get("quant"))
        t0 = time.perf_counter()
        aps, mean_ap = evaluate_records(cfg, params, val_recs,
                                        batch_stats=batch_stats,
                                        detector=det)
        if base_map is None:
            base_map = mean_ap
        print(json.dumps({
            "stage": f"eval_{name}", "images": len(val_recs),
            "map": round(mean_ap, 5),
            "map_delta_vs_baseline": round(mean_ap - base_map, 5),
            "wall_seconds": round(time.perf_counter() - t0, 1)}))

    # --- QAT stage: fine-tune through fake-quant, re-measure served int8 --
    # (cli train --qat recalibrates on the resumed weights, rebuilds the
    # steps with straight-through fake-quant convs, and trains --qat-epochs
    # more epochs; the checkpoint then serves --int8 with the same scales.)
    # Runs on a COPY of the checkpoint dir: orbax max_to_keep would
    # otherwise garbage-collect the f32 epochs out of the source run.
    if not args.skip_qat:
        import shutil
        from objectdetection_ssd_tpu.train.checkpoint import CheckpointManager
        start_epoch = CheckpointManager(ckpt).latest_epoch()
        ckpt_qat = os.path.join(work, "ckpt_qat")
        if os.path.isdir(ckpt_qat):
            shutil.rmtree(ckpt_qat)
        shutil.copytree(ckpt, ckpt_qat)
        t0 = time.perf_counter()
        cli.main([
            "train", "--voc-root", root,
            "--epochs", str(start_epoch + 1 + args.qat_epochs),
            "--batch-size", str(BATCH), "--num-workers", "0",
            "--checkpoint-dir", ckpt_qat, "--bf16", "--resume", "--qat",
            "--lr", "1e-4", "--no-lr-decay",
            "--image-cache", os.path.join(work, "cache"),
        ])
        print(json.dumps({"stage": "qat_finetuned", "epochs": args.qat_epochs,
                          "from_epoch": start_epoch,
                          "wall_seconds":
                          round(time.perf_counter() - t0, 1)}))
        cfg_qat = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           checkpoint_dir=ckpt_qat))
        params_q, batch_stats_q = cli._restore_params(cfg_qat)
        qtree_post = cli._build_quant(cfg_qat.replace(quant=qcfg), params_q,
                                      batch_stats_q, records=train_recs)
        det = Detector(cfg, params_q, batch_stats_q,
                       postprocess_config=pp_exact, quant=qtree_post)
        aps, qat_map = evaluate_records(cfg, params_q, val_recs,
                                        batch_stats=batch_stats_q,
                                        detector=det)
        print(json.dumps({
            "stage": "eval_int8_after_qat", "map": round(qat_map, 5),
            "map_delta_vs_baseline": round(qat_map - base_map, 5)}))

    # --- same-process throughput A/B: bf16 vs int8 (bench methodology) ---
    import jax
    import jax.numpy as jnp
    import numpy as np
    from objectdetection_ssd_tpu.infer.postprocess import postprocess
    from objectdetection_ssd_tpu.models.ssd import SSD300
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.xla_options import scoped_vmem_options

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = SSD300(dtype=dtype)
    priors = jnp.asarray(priors_lib.ssd300_priors())
    pp_cfg = cfg.postprocess
    images = jax.random.normal(jax.random.PRNGKey(0),
                               (BENCH_BATCH, 300, 300, 3), dtype)
    # The TRAINED params (quantization cost/benefit is weight-distribution
    # dependent only through the scales; throughput is shape-driven).
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    copts = scoped_vmem_options(pp_cfg.scoped_vmem_limit_kib)

    @functools.partial(jax.jit, compiler_options=copts)
    def step(variables, x):
        loc, conf = model.apply(variables, x)
        dets = postprocess(loc, conf, priors, pp_cfg)
        s = jnp.sum(dets.scores) * 1e-9
        return x * (1.0 + s.astype(dtype) * 1e-6)

    n_iters = 20 if on_tpu else 2
    n_windows = 3 if on_tpu else 1
    for name, v in (("bf16", variables),
                    ("int8", dict(variables, quant=jax.tree_util.tree_map(
                        jnp.asarray, qtree)))):
        x = step(v, images)
        float(jnp.sum(x.astype(jnp.float32)))        # compile + warmup fence
        dt = float("inf")
        for _ in range(n_windows):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                x = step(v, x)
            float(jnp.sum(x.astype(jnp.float32)))    # fence
            dt = min(dt, (time.perf_counter() - t0) / n_iters)
        print(json.dumps({"stage": f"throughput_{name}",
                          "batch": BENCH_BATCH,
                          "images_per_sec": round(BENCH_BATCH / dt, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
