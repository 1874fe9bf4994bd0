"""mAP-at-scale rehearsal: the best available in-container proxy for the
reference's headline deliverable (VOC val mAP 0.6464, README.md:157).

The container has no VOC download and no pretrained weights (zero egress),
so true mAP parity cannot be measured here; every mAP-determining component
is instead oracle-pinned against executed reference code
(tests/test_reference_parity.py).  This rehearsal drives the REAL SSD300
(not a test double) through the REAL user surface (`cli.py train`) on a
learnable all-20-class synthetic VOC at thousands-of-images scale, then
measures the three open questions from the round-2 review:

  (a) full eval-path wall time at ~5k images (the reference protocol's
      scale: VOC07+12 val);
  (b) approx-vs-exact postprocess mAP delta on a TRAINED model — backing
      the "lossless in practice" claim on the serving defaults
      (config.py PostprocessConfig);
  (c) per-class AP report format parity (`cli.py eval` output vs the
      reference's per-class AP prints, Util.py:883 / README.md:134-190).

Usage:  python benchmarks/map_rehearsal.py [workdir]
Prints one JSON line per measurement; ~30-60 min on a v5e chip (host-bound
input pipeline in this 1-core container).
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_IMAGES_2007 = 2200
TRAIN_IMAGES_2012 = 300
EVAL_SCALE_IMAGES = 5000
EPOCHS = 40
BATCH = 64


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/map_rehearsal"
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "voc")
    big_root = os.path.join(work, "voc5k")
    ckpt = os.path.join(work, "ckpt")

    from objectdetection_ssd_tpu import cli
    from objectdetection_ssd_tpu.data import synthetic, voc

    synthetic.generate_voc(root, num_2007=TRAIN_IMAGES_2007,
                           num_2012=TRAIN_IMAGES_2012,
                           image_size=(400, 300), max_objects=4, seed=11,
                           class_color_coding=True)
    print(json.dumps({"stage": "generated", "images":
                      TRAIN_IMAGES_2007 + TRAIN_IMAGES_2012}))

    # --- train the real SSD300 from scratch through the real CLI ---------
    # Resumable: an existing checkpoint in the workdir skips the ~40-epoch
    # train so follow-up measurements (e.g. the int8 leg) can rerun alone.
    have_ckpt = os.path.isdir(ckpt) and bool(os.listdir(ckpt))
    t0 = time.perf_counter()
    if not have_ckpt:
        cli.main([
            "train", "--voc-root", root, "--epochs", str(EPOCHS),
            "--batch-size", str(BATCH), "--num-workers", "0",
            "--checkpoint-dir", ckpt, "--bf16",
            "--lr", "5e-4", "--warmup-steps", "300", "--no-lr-decay",
            "--image-cache", os.path.join(work, "cache"),
            "--eval-map-every", "10",
        ])
        train_s = time.perf_counter() - t0
        print(json.dumps({"stage": "trained", "epochs": EPOCHS,
                          "wall_seconds": round(train_s, 1)}))
    else:
        print(json.dumps({"stage": "trained", "skipped": True,
                          "checkpoint": ckpt}))

    # --- (c) per-class AP report through `cli eval` ----------------------
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        cli.main(["eval", "--voc-root", root, "--checkpoint-dir", ckpt,
                  "--batch-size", str(BATCH)])
    report = buf.getvalue()
    print(report)
    val_map = float(report.strip().rsplit("=", 1)[-1])
    # Count only per-class lines ("<class>  AP = x"); "mAP =" would match a
    # bare "AP =" substring search and inflate the count by one.
    import re
    per_class = len(re.findall(r"^\s*\w+\s+AP = ", report, re.MULTILINE))
    print(json.dumps({"stage": "cli_eval", "val_map": val_map,
                      "wall_seconds": round(time.perf_counter() - t0, 1),
                      "per_class_lines": per_class}))

    # --- (a)+(b): 5k-image eval wall time, approx vs exact ---------------
    synthetic.generate_voc(big_root, num_2007=EVAL_SCALE_IMAGES, num_2012=0,
                           image_size=(400, 300), max_objects=4, seed=12,
                           class_color_coding=True)
    records = voc.load_records(big_root, train=True)

    import dataclasses

    from objectdetection_ssd_tpu.eval.evaluate import (evaluate_records,
                                                       exact_eval_postprocess)
    from objectdetection_ssd_tpu.infer.detector import Detector

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

    results = {}
    for mode in ("approx", "exact"):
        pp = (exact_eval_postprocess(cfg.postprocess) if mode == "exact"
              else cfg.postprocess)
        det = Detector(cfg, params, batch_stats, postprocess_config=pp)
        t0 = time.perf_counter()
        aps, mean_ap = evaluate_records(cfg, params, records,
                                        batch_stats=batch_stats,
                                        detector=det)
        dt = time.perf_counter() - t0
        results[mode] = mean_ap
        print(json.dumps({
            "stage": f"eval5k_{mode}", "images": len(records),
            "map": round(mean_ap, 5), "wall_seconds": round(dt, 1),
            "images_per_sec": round(len(records) / dt, 1)}))
    print(json.dumps({
        "stage": "approx_vs_exact",
        "map_delta": round(results["approx"] - results["exact"], 6)}))

    # --- int8 PTQ mAP at scale -------------------------------------------
    # The int8 serving path (infer/quant.py; measured +43% e2e on the v5e)
    # quantifies its accuracy cost here on the SAME trained model and 5k
    # protocol: calibrate on train-split images (the standard PTQ recipe,
    # cli._build_quant), evaluate with the exact postprocess, report the
    # delta vs the f32/bf16 exact run above.
    qcfg = dataclasses.replace(cfg.quant, int8=True)
    cfg_q = dataclasses.replace(cfg, quant=qcfg)
    train_recs = voc.load_records(root, train=True)
    quant = cli._build_quant(cfg_q, params, batch_stats, records=train_recs)
    pp = exact_eval_postprocess(cfg.postprocess)
    det = Detector(cfg, params, batch_stats, postprocess_config=pp,
                   quant=quant)
    t0 = time.perf_counter()
    aps, int8_map = evaluate_records(cfg, params, records,
                                     batch_stats=batch_stats, detector=det)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "eval5k_int8_exact", "images": len(records),
        "map": round(int8_map, 5), "wall_seconds": round(dt, 1),
        "images_per_sec": round(len(records) / dt, 1),
        "int8_vs_f32_map_delta": round(int8_map - results["exact"], 6)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
