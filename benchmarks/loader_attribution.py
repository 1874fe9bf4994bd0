"""Attribute the at-scale training-loader gap and the eval wall (r4 #4/5).

The 16.5k full-scale rehearsal sustained 112.8 img/s against the 216.8
img/s real-loader ceiling measured at 2.5k scale (RESULTS.md "Sustained
REAL-loader"), with the chip idle ~84% of every epoch; its val eval leg
ran at 9.0 img/s and the train-split leg at 54.4 img/s against a 2,294
img/s serving path.  This script decomposes both on the REAL rehearsal
corpus (reuses the workdir's 16,551-image VOC + packed cache; nothing is
regenerated):

Train side, at bs=64 (the rehearsal's) and bs=128 (the ceiling's):
  * host-only loader rate, augment ON (the full decode+augment+collate
    pipeline, no device at all);
  * host-only loader rate, augment OFF (isolates the augment share from
    cache-hit decode + collate);
  * sustained full-train-step rate through prefetch (the rehearsal path:
    loader + shard_batch + jitted step), one epoch.

Eval side, on the val split (1,655 images):
  * Detector compile wall (first batch, exact-eval postprocess);
  * steady-state eval rate after compile (second pass, same Detector —
    the "reuse one Detector across splits" number);
  * steady-state eval rate with the serving-default (approx) postprocess
    (isolates the exact-postprocess share);
  * host-side prep rate alone (decode+resize+normalize, thread pool of 4
    — the eval path's host ceiling).

Usage: python benchmarks/loader_attribution.py [workdir] [--skip-train]
       (workdir default /tmp/full_scale_rehearsal; one JSON line per
       measurement.  Budget ~20 min on a v5e — two timed epochs at the
       sustained rate dominate.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES_HOST_ONLY = 40          # host-only legs: 40 batches is stable


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/full_scale_rehearsal")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()
    root = os.path.join(args.workdir, "voc")
    cache = os.path.join(args.workdir, "cache")
    ckpt = os.path.join(args.workdir, "ckpt")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from objectdetection_ssd_tpu.config import (DataConfig, LossConfig,
                                                OptimConfig, TrainConfig)
    from objectdetection_ssd_tpu.data import voc
    from objectdetection_ssd_tpu.data.pipeline import Loader, prefetch
    from objectdetection_ssd_tpu.models.ssd import SSD300
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    from objectdetection_ssd_tpu.train import loop as loop_lib
    from objectdetection_ssd_tpu.train.state import create_train_state

    records = voc.load_records(root, train=True)
    train_ids, val_ids = voc.train_val_split(len(records), 0.1, 10)
    train_recs = [records[i] for i in train_ids]
    val_recs = [records[i] for i in val_ids]
    print(json.dumps({"stage": "records", "train": len(train_recs),
                      "val": len(val_recs)}), flush=True)

    if not args.skip_train:
        # ---- host-only loader rates (no device work at all) -------------
        for bs in (64, 128):
            for aug in (True, False):
                cfg = DataConfig(batch_size=bs, num_workers=0, augment=aug)
                loader = Loader(train_recs, cfg, image_size=300, train=True,
                                seed=0, cache_path=cache)
                it = loader.epoch(1)
                next(it)                              # warm the cache mmap
                t0 = time.perf_counter()
                n = 0
                for _ in range(BATCHES_HOST_ONLY):
                    next(it)
                    n += bs
                dt = time.perf_counter() - t0
                loader.close()
                print(json.dumps({
                    "stage": "host_only_loader", "batch": bs,
                    "augment": aug,
                    "images_per_sec": round(n / dt, 1),
                    "ms_per_image": round(1e3 * dt / n, 2)}), flush=True)

        # ---- H2D micro-probe: fenced device_put of one uint8 batch ------
        # (the relay's H2D rate with a REAL host-pull fence; CLAUDE.md:
        # block_until_ready does not fence on this backend)
        for bs in (64, 128):
            buf = np.random.randint(0, 255, (bs, 300, 300, 3), np.uint8)
            jax.device_get(jax.device_put(buf)[0, 0, 0, 0])      # warm
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                jax.device_get(jax.device_put(buf)[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "stage": "h2d_fenced_put", "batch": bs,
                "mb": round(buf.nbytes / 1e6, 1),
                "put_ms": round(1e3 * dt, 1),
                "mb_per_sec": round(buf.nbytes / 1e6 / dt, 1)}), flush=True)

        # ---- sustained full train step (the rehearsal path), with the
        # threaded pad+H2D stage (TrainConfig.device_prefetch) A/B'd ----
        on_tpu = jax.devices()[0].platform != "cpu"
        model = SSD300(dtype=jnp.bfloat16 if on_tpu else jnp.float32)
        priors = jnp.asarray(priors_lib.ssd300_priors())
        mesh = mesh_lib.create_mesh()
        for bs in (64, 128):
            cfg = DataConfig(batch_size=bs, num_workers=0, augment=True)
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 300, 300, 3)),
                                       OptimConfig(use_lr_schedule=False))
            state = mesh_lib.replicate(state, mesh)
            train_step, _ = loop_lib.make_jitted_steps(
                priors, LossConfig(), mesh=mesh, donate=True,
                scoped_vmem_limit_kib=TrainConfig().scoped_vmem_limit_kib)
            loader = Loader(train_recs, cfg, image_size=300, train=True,
                            seed=0, cache_path=cache)
            first = next(iter(loader.epoch(0)))
            first = {k: v for k, v in first.items() if k != "image_ids"}
            t0 = time.perf_counter()
            state, metrics = train_step(state,
                                        mesh_lib.shard_batch(first, mesh))
            float(metrics["loss"])
            compile_s = time.perf_counter() - t0

            def _shard_iter(host_iter):
                for batch in host_iter:
                    batch = {k: v for k, v in batch.items()
                             if k != "image_ids"}
                    yield mesh_lib.shard_batch(batch, mesh)

            for dp in (False, True):
                n_steps = 0
                stream = _shard_iter(prefetch(loader.epoch(1)))
                if dp:
                    stream = prefetch(stream)
                t0 = time.perf_counter()
                for batch in stream:
                    state, metrics = train_step(state, batch)
                    n_steps += 1
                float(metrics["loss"])                    # fence
                dt = time.perf_counter() - t0
                print(json.dumps({
                    "stage": "sustained_train", "batch": bs,
                    "device_prefetch": dp,
                    "epoch_images": n_steps * bs,
                    "images_per_sec": round(n_steps * bs / dt, 1),
                    "epoch_wall_s": round(dt, 1),
                    "compile_s": round(compile_s, 1)}), flush=True)
            loader.close()

    if not args.skip_eval:
        # ---- eval decomposition on the val split -------------------------
        from objectdetection_ssd_tpu import cli
        from objectdetection_ssd_tpu.data import pipeline as data_pipeline
        from objectdetection_ssd_tpu.eval.evaluate import (
            evaluate_records, exact_eval_postprocess)
        from objectdetection_ssd_tpu.infer.detector import Detector

        class _A:
            voc_root = root
            batch_size = 64
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

        # host prep ceiling (decode+resize+normalize, pool of 4 like the
        # eval loop)
        from concurrent.futures import ThreadPoolExecutor
        size = cfg.model.image_size

        def prep(rec):
            raw = data_pipeline.load_image(rec.image_path)
            return data_pipeline.preprocess_image(raw, size)

        sample = val_recs[:512]
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(prep, sample[:32]))         # warm
            t0 = time.perf_counter()
            list(pool.map(prep, sample))
            dt = time.perf_counter() - t0
        print(json.dumps({"stage": "eval_host_prep_only",
                          "images_per_sec": round(len(sample) / dt, 1),
                          "ms_per_image":
                          round(1e3 * dt / len(sample), 2)}), flush=True)

        # host prep through the packed cache (eval --image-cache): the PIL
        # JPEG decode is replaced by an mmap'd pixel read.
        from objectdetection_ssd_tpu.data import cache as cache_lib
        val_cache = os.path.join(args.workdir, "cache.val")
        t0 = time.perf_counter()
        cache_lib.build([r.image_path for r in val_recs], val_cache,
                        num_workers=4)
        build_s = time.perf_counter() - t0

        def prep_cached(i):
            raw = cache_lib.get_image(val_cache, i)
            return data_pipeline.preprocess_image(raw, size)

        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(prep_cached, range(32)))    # warm the mmap
            t0 = time.perf_counter()
            list(pool.map(prep_cached, range(len(sample))))
            dt = time.perf_counter() - t0
        print(json.dumps({"stage": "eval_host_prep_cached",
                          "cache_build_s": round(build_s, 1),
                          "images_per_sec": round(len(sample) / dt, 1),
                          "ms_per_image":
                          round(1e3 * dt / len(sample), 2)}), flush=True)

        u8 = cfg.data.transfer_dtype == "uint8"
        warm = (np.zeros((64, size, size, 3), np.uint8) if u8
                else np.zeros((64, size, size, 3), np.float32))
        for name, pp, kw in (
                ("exact", exact_eval_postprocess(cfg.postprocess), {}),
                ("approx", cfg.postprocess, {}),
                ("exact_cached", exact_eval_postprocess(cfg.postprocess),
                 {"image_cache": val_cache})):
            det = Detector(cfg, params, batch_stats, postprocess_config=pp)
            t0 = time.perf_counter()
            # Host pull, not block_until_ready: the relay does not fence
            # on the latter (CLAUDE.md "Hard-won rules").
            jax.device_get(det.detect_batch(warm).scores)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            aps, mean_ap = evaluate_records(cfg, params, val_recs,
                                            batch_stats=batch_stats,
                                            detector=det, **kw)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "stage": f"eval_{name}_postprocess",
                "images": len(val_recs),
                "compile_s": round(compile_s, 1),
                "post_compile_images_per_sec":
                    round(len(val_recs) / dt, 1),
                "map": round(mean_ap, 5),
                "eval_wall_s": round(dt, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
