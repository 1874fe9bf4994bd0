"""Training throughput benchmark: full SSD300 train step on one chip.

Prints one JSON object with images/sec for the complete step (forward +
fused multibox loss + backward + SGD update), bf16 compute / f32 loss and
params, using the chained-dependency methodology (see bench.py).

Modes:
  python benchmarks/train_bench.py 128                # synthetic in-memory batch
  python benchmarks/train_bench.py 128 --real-loader  # REAL data/pipeline.py:
      generates a VOC-shaped synthetic dataset (500x375 JPEGs), builds the
      packed decoded-image cache, and streams batches through
      Loader (native augment) + prefetch + shard_batch into the same jitted
      step — the number is sustained end-to-end training throughput
      including ALL host work.  --workers N sets Loader workers.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _real_loader_bench(bs: int, workers: int, num_images: int,
                       augment: bool = True,
                       backbone: str = "vgg16") -> dict:
    from objectdetection_ssd_tpu.config import (Config, DataConfig,
                                                LossConfig, ModelConfig,
                                                OptimConfig, TrainConfig)
    from objectdetection_ssd_tpu.data import synthetic, voc
    from objectdetection_ssd_tpu.data.pipeline import Loader, prefetch
    from objectdetection_ssd_tpu.models.ssd import build_model
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    from objectdetection_ssd_tpu.train import loop as loop_lib
    from objectdetection_ssd_tpu.train.state import create_train_state

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "bfloat16" if on_tpu else "float32"
    size = 300 if backbone == "vgg16" else 224
    tmp = tempfile.mkdtemp(prefix="trainbench_voc_")
    t0 = time.perf_counter()
    synthetic.generate_voc(os.path.join(tmp, "voc"), num_2007=num_images,
                           num_2012=0, image_size=(500, 375), seed=0)
    records = voc.load_records(os.path.join(tmp, "voc"), train=True)
    cfg = DataConfig(batch_size=bs, num_workers=workers, max_boxes=24,
                     augment=augment)
    loader = Loader(records, cfg, image_size=size, train=True, seed=0,
                    cache_path=os.path.join(tmp, "cache"))
    t_setup = time.perf_counter() - t0

    mcfg = ModelConfig(compute_dtype=dtype, backbone=backbone)
    model = build_model(mcfg)
    priors = jnp.asarray(priors_lib.priors_for_model(mcfg))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)),
                               OptimConfig(use_lr_schedule=False))
    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(state, mesh)
    train_step, _ = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=mesh, donate=True,
        scoped_vmem_limit_kib=TrainConfig().scoped_vmem_limit_kib)

    # Warm up compile on the first batch, then time full epochs through
    # prefetch (host batching overlapped with device steps).
    first = next(iter(loader.epoch(0)))
    first = {k: v for k, v in first.items() if k != "image_ids"}
    state, metrics = train_step(state, mesh_lib.shard_batch(first, mesh))
    float(metrics["loss"])

    n_steps = 0
    t0 = time.perf_counter()
    for epoch in range(2):
        for batch in prefetch(loader.epoch(epoch + 1)):
            batch = {k: v for k, v in batch.items() if k != "image_ids"}
            state, metrics = train_step(state,
                                        mesh_lib.shard_batch(batch, mesh))
            n_steps += 1
    float(metrics["loss"])                        # fence
    dt = time.perf_counter() - t0
    loader.close()
    name = "ssd300" if backbone == "vgg16" else "ssd_resnet34"
    return {
        "metric": f"{name}_train_real_loader_images_per_sec_per_chip",
        "value": round(n_steps * bs / dt, 1),
        "unit": "images/sec",
        "batch_size": bs,
        "workers": workers,
        "num_images": len(records),
        "steps": n_steps,
        "augment": augment,
        "setup_seconds": round(t_setup, 1),
    }


def main() -> int:
    from objectdetection_ssd_tpu.config import (LossConfig, ModelConfig,
                                                OptimConfig, TrainConfig)
    from objectdetection_ssd_tpu.models.ssd import build_model
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    from objectdetection_ssd_tpu.train import loop as loop_lib
    from objectdetection_ssd_tpu.train.state import create_train_state

    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", type=int, nargs="?", default=128)
    ap.add_argument("--real-loader", action="store_true")
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--images", type=int, default=1024,
                    help="synthetic dataset size for --real-loader")
    ap.add_argument("--no-augment", action="store_true",
                    help="real-loader mode: skip augmentation (isolates the "
                         "cache-fetch + resize + collate host cost)")
    ap.add_argument("--remat", action="store_true",
                    help="gradient-checkpoint the VGG trunk at stage "
                         "boundaries (A/B for bs>=256)")
    ap.add_argument("--backbone", choices=["vgg16", "resnet34"],
                    default="vgg16",
                    help="model family: SSD300-VGG16 (300px, 8732 priors) "
                         "or SSD-ResNet34 (224px, 189 priors)")
    args = ap.parse_args()
    bs = args.batch_size
    if args.real_loader:
        print(json.dumps(_real_loader_bench(bs, args.workers, args.images,
                                            augment=not args.no_augment,
                                            backbone=args.backbone)))
        return 0
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "bfloat16" if on_tpu else "float32"
    size = 300 if args.backbone == "vgg16" else 224

    mcfg = ModelConfig(compute_dtype=dtype, backbone=args.backbone)
    model = build_model(mcfg)
    priors = jnp.asarray(priors_lib.priors_for_model(mcfg))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)),
                               OptimConfig(use_lr_schedule=False))
    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(state, mesh)
    train_step, _ = loop_lib.make_jitted_steps(
        priors, LossConfig(), mesh=mesh, donate=True, remat=args.remat,
        scoped_vmem_limit_kib=TrainConfig().scoped_vmem_limit_kib)
    rng = np.random.default_rng(0)
    m = 24
    batch = {
        "images": rng.normal(0, 1, (bs, size, size, 3)).astype(np.float32),
        "boxes": np.tile(np.asarray([[[0.1, 0.1, 0.6, 0.6]]], np.float32),
                         (bs, m, 1)),
        "classes": np.tile(np.asarray([[3]], np.int32), (bs, m)),
        "mask": np.ones((bs, m), bool),
    }
    batch = mesh_lib.shard_batch(batch, mesh)

    state, metrics = train_step(state, batch)
    float(metrics["loss"])                        # compile + attach fence
    n = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = train_step(state, batch)
    float(metrics["loss"])                        # fence
    dt = (time.perf_counter() - t0) / n
    name = "ssd300" if args.backbone == "vgg16" else "ssd_resnet34"
    print(json.dumps({
        "metric": f"{name}_train_images_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": "images/sec",
        "batch_size": bs,
        "remat": args.remat,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
