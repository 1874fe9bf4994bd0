"""Training throughput benchmark: full SSD300 train step on one chip.

Prints one JSON object with images/sec for the complete step (forward +
fused multibox loss + backward + SGD update), bf16 compute / f32 loss and
params, using the chained-dependency methodology (see bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from objectdetection_ssd_tpu.config import (LossConfig, ModelConfig,
                                                OptimConfig)
    from objectdetection_ssd_tpu.models.ssd import build_model
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    from objectdetection_ssd_tpu.train import loop as loop_lib
    from objectdetection_ssd_tpu.train.state import create_train_state

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "bfloat16" if on_tpu else "float32"

    model = build_model(ModelConfig(compute_dtype=dtype))
    priors = jnp.asarray(priors_lib.ssd300_priors())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 300, 300, 3)),
                               OptimConfig(use_lr_schedule=False))
    mesh = mesh_lib.create_mesh()
    state = mesh_lib.replicate(state, mesh)
    train_step, _ = loop_lib.make_jitted_steps(priors, LossConfig(),
                                               mesh=mesh, donate=True)
    rng = np.random.default_rng(0)
    m = 24
    batch = {
        "images": rng.normal(0, 1, (bs, 300, 300, 3)).astype(np.float32),
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
    print(json.dumps({
        "metric": "ssd300_train_images_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": "images/sec",
        "batch_size": bs,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
