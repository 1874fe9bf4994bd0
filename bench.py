"""Benchmark: SSD300 end-to-end inference throughput on one chip.

Measures forward + decode + on-device NMS (the BASELINE.json headline
config: "SSD300 images/sec/chip (fwd+decode+NMS)") in steady state and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N/2000}

vs_baseline is relative to the 2000 img/s/chip north-star target (the
reference publishes no throughput numbers at all — SURVEY.md §6).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from objectdetection_ssd_tpu.config import PostprocessConfig
    from objectdetection_ssd_tpu.infer.postprocess import postprocess
    from objectdetection_ssd_tpu.models.ssd import SSD300
    from objectdetection_ssd_tpu.ops import priors as priors_lib

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    on_tpu = jax.devices()[0].platform != "cpu"
    # bf16 activations keep the MXU at full rate; f32 on CPU for testing.
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = SSD300(dtype=dtype)
    priors = jnp.asarray(priors_lib.ssd300_priors())
    pp_cfg = PostprocessConfig()

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch_size, 300, 300, 3), jnp.float32)
    params = jax.jit(model.init)(rng, images[:1])

    @jax.jit
    def infer(params, images):
        loc, conf = model.apply(params, images)
        dets = postprocess(loc.astype(jnp.float32),
                           conf.astype(jnp.float32), priors, pp_cfg)
        return dets.boxes_xyxy, dets.scores, dets.classes, dets.valid

    # Warmup / compile.
    jax.block_until_ready(infer(params, images))

    n_iters = 20 if on_tpu else 3
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        jax.block_until_ready(infer(params, images))
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    ips = batch_size / med
    print(json.dumps({
        "metric": "ssd300_infer_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / 2000.0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
