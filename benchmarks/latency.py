"""Latency benchmarks: single-image end-to-end detection latency and
NMS-stage latency percentiles on one chip.

BASELINE.md tracks "p50 NMS latency" (no reference number exists — the
reference's NMS is a host-side Python loop with per-class .cpu() pulls,
`Losses.py:27-60`).  Prints one JSON object with p50/p90 for:
  * e2e_bs1   — forward + decode + NMS for a single image;
  * nms_bs1   — decode + NMS alone (the stage the reference does in Python);
  * e2e_bs<N> — per-image latency at the throughput batch size.

Uses the chained-dependency timing methodology (see bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x) -> float:
    return float(sum(jnp.sum(leaf.astype(jnp.float32))
                     for leaf in jax.tree_util.tree_leaves(x)))


def _timed(step, x0, iters):
    x = step(x0)
    _fence(x)                                      # compile + attach fence
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        x = step(x)
        _fence(x)                                  # per-call fence
        times.append(time.perf_counter() - t0)
    return (float(np.percentile(times, 50) * 1e3),
            float(np.percentile(times, 90) * 1e3))


def main() -> int:
    from objectdetection_ssd_tpu.config import PostprocessConfig
    from objectdetection_ssd_tpu.infer.postprocess import postprocess
    from objectdetection_ssd_tpu.models.ssd import SSD300
    from objectdetection_ssd_tpu.ops import priors as priors_lib

    big_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    iters = 30 if on_tpu else 3

    model = SSD300(dtype=dtype)
    priors = jnp.asarray(priors_lib.ssd300_priors())
    cfg = PostprocessConfig()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 300, 300, 3), dtype))

    from objectdetection_ssd_tpu.xla_options import scoped_vmem_options
    copts = scoped_vmem_options(cfg.scoped_vmem_limit_kib)

    def jit(f):
        return jax.jit(f, compiler_options=copts)

    results = {}

    def e2e_step(x):
        loc, conf = model.apply(params, x)
        dets = postprocess(loc.astype(jnp.float32), conf, priors, cfg)
        s = jnp.sum(dets.scores) * 1e-9
        return x * (1.0 + s.astype(dtype) * 1e-6)

    x1 = jax.random.normal(rng, (1, 300, 300, 3), dtype)
    p50, p90 = _timed(jit(e2e_step), x1, iters)
    results["e2e_bs1_p50_ms"] = round(p50, 2)
    results["e2e_bs1_p90_ms"] = round(p90, 2)

    def nms_step(lc):
        loc, conf = lc
        dets = postprocess(loc, conf, priors, cfg)
        s = jnp.sum(dets.scores) * 1e-9
        return (loc * (1.0 + s * 1e-6), conf)

    lc0 = (jax.random.normal(rng, (1, 8732, 4), jnp.float32),
           jax.random.normal(rng, (1, 8732, 21), dtype))
    p50, p90 = _timed(
        jit(nms_step), lc0, iters)
    results["nms_bs1_p50_ms"] = round(p50, 2)
    results["nms_bs1_p90_ms"] = round(p90, 2)

    xb = jax.random.normal(rng, (big_bs, 300, 300, 3), dtype)
    p50, p90 = _timed(jit(e2e_step), xb, max(iters // 3, 2))
    results[f"e2e_bs{big_bs}_p50_ms"] = round(p50, 2)
    results[f"e2e_bs{big_bs}_per_image_ms"] = round(p50 / big_bs, 3)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
