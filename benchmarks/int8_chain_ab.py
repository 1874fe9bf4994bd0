"""Same-process A/B: int8 requant CHAINING on vs off (round-4 verdict #3).

Round 3 measured int8 e2e at 3306.9 img/s = 48-49% of the int8 MXU peak
and attributed the ~18 ms/step residual to the per-conv f32->int8->f32
round trip (RESULTS.md "Why +43% and not 2x").  Round 4's fix
(`infer/quant.py:chain_scales`) requantizes each chained conv's int32
accumulator straight into the NEXT conv's activation scale — one fused
rescale, relu/max-pool on the int8 tensor, no bf16 materialization
between the 17 VGG16 chain edges.  Bit-exactness vs the unchained graph
is pinned in tests/test_quant.py; THIS script measures the throughput
claim, in ONE process (CLAUDE.md: the axon relay's run-to-run jitter
makes cross-process comparisons lie) with bench.py's chained-dependency
methodology.

Variants: bf16 (no quant), int8 unchained, int8 chained — each e2e
(forward + decode + NMS) and forward-only (the postprocess tail is
quant-invariant, so forward-only isolates what chaining can touch).

Usage: python benchmarks/int8_chain_ab.py [batch]   (default 256)
Prints one JSON line per variant.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from objectdetection_ssd_tpu.config import PostprocessConfig
    from objectdetection_ssd_tpu.infer import quant as quant_lib
    from objectdetection_ssd_tpu.infer.postprocess import postprocess
    from objectdetection_ssd_tpu.models.ssd import SSD300
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.xla_options import scoped_vmem_options

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = SSD300(dtype=dtype)
    priors = jnp.asarray(priors_lib.ssd300_priors())
    pp_cfg = PostprocessConfig()
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, 300, 300, 3), dtype)
    params = jax.jit(model.init)(rng, images[:1])

    stats = quant_lib.calibrate(model, params["params"],
                                [np.asarray(images[:8], np.float32)])
    q_unchained = quant_lib.act_scales(stats)
    q_chained = quant_lib.chain_scales(q_unchained, "vgg16")
    # Heads-int8 ("full quant") isolates how much of the residual the
    # heads-stay-f32 accuracy policy costs in throughput.
    q_full = quant_lib.chain_scales(
        quant_lib.act_scales(stats, quantize_heads=True), "vgg16")
    as_dev = functools.partial(jax.tree_util.tree_map, jnp.asarray)

    copts = scoped_vmem_options(pp_cfg.scoped_vmem_limit_kib)

    def make_step(forward_only):
        @functools.partial(jax.jit, compiler_options=copts)
        def step(variables, x):
            loc, conf = model.apply(variables, x)
            if forward_only:
                s = (jnp.sum(loc.astype(jnp.float32)) +
                     jnp.sum(conf.astype(jnp.float32))) * 1e-9
            else:
                dets = postprocess(loc, conf, priors, pp_cfg)
                s = jnp.sum(dets.scores) * 1e-9
            return x * (1.0 + s.astype(dtype) * 1e-6)
        return step

    n_iters = 20 if on_tpu else 2
    n_windows = 3 if on_tpu else 1
    variants = [
        ("bf16", dict(params)),
        ("int8_unchained", dict(params, quant=as_dev(q_unchained))),
        ("int8_chained", dict(params, quant=as_dev(q_chained))),
        ("int8_chained_fullquant", dict(params, quant=as_dev(q_full))),
    ]
    for fwd_only in (False, True):
        step = make_step(fwd_only)
        for name, v in variants:
            x = step(v, images)
            float(jnp.sum(x.astype(jnp.float32)))   # compile+warmup fence
            dt = float("inf")
            for _ in range(n_windows):
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    x = step(v, x)
                float(jnp.sum(x.astype(jnp.float32)))   # fence
                dt = min(dt, (time.perf_counter() - t0) / n_iters)
            print(json.dumps({
                "variant": name + ("_fwdonly" if fwd_only else "_e2e"),
                "batch": batch,
                "images_per_sec": round(batch / dt, 1),
                "step_ms": round(dt * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
