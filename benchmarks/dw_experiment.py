"""Conv-backward attribution + dW-formulation experiments (round 4).

Round 3's ablation (`train_ablation.py`, RESULTS.md) showed backward runs
at ~62% MFU vs ~69% forward and HYPOTHESIZED the filter gradients (dW) of
the high-resolution/low-channel early convs as the cause — but never
measured per-op.  The axon relay exposes no profiler, so this script
attributes cost by GRAPH SURGERY on the full train graph (the only
methodology CLAUDE.md admits: judge formulations inside the FULL graph):

  Attribution ladder (`--mode attrib`): value_and_grad w.r.t. (params,
  images) — the image gradient forces the COMPLETE dX chain down to the
  input no matter which weights are frozen, so `stop_gradient` on a
  layer's weights removes exactly that layer's dW computation and nothing
  else.  Deltas between ladder rungs = per-stage dW cost.  (Plain
  freeze-stages can't isolate dW: freezing conv1-2 kills the dX chain
  below conv3 too.)

  Formulation A/B (`--mode ab`): baseline step vs the same step with
  selected early convs routed through `ops.dw_pallas.conv3x3_dwt` (custom
  VJP: identical forward + dX, Pallas filter-gradient kernel that tiles
  the MXU with full 128-lane occupancy by computing dW^T with the 9*Cin
  taps on the lane axis).

Usage:
  python benchmarks/dw_experiment.py [bs] --mode attrib
  python benchmarks/dw_experiment.py [bs] --mode ab
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time_step(step, carry, iters, fence):
    carry = step(carry)
    fence(carry)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(carry)
        fence(carry)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _path_str(path):
    return "/".join(getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path)


def _stop_weights(params, prefixes):
    """stop_gradient every leaf whose path starts with one of prefixes —
    removes exactly those layers' dW from the backward graph (dX still
    flows through them as values)."""
    import jax.tree_util as jtu

    def f(path, leaf):
        s = _path_str(path)
        if any(s == p or s.startswith(p + "/") for p in prefixes):
            return jax.lax.stop_gradient(leaf)
        return leaf

    return jtu.tree_map_with_path(f, params)


def main() -> int:
    from objectdetection_ssd_tpu.config import (LossConfig, ModelConfig,
                                                ModelConfig as MC)
    from objectdetection_ssd_tpu.losses.multibox import multibox_loss
    from objectdetection_ssd_tpu.models.ssd import build_model
    from objectdetection_ssd_tpu.ops import priors as priors_lib

    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", type=int, nargs="?", default=128)
    ap.add_argument("--mode", choices=["attrib", "ab"], default="attrib")
    args = ap.parse_args()
    bs = args.batch_size
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "bfloat16" if on_tpu else "float32"
    iters = 10 if on_tpu else 2

    model = build_model(ModelConfig(compute_dtype=dtype))
    priors = jnp.asarray(priors_lib.ssd300_priors())
    loss_cfg = LossConfig()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 300, 300, 3)))["params"]

    rng = np.random.default_rng(0)
    m = 24
    boxes = jnp.asarray(np.tile(
        np.asarray([[[0.1, 0.1, 0.6, 0.6]]], np.float32), (bs, m, 1)))
    classes = jnp.asarray(np.tile(np.asarray([[3]], np.int32), (bs, m)))
    mask = jnp.ones((bs, m), bool)
    images = jnp.asarray(
        rng.normal(0, 1, (bs, 300, 300, 3)).astype(np.float32))

    def loss_of(params, images, apply_fn=None):
        fn = apply_fn or (lambda p, x: model.apply({"params": p}, x,
                                                   train=True))
        loc, conf = fn(params, images)
        loss = multibox_loss(loc.astype(jnp.float32),
                             conf.astype(jnp.float32),
                             boxes, classes, mask, priors, loss_cfg)
        return loss.total

    def fence_img(x):
        float(jnp.sum(x.astype(jnp.float32)))

    results = {"batch_size": bs, "mode": args.mode}

    if args.mode == "attrib":
        # value_and_grad over (params, images); ladder of stop-gradient'd
        # weight sets.  Chained: the grads feed a scalar back into images.
        LADDER = [
            ("all_dw", ()),
            ("no_dw_conv1_1_only", ("trunk/conv1_1",)),
            ("no_dw_conv1_2_only", ("trunk/conv1_2",)),
            ("no_dw_conv1", ("trunk/conv1_1", "trunk/conv1_2")),
            ("no_dw_conv12", ("trunk/conv1_1", "trunk/conv1_2",
                              "trunk/conv2_1", "trunk/conv2_2")),
            ("no_dw_conv123", ("trunk/conv1_1", "trunk/conv1_2",
                               "trunk/conv2_1", "trunk/conv2_2",
                               "trunk/conv3_1", "trunk/conv3_2",
                               "trunk/conv3_3")),
            ("no_dw_trunk", ("trunk",)),
        ]
        prev = None
        for name, prefixes in LADDER:
            def f(images, prefixes=prefixes):
                # stop_gradient must wrap the TRACED param argument inside
                # the differentiated function — wrapping the concrete
                # closure arrays evaluates eagerly as identity and the
                # surgery is a silent no-op (the first run of this script
                # made exactly that mistake: five identical graphs, zero
                # deltas).
                def loss_stopped(p, images):
                    if prefixes:
                        p = _stop_weights(p, prefixes)
                    return loss_of(p, images)

                val, (gp, gi) = jax.value_and_grad(
                    loss_stopped, argnums=(0, 1))(params, images)
                gs = sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) * 1e-12
                         for g in jax.tree_util.tree_leaves((gp, gi)))
                return images * (1.0 + (val * 1e-9 + gs) * 1e-6)

            dt = _time_step(jax.jit(f), images, iters, fence_img) * 1e3
            results[f"{name}_ms"] = round(dt, 2)
            if prev is not None:
                results[f"delta_{name}_ms"] = round(prev - dt, 2)
            prev = dt
        print(json.dumps(results))
        return 0

    # ---- mode ab: Pallas dW^T kernel vs XLA native, full graph ----------
    # Per-layer-set variants so each conv's win is attributable (baseline
    # re-timed in the same process).
    SETS = [
        ("xla_native", ()),
        ("pallas_conv1_2", ("conv1_2",)),
        ("pallas_conv1_both", ("conv1_1", "conv1_2")),
        ("pallas_conv12_all", ("conv1_1", "conv1_2",
                               "conv2_1", "conv2_2")),
    ]
    for name, convs in SETS:
        m = build_model(ModelConfig(compute_dtype=dtype,
                                    dw_pallas_convs=convs))

        def f(images, m=m):
            def loss2(p, images):
                return loss_of(p, images,
                               lambda p, x: m.apply({"params": p}, x,
                                                    train=True))
            val, gp = jax.value_and_grad(loss2)(params, images)
            gs = sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) * 1e-12
                     for g in jax.tree_util.tree_leaves(gp))
            return images * (1.0 + (val * 1e-9 + gs) * 1e-6)

        dt = _time_step(jax.jit(f), images, iters, fence_img) * 1e3
        results[f"{name}_ms"] = round(dt, 2)
        results[f"{name}_img_per_s"] = round(bs / (dt / 1e3), 1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
