"""Train-step time breakdown by ablation (single process, same-session A/Bs).

The train MFU is ~65.6% at bs=128 (train_bench.py); this script attributes
the residual by timing nested subgraphs of the real step with the
chained-dependency methodology (see bench.py docstring):

  fwd        — model forward only (loc/conf heads)
  fwd_loss   — + fused multibox loss (match + encode + CE + HNM + L1)
  fwd_bwd    — + backward (jax.grad over params), no update
  full       — the real jitted train step (backward + SGD update)

Differences between consecutive rows isolate loss-forward, backward, and
optimizer/update cost.  Ablations run in ONE process back to back because
the axon relay wanders ~1% run-to-run (benchmarks/RESULTS.md).

Usage: python benchmarks/train_ablation.py [batch_size]
"""

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
    fence(carry)                                  # compile + attach
    best = float("inf")
    for _ in range(3):                            # best of 3 windows
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(carry)
        fence(carry)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    from objectdetection_ssd_tpu.config import (LossConfig, ModelConfig,
                                                OptimConfig)
    from objectdetection_ssd_tpu.losses.multibox import multibox_loss
    from objectdetection_ssd_tpu.models.ssd import build_model
    from objectdetection_ssd_tpu.ops import priors as priors_lib
    from objectdetection_ssd_tpu.parallel import mesh as mesh_lib
    from objectdetection_ssd_tpu.train import loop as loop_lib
    from objectdetection_ssd_tpu.train.state import create_train_state

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "bfloat16" if on_tpu else "float32"
    iters = 10 if on_tpu else 2

    model = build_model(ModelConfig(compute_dtype=dtype))
    priors = jnp.asarray(priors_lib.ssd300_priors())
    loss_cfg = LossConfig()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 300, 300, 3)),
                               OptimConfig(use_lr_schedule=False))
    params = state.params

    rng = np.random.default_rng(0)
    m = 24
    batch = {
        "images": jnp.asarray(
            rng.normal(0, 1, (bs, 300, 300, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.tile(
            np.asarray([[[0.1, 0.1, 0.6, 0.6]]], np.float32), (bs, m, 1))),
        "classes": jnp.asarray(np.tile(np.asarray([[3]], np.int32), (bs, m))),
        "mask": jnp.ones((bs, m), bool),
    }

    def loss_fn(params, images):
        loc, conf = model.apply({"params": params}, images, train=True)
        loss = multibox_loss(loc.astype(jnp.float32),
                             conf.astype(jnp.float32),
                             batch["boxes"], batch["classes"],
                             batch["mask"], priors, loss_cfg)
        return loss.total

    results = {}

    # 1) forward only: heads reduced to a scalar, chained into the input.
    @jax.jit
    def fwd(images):
        loc, conf = model.apply({"params": params}, images, train=True)
        s = (jnp.sum(loc.astype(jnp.float32)) +
             jnp.sum(conf.astype(jnp.float32))) * 1e-12
        return images * (1.0 + s * 1e-6)

    def fence_img(x):
        float(jnp.sum(x.astype(jnp.float32)))

    dt = _time_step(fwd, batch["images"], iters, fence_img)
    results["fwd_ms"] = round(dt * 1e3, 2)

    # 2) forward + loss (no backward).
    @jax.jit
    def fwd_loss(images):
        val = loss_fn(params, images)
        return images * (1.0 + val * 1e-9)

    dt = _time_step(fwd_loss, batch["images"], iters, fence_img)
    results["fwd_loss_ms"] = round(dt * 1e3, 2)

    # 3) forward + loss + backward over params (no optimizer update).
    #    Chain through a scalar derived from the grads so the whole
    #    backward sweep is on the timed path.
    @jax.jit
    def fwd_bwd(images):
        val, grads = jax.value_and_grad(loss_fn)(params, images)
        gs = sum(jnp.sum(jnp.abs(g).astype(jnp.float32)) * 1e-12
                 for g in jax.tree_util.tree_leaves(grads))
        return images * (1.0 + (val * 1e-9 + gs) * 1e-6)

    dt = _time_step(fwd_bwd, batch["images"], iters, fence_img)
    results["fwd_bwd_ms"] = round(dt * 1e3, 2)

    # 4) the real train step (adds the SGD+momentum update; donated state).
    from objectdetection_ssd_tpu.config import TrainConfig
    mesh = mesh_lib.create_mesh()
    st = mesh_lib.replicate(state, mesh)
    train_step, _ = loop_lib.make_jitted_steps(
        priors, loss_cfg, mesh=mesh, donate=True,
        scoped_vmem_limit_kib=TrainConfig().scoped_vmem_limit_kib)
    sb = mesh_lib.shard_batch(dict(batch), mesh)

    def full(carry):
        st, _ = carry
        st, metrics = train_step(st, sb)
        return (st, metrics)

    def fence_full(carry):
        float(carry[1]["loss"])

    dt = _time_step(full, (st, None), iters, fence_full)
    results["full_step_ms"] = round(dt * 1e3, 2)

    results.update({
        "batch_size": bs,
        "loss_fwd_delta_ms": round(
            results["fwd_loss_ms"] - results["fwd_ms"], 2),
        "backward_delta_ms": round(
            results["fwd_bwd_ms"] - results["fwd_loss_ms"], 2),
        "update_delta_ms": round(
            results["full_step_ms"] - results["fwd_bwd_ms"], 2),
        "full_step_img_per_s": round(bs / (results["full_step_ms"] / 1e3), 1),
    })
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
