"""Multi-host helper tests (single-process semantics on the CPU mesh)."""

import jax
import numpy as np
import pytest

from objectdetection_ssd_tpu.parallel import distributed, mesh as mesh_lib


def test_initialize_noop_single_host(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
              "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    distributed.initialize()  # must not raise or block
    # Single-host TPU runtimes set TPU_WORKER_HOSTNAMES to ONE hostname —
    # still a no-op (only a multi-host list is a rendezvous hint).
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    distributed.initialize()
    # Half-configured multi-host env must fail loudly, not run as an
    # orphan single-process job next to the real one.
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "1")
    with pytest.raises(ValueError, match="COORDINATOR_ADDRESS"):
        distributed.initialize()


def test_global_mesh_covers_all_devices():
    m = distributed.create_global_mesh()
    assert m.shape["data"] == len(jax.devices()) == 8


def test_primary_and_shard_bounds():
    assert distributed.is_primary()
    assert distributed.process_index() == 0
    lo, hi = distributed.local_shard_bounds(64)
    assert (lo, hi) == (0, 64)


def test_shard_bounds_multi_process(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert distributed.local_shard_bounds(64) == (32, 48)
    with pytest.raises(ValueError):
        distributed.local_shard_bounds(63)


def test_mesh_multi_axis():
    m = mesh_lib.create_mesh((4, 2), ("data", "model"))
    assert m.shape["data"] == 4 and m.shape["model"] == 2
    assert mesh_lib.local_batch_size(32, m) == 8
    with pytest.raises(ValueError):
        mesh_lib.local_batch_size(30, m)


def test_sharded_detector_matches_single_device():
    """Batched inference sharded over the 8-device mesh must produce the
    same detections as the unsharded path."""
    import dataclasses
    import flax.linen as nn
    import jax.numpy as jnp
    from objectdetection_ssd_tpu.config import Config, ModelConfig
    from objectdetection_ssd_tpu.infer import detector as detector_lib
    from objectdetection_ssd_tpu.infer.postprocess import postprocess

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(8, 8), padding="SAME")(x)
            loc = nn.Conv(4, (1, 1))(x)
            conf = nn.Conv(21, (1, 1))(x)
            return (loc.reshape(x.shape[0], -1, 4),
                    conf.reshape(x.shape[0], -1, 21))

    rng = np.random.default_rng(0)
    pri = np.concatenate([rng.uniform(0.2, 0.8, (16, 2)),
                          np.full((16, 2), 0.3)], 1).astype(np.float32)
    model = Tiny()
    images = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images[:1])["params"]
    cfg = Config(model=ModelConfig(image_size=32))
    pp = dataclasses.replace(cfg.postprocess, per_class_top_k=16, top_k=10,
                             use_approx_top_k=False)

    def build(mesh):
        det = detector_lib.Detector.__new__(detector_lib.Detector)
        det.config = cfg
        det.model = model
        det.params = params
        det.batch_stats = None
        det.pp_config = pp
        det.priors = jnp.asarray(pri)
        det.mesh = mesh

        def _infer(p, bs, imgs):
            loc, conf = model.apply({"params": p}, imgs, train=False)
            return postprocess(loc, conf, det.priors, det.pp_config)

        if mesh is None:
            det._infer = jax.jit(_infer)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            det._infer = jax.jit(
                _infer,
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P()),
                              NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data")))
        return det

    d_single = build(None).detect_batch(images)
    mesh = mesh_lib.create_mesh()
    sharded_images = mesh_lib.shard_batch(images, mesh)
    d_mesh = build(mesh).detect_batch(sharded_images)
    np.testing.assert_array_equal(np.asarray(d_single.valid),
                                  np.asarray(d_mesh.valid))
    np.testing.assert_allclose(np.asarray(d_single.scores),
                               np.asarray(d_mesh.scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_single.boxes_xyxy),
                               np.asarray(d_mesh.boxes_xyxy), atol=1e-6)


def test_evaluate_records_data_parallel_matches_single(tmp_path):
    """`evaluate_records(mesh=...)` (the `cli eval --data-parallel N` path)
    must score identically to the single-device evaluator: same per-class
    APs, same mAP, with the batch size rounded up to the mesh's batch ways
    so every shard is non-empty."""
    import dataclasses
    import flax.linen as nn
    import jax.numpy as jnp
    from objectdetection_ssd_tpu.config import Config, DataConfig, ModelConfig
    from objectdetection_ssd_tpu.data import synthetic, voc
    from objectdetection_ssd_tpu.eval.evaluate import evaluate_records
    from objectdetection_ssd_tpu.infer import detector as detector_lib
    from objectdetection_ssd_tpu.infer.postprocess import postprocess

    synthetic.generate_voc(str(tmp_path), num_2007=10, num_2012=0,
                           image_size=(96, 96), seed=3)
    records = voc.load_records(str(tmp_path), train=True)
    cfg = Config(model=ModelConfig(image_size=32),
                 data=DataConfig(voc_root=str(tmp_path), batch_size=6,
                                 num_workers=0))

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(8, 8), padding="SAME")(x)
            loc = nn.Conv(4, (1, 1))(x)
            conf = nn.Conv(21, (1, 1))(x)
            return (loc.reshape(x.shape[0], -1, 4),
                    conf.reshape(x.shape[0], -1, 21))

    rng = np.random.default_rng(0)
    pri = np.concatenate([rng.uniform(0.2, 0.8, (16, 2)),
                          np.full((16, 2), 0.3)], 1).astype(np.float32)
    model = Tiny()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    pp = dataclasses.replace(cfg.postprocess, per_class_top_k=16, top_k=10,
                             use_approx_top_k=False)

    def build(mesh):
        det = detector_lib.Detector.__new__(detector_lib.Detector)
        det.config = cfg
        det.model = model
        det.params = params
        det.batch_stats = None
        det.pp_config = pp
        det.priors = jnp.asarray(pri)
        det.mesh = mesh

        def _infer(p, bs, imgs):
            loc, conf = model.apply({"params": p}, imgs, train=False)
            return postprocess(loc, conf, det.priors, det.pp_config)

        if mesh is None:
            det._infer = jax.jit(_infer)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            det._infer = jax.jit(
                _infer,
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P()),
                              NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data")))
        return det

    aps_s, map_s = evaluate_records(cfg, params, records,
                                    detector=build(None))
    # cfg batch 6 is NOT divisible by the 8-way mesh: exercises the
    # round-up (6 -> 8) that keeps every shard non-empty.
    mesh = mesh_lib.create_mesh()
    aps_m, map_m = evaluate_records(cfg, params, records,
                                    detector=build(mesh))
    assert aps_s == aps_m
    np.testing.assert_allclose(map_s, map_m, rtol=1e-12)
