"""Integration tests: synthetic VOC -> Trainer -> checkpoints -> resume, and
the detector/eval path, exercising every layer together (SURVEY.md §4)."""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_ssd_tpu.config import (Config, DataConfig, ModelConfig,
                                            OptimConfig, PostprocessConfig,
                                            TrainConfig)
from objectdetection_ssd_tpu.data import synthetic, voc
from objectdetection_ssd_tpu.data.pipeline import Loader
from objectdetection_ssd_tpu.train.trainer import Trainer


class TinyDet(nn.Module):
    """Small conv detector with the SSD output contract, for fast CPU runs.
    (The full SSD300 path is covered by model/convert/postprocess tests.)"""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(16, (5, 5), strides=(8, 8), padding="SAME")(x)  # 64->8
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME")(x)  # 8->4
        x = nn.relu(x)
        loc = nn.Conv(4, (3, 3), padding="SAME")(x)
        conf = nn.Conv(21, (3, 3), padding="SAME")(x)
        return loc.reshape(x.shape[0], -1, 4), conf.reshape(
            x.shape[0], -1, 21)


def _tiny_priors():
    centers = (np.arange(4) + 0.5) / 4
    cy, cx = np.meshgrid(centers, centers, indexing="ij")
    return np.stack([cx.ravel(), cy.ravel(),
                     np.full(16, 0.3), np.full(16, 0.3)], 1).astype(
                         np.float32)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    synthetic.generate_voc(str(root), num_2007=20, num_2012=4,
                           image_size=(96, 96), seed=7)
    records = voc.load_records(str(root), train=True)
    cfg = Config(
        model=ModelConfig(image_size=64),
        data=DataConfig(voc_root=str(root), batch_size=8, num_workers=0,
                        max_boxes=8),
        optim=OptimConfig(lr=0.01, use_lr_schedule=False),
        train=TrainConfig(num_epochs=2, seed=0,
                          checkpoint_dir=str(
                              tmp_path_factory.mktemp("ckpt")),
                          log_every_steps=0),
    )
    return records, cfg


def test_trainer_fit_eval_checkpoint_resume(tiny_setup):
    records, cfg = tiny_setup
    train_ids, val_ids = voc.train_val_split(len(records), 1 / 3, seed=10)
    train_loader = Loader([records[i] for i in train_ids], cfg.data,
                          cfg.model.image_size, train=True, seed=0)
    eval_loader = Loader([records[i] for i in val_ids], cfg.data,
                         cfg.model.image_size, train=False, drop_last=True)

    trainer = Trainer(cfg, train_loader, eval_loader,
                      model=TinyDet(), priors=_tiny_priors())
    assert not trainer.maybe_resume()       # no checkpoint yet
    state = trainer.fit()
    assert int(state.step) == 2 * len(train_loader)
    assert len(trainer.history["train"]) == 2
    assert len(trainer.history["test"]) == 2
    assert np.isfinite(trainer.history["train"]).all()
    # loss should drop across epochs on this trivially small set
    assert trainer.history["train"][1] < trainer.history["train"][0] * 1.5

    # Resume continues from the saved epoch with history intact.
    trainer2 = Trainer(cfg, train_loader, eval_loader,
                       model=TinyDet(), priors=_tiny_priors())
    assert trainer2.maybe_resume()
    assert trainer2.start_epoch == 2
    assert trainer2.history["train"] == trainer.history["train"]
    state2 = trainer2.fit(num_epochs=3)     # one more epoch
    assert int(state2.step) == 3 * len(train_loader)


def test_evaluate_records_runs(tiny_setup):
    records, cfg = tiny_setup
    from objectdetection_ssd_tpu.eval.evaluate import evaluate_records
    model = TinyDet()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)))["params"]

    # Monkeypatch-free: evaluate via a Detector built around TinyDet by
    # swapping the registry model through config is heavier than needed —
    # instead check the evaluator contract through the public Detector path
    # with the tiny model injected.
    from objectdetection_ssd_tpu.infer import detector as detector_lib
    det = detector_lib.Detector.__new__(detector_lib.Detector)
    det.config = cfg
    det.model = model
    det.params = params
    det.batch_stats = None
    det.pp_config = dataclasses.replace(
        cfg.postprocess, per_class_top_k=16, top_k=20)
    det.priors = jnp.asarray(_tiny_priors())

    def _infer(params, batch_stats, images):
        from objectdetection_ssd_tpu.infer.postprocess import postprocess
        loc, conf = model.apply({"params": params}, images, train=False)
        return postprocess(loc, conf, det.priors, det.pp_config)

    det._infer = jax.jit(_infer)
    dets = det.detect_batch(jnp.zeros((2, 64, 64, 3)))
    assert dets.boxes_xyxy.shape == (2, 20, 4)

    results = det.detect_images([records[0].image_path])
    assert set(results[0].keys()) == {"boxes_xyxy", "classes", "labels",
                                      "scores"}

    # Chunked path: 5 images at batch_size=2 runs three fixed-shape (2, ...)
    # batches (tail padded by repetition) — one compilation, 5 results, and
    # identical output to the single-image call.
    paths5 = [records[i % len(records)].image_path for i in range(5)]
    results5 = det.detect_images(paths5, batch_size=2)
    assert len(results5) == 5
    # The two calls run at different compiled batch shapes (8 vs 2), so XLA
    # fusion noise up to ~1e-5 relative is expected; sub-0.01-pixel agreement
    # is identity for detection purposes.
    np.testing.assert_allclose(results5[0]["boxes_xyxy"],
                               results[0]["boxes_xyxy"], rtol=1e-5,
                               atol=0.01)


def test_bounded_map_is_ordered_and_lazy():
    """Eval's prep prefetch must bound in-flight work: `Executor.map`
    submits every item up front, so a slow consumer accumulates the whole
    decoded corpus in completed futures (gigabytes at VOC val scale)."""
    import time
    from concurrent.futures import ThreadPoolExecutor
    from objectdetection_ssd_tpu.eval.evaluate import _bounded_map

    started = []
    def fn(x):
        started.append(x)
        return x * 2

    with ThreadPoolExecutor(max_workers=4) as pool:
        gen = _bounded_map(pool, fn, range(100), window=6)
        first = next(gen)
        time.sleep(0.3)     # give an eager impl time to run everything
        # window of 6 + the one refill after the first yield
        assert len(started) <= 7, (
            f"{len(started)} items ran with only one consumed — "
            "the window is not bounding submission")
        rest = list(gen)
    assert [first] + rest == [x * 2 for x in range(100)]   # ordered, complete


def test_detector_applies_compilation_cache_from_config(tiny_setup, tmp_path):
    """`TrainConfig.compilation_cache_dir` must not be write-only: a
    programmatic Detector (no CLI) enables the persistent cache itself."""
    records, cfg = tiny_setup
    from objectdetection_ssd_tpu.infer import detector as detector_lib
    cache = str(tmp_path / "xla_cache")
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, compilation_cache_dir=cache))
    old = (jax.config.jax_compilation_cache_dir,
           jax.config.jax_persistent_cache_min_compile_time_secs,
           jax.config.jax_persistent_cache_min_entry_size_bytes)
    try:
        model = TinyDet()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
        detector_lib.Detector(cfg2, params, model=model,
                              priors=_tiny_priors())
        assert jax.config.jax_compilation_cache_dir == cache
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
    finally:
        jax.config.update("jax_compilation_cache_dir", old[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old[1])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          old[2])


def test_evaluate_records_image_cache_bit_exact(tiny_setup, tmp_path):
    """evaluate_records(image_cache=...) must score identically to the
    JPEG-decode path: load_image is uint8/255, so the cache's uint8 round
    trip is the identity and the mAP/APs must match exactly (not approx)."""
    records, cfg = tiny_setup
    from objectdetection_ssd_tpu.eval.evaluate import evaluate_records
    from objectdetection_ssd_tpu.infer import detector as detector_lib
    from objectdetection_ssd_tpu.infer.postprocess import postprocess

    model = TinyDet()
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    det = detector_lib.Detector.__new__(detector_lib.Detector)
    det.config = cfg
    det.model = model
    det.params = params
    det.batch_stats = None
    det.pp_config = dataclasses.replace(
        cfg.postprocess, per_class_top_k=16, top_k=20,
        use_approx_top_k=False)
    det.priors = jnp.asarray(_tiny_priors())

    def _infer(p, bs, imgs):
        loc, conf = model.apply({"params": p}, imgs, train=False)
        return postprocess(loc, conf, det.priors, det.pp_config)

    det._infer = jax.jit(_infer)

    recs = records[:10]
    aps_plain, map_plain = evaluate_records(cfg, params, recs, detector=det)
    cache = str(tmp_path / "evalcache")
    aps_cached, map_cached = evaluate_records(cfg, params, recs,
                                              detector=det,
                                              image_cache=cache)
    assert aps_plain == aps_cached
    assert map_plain == map_cached
    # Second cached run reuses the built cache (idempotent build).
    aps2, map2 = evaluate_records(cfg, params, recs, detector=det,
                                  image_cache=cache)
    assert map2 == map_cached


def test_emergency_checkpoint_on_failure(tiny_setup, tmp_path):
    records, cfg = tiny_setup
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       checkpoint_dir=str(tmp_path / "ck")))
    train_ids, _ = voc.train_val_split(len(records), 1 / 3, seed=10)
    loader = Loader([records[i] for i in train_ids], cfg.data,
                    cfg.model.image_size, train=True, seed=0)
    trainer = Trainer(cfg, loader, None, model=TinyDet(),
                      priors=_tiny_priors())

    boom = RuntimeError("injected fault")

    def fail_callback(epoch, tr):
        if epoch == 0:
            raise boom

    trainer.epoch_callback = fail_callback
    with pytest.raises(RuntimeError):
        trainer.fit()
    # the emergency checkpoint must exist and be resumable
    trainer2 = Trainer(cfg, loader, None, model=TinyDet(),
                       priors=_tiny_priors())
    assert trainer2.maybe_resume()
    assert trainer2.start_epoch >= 1


def test_detector_from_checkpoint_missing_raises(tmp_path):
    # No checkpoint present: from_checkpoint must FAIL LOUDLY (a typo'd dir
    # silently serving random-weight garbage was a round-1 weakness); the
    # explicit allow_random_init opt-in still serves the inference path.
    from objectdetection_ssd_tpu.infer.detector import Detector
    cfg = Config(
        model=ModelConfig(image_size=300, backbone="vgg16"),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "none")),
    )
    with pytest.raises(FileNotFoundError, match="allow_random_init"):
        Detector.from_checkpoint(cfg)
    det = Detector.from_checkpoint(cfg, allow_random_init=True)
    assert det.params is not None


def test_cli_eval_missing_checkpoint_errors(tmp_path):
    from objectdetection_ssd_tpu import cli
    from objectdetection_ssd_tpu.data import synthetic
    root = tmp_path / "voc"
    synthetic.generate_voc(str(root), num_2007=12, num_2012=0,
                           image_size=(64, 64), seed=1)
    with pytest.raises(SystemExit, match="no checkpoint"):
        cli.main(["eval", "--voc-root", str(root),
                  "--checkpoint-dir", str(tmp_path / "nope"),
                  "--num-workers", "0"])


def test_tta_flip_recovers_mirror_only_detection(monkeypatch):
    """End-to-end check of the TTA mirror math (`infer/detector.py`): a
    direction-sensitive model that fires ONLY when the bright blob is in
    the LEFT half of its input cannot detect a right-side object — unless
    tta_flip runs the mirrored view and maps its box back.  The recovered
    detection must land at the MIRRORED prior location (cx 0.25 -> 0.75),
    proving decode -> mirror -> re-encode round-trips exactly."""
    from objectdetection_ssd_tpu.infer import detector as detector_lib

    class LeftEye(nn.Module):
        """Parameter-free detector: one anchor; class-1 logit is positive
        iff the left half of the image is brighter than the right."""

        @nn.compact
        def __call__(self, x, train=False):
            half = x.shape[2] // 2
            left = jnp.mean(x[:, :, :half, :], axis=(1, 2, 3))
            right = jnp.mean(x[:, :, half:, :], axis=(1, 2, 3))
            logit = 40.0 * (left - right)                    # (B,)
            conf = jnp.full((x.shape[0], 1, 21), -20.0)
            conf = conf.at[:, 0, 20].set(0.0)   # background (LAST channel)
            conf = conf.at[:, 0, 1].set(logit)  # foreground class 1
            loc = jnp.zeros((x.shape[0], 1, 4))              # box == prior
            return loc, conf

    prior = np.array([[0.25, 0.5, 0.2, 0.2]], np.float32)    # cx cy w h
    monkeypatch.setattr(detector_lib, "build_model",
                        lambda mc: LeftEye())
    monkeypatch.setattr(detector_lib.priors_lib, "priors_for_model",
                        lambda mc, pc: prior)

    cfg = Config(model=ModelConfig(image_size=32))
    pp = dataclasses.replace(cfg.postprocess, use_approx_top_k=False,
                             anchor_prefilter=0, per_class_top_k=4,
                             top_k=4)
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[:, :, 16:, :] = 1.0                                  # bright RIGHT

    det = detector_lib.Detector(cfg, params={}, postprocess_config=pp)
    assert int(np.sum(np.asarray(det.detect_batch(img).valid))) == 0

    det_tta = detector_lib.Detector(
        cfg, params={},
        postprocess_config=dataclasses.replace(pp, tta_flip=True))
    out = jax.device_get(det_tta.detect_batch(img))
    assert int(np.sum(out.valid)) == 1
    i = int(np.argmax(out.valid[0]))
    assert int(out.classes[0, i]) == 1
    # prior at cx=0.25 seen in the mirrored view -> box mirrored to 0.75
    np.testing.assert_allclose(out.boxes_xyxy[0, i],
                               [0.65, 0.4, 0.85, 0.6], atol=1e-5)

    # Flip-invariance: the SAME TTA detector on the mirrored image must
    # produce the mirrored detection (direct view fires this time).
    out_m = jax.device_get(det_tta.detect_batch(img[:, :, ::-1, :]))
    assert int(np.sum(out_m.valid)) == 1
    j = int(np.argmax(out_m.valid[0]))
    np.testing.assert_allclose(out_m.boxes_xyxy[0, j],
                               [0.15, 0.4, 0.35, 0.6], atol=1e-5)


def test_mirror_permutation_real_grids():
    """The flip-AVERAGED TTA mode depends on the real anchor grids being
    mirror-symmetric; pin that property (and its known edge: the resnet34
    set contains one exactly-duplicated (0.5,0.5,1,1) prior, whose twin
    is an identical anchor, so pairing either is correct)."""
    from objectdetection_ssd_tpu.infer.detector import mirror_permutation
    from objectdetection_ssd_tpu.ops.priors import (resnet34_priors,
                                                    ssd300_priors)
    p = np.asarray(ssd300_priors())
    perm = mirror_permutation(p)
    assert perm is not None
    assert np.all(perm[perm] == np.arange(len(p)))       # true involution
    m = p[perm]
    np.testing.assert_allclose(m[:, 0], 1.0 - p[:, 0], atol=1e-6)
    np.testing.assert_allclose(m[:, 1:], p[:, 1:], atol=1e-6)

    r = np.asarray(resnet34_priors())
    perm_r = mirror_permutation(r)
    assert perm_r is not None
    m = r[perm_r]
    np.testing.assert_allclose(m[:, 0], 1.0 - r[:, 0], atol=1e-6)
    np.testing.assert_allclose(m[:, 1:], r[:, 1:], atol=1e-6)

    # asymmetric grid -> None (the union fallback)
    assert mirror_permutation(
        np.asarray([[0.25, 0.5, 0.2, 0.2]], np.float32)) is None
