"""Packed decoded-image cache tests: build, read-back parity, Loader use."""

import numpy as np
import pytest

from objectdetection_ssd_tpu.config import DataConfig
from objectdetection_ssd_tpu.data import cache, pipeline, synthetic, voc


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_cache")
    synthetic.generate_voc(str(root), num_2007=6, num_2012=2,
                           image_size=(120, 90), seed=5)
    records = voc.load_records(str(root), train=True)
    cache_path = str(tmp_path_factory.mktemp("cache") / "train")
    return records, cache_path


def test_build_and_readback(setup):
    records, cache_path = setup
    cache.build([r.image_path for r in records], cache_path)
    assert cache.num_images(cache_path) == len(records)
    for i in (0, 3, len(records) - 1):
        want = pipeline.load_image(records[i].image_path)
        got = cache.get_image(cache_path, i)
        assert got.shape == want.shape
        # uint8 round-trip of an already-8-bit source: near-exact
        assert np.abs(got - want).max() < 2 / 255.0


def test_build_idempotent(setup):
    records, cache_path = setup
    cache.build([r.image_path for r in records], cache_path)
    cache.build([r.image_path for r in records], cache_path)  # no-op
    assert cache.num_images(cache_path) == len(records)


def test_loader_with_cache_matches_direct(setup):
    records, cache_path = setup
    cfg = DataConfig(batch_size=4, num_workers=0, max_boxes=8)
    direct = pipeline.Loader(records, cfg, image_size=64, train=False)
    cached = pipeline.Loader(records, cfg, image_size=64, train=False,
                             cache_path=cache_path)
    b0 = next(iter(direct.epoch(0)))
    b1 = next(iter(cached.epoch(0)))
    np.testing.assert_array_equal(b0["image_ids"], b1["image_ids"])
    np.testing.assert_array_equal(b0["classes"], b1["classes"])
    # pixel paths may differ by the uint8 round-trip only
    assert np.abs(b0["images"] - b1["images"]).max() < 0.05


def test_build_rebuilds_on_changed_paths(setup):
    """Equal-length but different path lists must NOT reuse the stale cache
    (round-1 advisor finding: idempotence keyed only on count)."""
    records, cache_path = setup
    paths = [r.image_path for r in records]
    cache.build(paths, cache_path)
    first = cache.get_image(cache_path, 0).copy()
    # Same count, rotated order: index 0 now maps to a different image.
    rotated = paths[1:] + paths[:1]
    cache.build(rotated, cache_path, num_workers=2)
    rebuilt = cache.get_image(cache_path, 0)
    want = pipeline.load_image(rotated[0])
    assert rebuilt.shape == want.shape
    assert np.abs(rebuilt - want).max() < 2 / 255.0
    assert (first.shape != rebuilt.shape
            or not np.allclose(first, rebuilt))
    # Restore for other tests in the module.
    cache.build(paths, cache_path)


def test_build_streaming_parallel_matches_serial(tmp_path):
    """Windowed parallel build writes images in order (byte-identical to the
    serial build)."""
    root = tmp_path / "voc"
    synthetic.generate_voc(str(root), num_2007=10, num_2012=0,
                           image_size=(50, 40), seed=9)
    records = voc.load_records(str(root), train=True)
    paths = [r.image_path for r in records]
    p_serial = str(tmp_path / "serial")
    p_par = str(tmp_path / "par")
    cache.build(paths, p_serial, num_workers=0)
    cache.build(paths, p_par, num_workers=3)
    with open(p_serial + ".bin", "rb") as a, open(p_par + ".bin", "rb") as b:
        assert a.read() == b.read()
    for i in range(len(paths)):
        np.testing.assert_array_equal(cache.get_image(p_serial, i),
                                      cache.get_image(p_par, i))
