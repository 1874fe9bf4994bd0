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
