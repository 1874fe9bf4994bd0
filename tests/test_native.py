"""Native C++ kernel parity tests: XML parser vs the Python parser, and the
fused resize+normalize vs PIL + numpy on real synthetic-fixture images."""

import numpy as np
import pytest

from objectdetection_ssd_tpu import native
from objectdetection_ssd_tpu.data import pipeline, synthetic, voc

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/native build unavailable")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_native")
    return synthetic.generate_voc(str(root), num_2007=6, num_2012=3, seed=11)


def test_native_xml_parity(voc_root):
    _, xmls = voc.voc_file_lists(voc_root, train=True)
    for xml in xmls:
        pb, pc, pd = voc.parse_voc_xml(xml)
        nb, nc, nd = native.parse_voc_xml(xml)
        np.testing.assert_allclose(nb, pb)
        np.testing.assert_array_equal(nc, pc)
        np.testing.assert_array_equal(nd, pd)


def test_native_xml_skips_unknown_and_difficult_flag(tmp_path):
    p = tmp_path / "t.xml"
    p.write_text("""<annotation><object><name> CAT </name>
      <difficult>1</difficult>
      <bndbox><xmin>3</xmin><ymin>4</ymin><xmax>10</xmax><ymax>12</ymax></bndbox>
      </object><object><name>gryphon</name><difficult>0</difficult>
      <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
      </object></annotation>""")
    b, c, d = native.parse_voc_xml(str(p))
    assert len(b) == 1 and c[0] == 7 and bool(d[0])
    np.testing.assert_allclose(b[0], [2, 3, 9, 11])


def test_native_resize_normalize_matches_pil(voc_root):
    images, _ = voc.voc_file_lists(voc_root, train=True)
    img = pipeline.load_image(images[0])
    want = pipeline.normalize_image(pipeline.resize_image(img, 300))
    got = native.resize_normalize(img, 300)
    assert got.shape == want.shape == (300, 300, 3)
    # PIL quantizes through uint8 between resize and normalize; allow that
    # plus filter rounding.
    assert np.abs(got - want).mean() < 0.05
    assert np.abs(got - want).max() < 0.35


def test_native_resize_upscale_and_downscale():
    rng = np.random.default_rng(0)
    for (h, w) in [(40, 60), (500, 375)]:
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        out = native.resize_normalize(img, 300)
        assert out.shape == (300, 300, 3)
        assert np.isfinite(out).all()


def test_native_train_augment_invariants(voc_root):
    from objectdetection_ssd_tpu.data import voc as voc_lib
    records = voc_lib.load_records(voc_root, train=True)
    rec = records[0].without_difficult()
    img = pipeline.load_image(rec.image_path)
    for seed in range(20):
        out_img, out_boxes, out_labels = native.train_augment(
            img, rec.boxes_xyxy, rec.classes, seed, 300)
        assert out_img.shape == (300, 300, 3)
        assert np.isfinite(out_img).all()
        # ImageNet-normalized range
        assert out_img.min() >= -3.0 and out_img.max() <= 3.5
        assert len(out_boxes) == len(out_labels) <= len(rec.classes)
        if len(out_boxes):
            assert out_boxes.min() >= 0.0 and out_boxes.max() <= 1.0
            assert (out_boxes[:, 2:] >= out_boxes[:, :2] - 1e-5).all()
            assert set(out_labels.tolist()) <= set(rec.classes.tolist())


def test_native_train_augment_deterministic(voc_root):
    from objectdetection_ssd_tpu.data import voc as voc_lib
    rec = voc_lib.load_records(voc_root, train=True)[1].without_difficult()
    img = pipeline.load_image(rec.image_path)
    a = native.train_augment(img, rec.boxes_xyxy, rec.classes, 7, 300)
    b = native.train_augment(img, rec.boxes_xyxy, rec.classes, 7, 300)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    c = native.train_augment(img, rec.boxes_xyxy, rec.classes, 8, 300)
    assert not np.array_equal(a[0], c[0])


def test_native_train_augment_identity_stats(voc_root):
    # Across many seeds, some draws skip every random op except resize; the
    # output should then match the plain preprocess. Check a weaker but
    # robust property: the mean over seeds of the augmented image mean is
    # within a reasonable band of the un-augmented mean.
    from objectdetection_ssd_tpu.data import voc as voc_lib
    rec = voc_lib.load_records(voc_root, train=True)[2].without_difficult()
    img = pipeline.load_image(rec.image_path)
    plain = pipeline.preprocess_image(img, 300)
    means = [native.train_augment(img, rec.boxes_xyxy, rec.classes, s,
                                  300)[0].mean() for s in range(24)]
    assert abs(np.mean(means) - plain.mean()) < 1.0
