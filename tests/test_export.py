"""AOT export/load roundtrip for the serving artifact (infer/export.py).

The exported StableHLO program must reproduce the live jitted detector
bit-for-bit (same weights, same postprocess), run without any model code,
and reject wrong batch shapes loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from objectdetection_ssd_tpu.config import Config, ModelConfig, PostprocessConfig
from objectdetection_ssd_tpu.infer.detector import Detector
from objectdetection_ssd_tpu.infer.export import ExportedDetector, export_detector
from objectdetection_ssd_tpu.models.ssd import build_model


@pytest.fixture(scope="module")
def small_cfg():
    return Config(
        model=ModelConfig(backbone="vgg16"),
        postprocess=PostprocessConfig(per_class_top_k=16, top_k=20,
                                      use_approx_top_k=False,
                                      anchor_prefilter=0),
    )


@pytest.fixture(scope="module")
def params(small_cfg):
    model = build_model(small_cfg.model)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 300, 300, 3)))["params"]


def test_export_roundtrip_matches_live_detector(tmp_path, small_cfg, params):
    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=2, input_dtype="float32")
    served = ExportedDetector(out)
    live = Detector(small_cfg, params)

    images = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (2, 300, 300, 3)).astype(np.float32))
    d_live = live.detect_batch(images)
    d_srv = served(np.asarray(images))

    np.testing.assert_array_equal(np.asarray(d_live.valid),
                                  np.asarray(d_srv.valid))
    np.testing.assert_allclose(np.asarray(d_live.scores),
                               np.asarray(d_srv.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_live.boxes_xyxy),
                               np.asarray(d_srv.boxes_xyxy), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_live.classes),
                                  np.asarray(d_srv.classes))

    assert served.meta["batch_size"] == 2
    assert served.meta["image_size"] == 300
    assert len(served.meta["classes"]) == 20


def test_http_serving_example(tmp_path, small_cfg, params):
    """The examples/serve_http.py server answers /detect over a real socket
    using only the exported artifact."""
    import io
    import json
    import sys
    import threading
    import urllib.request
    from http.server import HTTPServer
    from PIL import Image

    sys.path.insert(0, "examples")
    try:
        import serve_http
    finally:
        sys.path.remove("examples")

    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=1)
    # The example's inlined loader (framework-free on a real serving host;
    # jax + the artifact only) — exercised end-to-end through the handler.
    det = serve_http.MinimalExportedDetector(out)
    handler = serve_http.build_handler(det, det.meta["classes"])
    server = HTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(0).integers(
                0, 255, (120, 160, 3), np.uint8)).save(buf, "JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert "detections" in payload
        for d in payload["detections"]:
            assert set(d) == {"box_xyxy", "label", "score"}
            assert len(d["box_xyxy"]) == 4
    finally:
        server.shutdown()


def test_export_pads_short_and_chunks_long_batches(tmp_path, small_cfg,
                                                   params):
    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=2, input_dtype="float32")
    served = ExportedDetector(out)
    with pytest.raises(ValueError, match="empty"):
        served(np.zeros((0, 300, 300, 3), np.float32))
    # a batch of 1 pads internally and returns exactly 1 row, identical to
    # the same image run inside a full batch
    img = np.random.default_rng(1).normal(
        0, 0.5, (1, 300, 300, 3)).astype(np.float32)
    d1 = served(img)
    d2 = served(np.concatenate([img, img]))
    assert d1.boxes_xyxy.shape[0] == 1
    np.testing.assert_allclose(np.asarray(d1.scores[0]),
                               np.asarray(d2.scores[0]), rtol=1e-6)
    # a batch of 5 over a compiled size of 2 chunks transparently: 5 rows
    # out, each row identical to the same image served alone
    imgs = np.random.default_rng(2).normal(
        0, 0.5, (5, 300, 300, 3)).astype(np.float32)
    d5 = served(imgs)
    assert d5.boxes_xyxy.shape[0] == 5
    for i in range(5):
        di = served(imgs[i:i + 1])
        np.testing.assert_allclose(np.asarray(d5.scores[i]),
                                   np.asarray(di.scores[0]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(d5.valid[i]),
                                      np.asarray(di.valid[0]))


def test_export_format_version_gate(tmp_path, small_cfg, params):
    """A future-major artifact must be refused by both loaders; the current
    artifact advertises format_version 1.x."""
    import json
    import os
    from objectdetection_ssd_tpu.infer.export import check_format_version

    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=1)
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert str(meta["format_version"]).startswith("1.")
    check_format_version(meta)                       # current: accepted
    check_format_version({})                         # pre-versioning: major 1
    with pytest.raises(ValueError, match="format_version"):
        check_format_version({"format_version": "2.0"})
    # the on-disk gate: rewrite meta.json with a future major and reload
    meta["format_version"] = "2.0"
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="format_version"):
        ExportedDetector(out)


def test_export_uint8_artifact_matches_live(tmp_path, small_cfg, params):
    """Default (uint8) artifacts take raw 0-255 pixels, normalize inside
    the program, and match the live detector fed the same uint8 batch."""
    out = export_detector(small_cfg, params, str(tmp_path / "artifact_u8"),
                          batch_size=2)   # default: cfg transfer_dtype=uint8
    served = ExportedDetector(out)
    assert served.meta["input_dtype"] == "uint8"
    live = Detector(small_cfg, params)
    u8 = np.random.default_rng(3).integers(0, 256, (2, 300, 300, 3),
                                           np.uint8)
    d_live = live.detect_batch(jnp.asarray(u8))
    d_srv = served(u8)
    np.testing.assert_array_equal(np.asarray(d_live.valid),
                                  np.asarray(d_srv.valid))
    np.testing.assert_allclose(np.asarray(d_live.scores),
                               np.asarray(d_srv.scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_live.boxes_xyxy),
                               np.asarray(d_srv.boxes_xyxy), rtol=1e-5,
                               atol=1e-6)


def test_artifact_carries_scoped_vmem_hint(tmp_path, small_cfg, params):
    """Format-1.2 artifacts record the measured-best inference scoped-VMEM
    budget in meta.json; loaders gate it to a no-op on CPU (this suite) —
    leaking the TPU-only compiler option into a CPU compile would fail the
    load/compile below.  RESULTS.md "scoped-VMEM compiler option"."""
    import json
    import os

    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=1)
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["format_version"] == "1.3"
    assert (meta["scoped_vmem_limit_kib"]
            == small_cfg.postprocess.scoped_vmem_limit_kib)

    det = ExportedDetector(out)          # CPU gate: compiles + runs
    if meta.get("input_dtype", "float32") == "uint8":
        img = np.zeros((1, 300, 300, 3), np.uint8)
    else:
        img = np.zeros((1, 300, 300, 3), np.float32)
    dets = det(img)
    assert np.asarray(dets.valid).shape[0] == 1

    # 0 in the hint (or an absent key, format <= 1.1) means no option.
    from objectdetection_ssd_tpu.xla_options import scoped_vmem_options
    assert scoped_vmem_options(0) is None
    assert scoped_vmem_options(None) is None
    assert scoped_vmem_options(24576) is None    # CPU backend here


def test_micro_batcher_coalesces_and_matches(tmp_path, small_cfg, params):
    """Dynamic batching (examples/serve_http.py MicroBatcher): concurrent
    requests coalesce into shared device calls and each caller gets exactly
    the rows a direct per-image call would produce — including when the
    batch is padded (fewer waiters than the compiled size) and when callers
    outnumber one batch."""
    import sys
    import threading

    sys.path.insert(0, "examples")
    try:
        import serve_http
    finally:
        sys.path.remove("examples")

    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=4)
    det = serve_http.MinimalExportedDetector(out)
    batcher = serve_http.MicroBatcher(det, max_wait_ms=50.0)

    rng = np.random.default_rng(1)
    n = 6                                   # 4-batch + padded 2-batch
    if det.meta.get("input_dtype", "float32") == "uint8":
        imgs = rng.integers(0, 255, (n, 300, 300, 3)).astype(np.uint8)
    else:
        imgs = rng.normal(0, 0.5, (n, 300, 300, 3)).astype(np.float32)

    # Oracle: one direct call per image, padded the way the plain handler
    # pads (broadcast to the compiled batch).
    want = []
    for i in range(n):
        b, s, c, v = jax.device_get(
            det(np.broadcast_to(imgs[i], (4, 300, 300, 3)).copy()))
        want.append((b[0], s[0], c[0], v[0]))

    results = [None] * n

    def call(i):
        results[i] = batcher.infer_one(imgs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i in range(n):
        got_b, got_s, got_c, got_v = results[i]
        want_b, want_s, want_c, want_v = want[i]
        np.testing.assert_array_equal(got_v, want_v)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
        np.testing.assert_allclose(got_b, want_b, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got_c, want_c)


def test_micro_batcher_fans_out_failures():
    """A failing device call must raise in EVERY waiting caller (not hang
    them): both the dispatch-side path (det raising synchronously) and the
    completion-side path surface the exception through infer_one."""
    import sys
    import threading

    sys.path.insert(0, "examples")
    try:
        import serve_http
    finally:
        sys.path.remove("examples")

    class _BoomDetector:
        meta = {"batch_size": 4}

        def __call__(self, images):
            raise RuntimeError("boom")

    batcher = serve_http.MicroBatcher(_BoomDetector(), max_wait_ms=50.0)
    errs = [None, None]

    def call(i):
        try:
            batcher.infer_one(np.zeros((8, 8, 3), np.float32))
        except RuntimeError as e:
            errs[i] = str(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "caller hung on a failed batch"
    assert errs == ["boom", "boom"]


def test_http_serving_dynamic_batching(tmp_path, small_cfg, params):
    """The HTTP example with a batch>1 artifact + MicroBatcher answers
    concurrent clients correctly through a real socket."""
    import io
    import json
    import sys
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from PIL import Image

    sys.path.insert(0, "examples")
    try:
        import serve_http
    finally:
        sys.path.remove("examples")

    out = export_detector(small_cfg, params, str(tmp_path / "artifact"),
                          batch_size=4)
    det = serve_http.MinimalExportedDetector(out)
    batcher = serve_http.MicroBatcher(det, max_wait_ms=20.0)
    handler = serve_http.build_handler(det, det.meta["classes"],
                                       batcher=batcher)
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        payloads = []
        for seed in range(4):
            buf = io.BytesIO()
            Image.fromarray(np.random.default_rng(seed).integers(
                0, 255, (120, 160, 3), np.uint8)).save(buf, "JPEG")
            payloads.append(buf.getvalue())

        outs = [None] * 4

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=payloads[i],
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as resp:
                outs[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, payload in outs:
            assert status == 200
            assert "detections" in payload
            for d in payload["detections"]:
                assert set(d) == {"box_xyxy", "label", "score"}
    finally:
        server.shutdown()


def test_export_tta_artifact_matches_live(tmp_path, small_cfg, params):
    """--tta-flip must be honored by the AOT artifact: the mirrored second
    forward is baked into the StableHLO (via the shared
    forward_for_postprocess), so served TTA detections == live TTA
    detections, and meta.json records the mode."""
    import dataclasses
    cfg = small_cfg.replace(postprocess=dataclasses.replace(
        small_cfg.postprocess, tta_flip=True))
    out = export_detector(cfg, params, str(tmp_path / "artifact"),
                          batch_size=1, input_dtype="float32")
    served = ExportedDetector(out)
    assert served.meta["tta_flip"] is True
    live = Detector(cfg, params)

    images = np.random.default_rng(5).normal(
        0, 0.5, (1, 300, 300, 3)).astype(np.float32)
    d_live = live.detect_batch(jnp.asarray(images))
    d_srv = served(images)
    np.testing.assert_array_equal(np.asarray(d_live.valid),
                                  np.asarray(d_srv.valid))
    np.testing.assert_allclose(np.asarray(d_live.scores),
                               np.asarray(d_srv.scores), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(d_live.boxes_xyxy),
                               np.asarray(d_srv.boxes_xyxy), rtol=1e-4,
                               atol=1e-6)
