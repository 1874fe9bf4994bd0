"""Minimal HTTP detection server over an exported artifact.

Demonstrates the deployment story end to end: the serving host needs ONLY
this file, the artifact directory from `cli export`, jax, numpy, and PIL —
no framework package, no Flax model definitions, no torch.  The loader
below is intentionally inlined (~25 lines) rather than imported from
`objectdetection_ssd_tpu.infer.export`, whose module pulls in the full
framework; both read the same artifact format (meta.json format_version
major 1).

    python -m objectdetection_ssd_tpu.cli export --checkpoint-dir ckpt \
        --out-dir artifact --serve-batch-size 1
    python examples/serve_http.py artifact --port 8000

    curl -s -X POST --data-binary @dog.jpg localhost:8000/detect | jq .

POST /detect with a JPEG/PNG body returns JSON detections in pixel coords
of the posted image.  `--dynamic-batch` (with an artifact compiled for
batch_size > 1) coalesces concurrent requests into shared device calls
(MicroBatcher below) — the standard production-serving arrangement when
device compute is the contended resource.  It is OFF by default because on
this container's relay transport per-request bs=1 calls from overlapping
handler threads measured strictly faster (70.4 vs 42.6 req/s at 8 clients;
benchmarks/RESULTS.md "HTTP serving"): compute is ~0.4 ms/image while
transfer+round-trip dominates, and batching serializes phases that
pipelined per-request calls overlap.  On a host with local PCIe/ICI
attachment and many cores, the tradeoff reverses — measure before picking.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import os

import numpy as np


class MinimalExportedDetector:
    """Standalone artifact loader: jax + the meta.json contract, nothing else.

    Mirrors `objectdetection_ssd_tpu.infer.export.ExportedDetector` (same
    artifact directory, same outputs as a (boxes, scores, classes, valid)
    tuple) without importing the framework.
    """

    def __init__(self, artifact_dir: str):
        import jax
        with open(os.path.join(artifact_dir, "meta.json")) as f:
            self.meta = json.load(f)
        version = str(self.meta.get("format_version", "1.0"))
        if version.split(".")[0] != "1":
            raise ValueError(f"unsupported artifact format_version {version}")
        with open(os.path.join(artifact_dir, "program.jaxexport"), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        # Format 1.2 artifacts carry the measured-best TPU scoped-VMEM
        # budget for this graph (+1.2% e2e; RESULTS.md "scoped-VMEM
        # compiler option"); pass it through on TPU backends only.
        opts = None
        kib = self.meta.get("scoped_vmem_limit_kib")
        if kib and jax.devices()[0].platform != "cpu":
            opts = {"xla_tpu_scoped_vmem_limit_kib": int(kib)}
        self._call = jax.jit(exported.call, compiler_options=opts)

    def __call__(self, images: np.ndarray):
        """(batch_size, S, S, 3) f32 -> (boxes, scores, classes, valid)."""
        return self._call(images)


class MicroBatcher:
    """Coalesce concurrent requests into one device call (dynamic batching).

    A single dispatcher thread pulls pending preprocessed images off a
    queue.  The first image of a batch waits at most ``max_wait_ms`` for
    companions; the batch is padded (by repeating row 0) to the artifact's
    compiled batch size, runs ONE program execution, and each row fans back
    out to its waiting handler thread.  Under load the wait never triggers —
    the queue is already non-empty when the dispatcher comes back around —
    so throughput approaches batch_size images per device step while an idle
    server still answers a lone request within ~max_wait_ms of arrival.

    Framework-free like the rest of this file: numpy + jax only.
    """

    def __init__(self, detector, max_wait_ms: float = 4.0,
                 max_in_flight: int = 4):
        self._det = detector
        self._bs = int(detector.meta["batch_size"])
        self._wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        # Two-stage pipeline: the dispatch thread launches device calls
        # (async dispatch returns before the program finishes) and the
        # completion thread pulls results and wakes waiters — so batch N+1's
        # host->device transfer and compute overlap batch N's device->host
        # pull.  max_in_flight bounds device-side queueing (latency) and
        # host memory.
        self._pending: queue.Queue = queue.Queue(maxsize=max_in_flight)
        threading.Thread(target=self._loop, daemon=True).start()
        threading.Thread(target=self._completion_loop, daemon=True).start()

    def infer_one(self, arr: np.ndarray):
        """Blocking single-image inference; returns this image's
        (boxes, scores, classes, valid) rows as numpy arrays."""
        done = threading.Event()
        slot = [None, None]                    # [result, exception]
        self._q.put((arr, slot, done))
        done.wait()
        if slot[1] is not None:
            raise slot[1]
        return slot[0]

    def _loop(self):
        while True:
            batch = [self._q.get()]
            deadline = time.perf_counter() + self._wait
            while len(batch) < self._bs:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            rows = [item[0] for item in batch]
            rows += [rows[0]] * (self._bs - len(rows))     # pad tail
            try:
                out = self._det(np.stack(rows))            # async dispatch
            except Exception as e:
                for _, slot, done in batch:
                    slot[1] = e
                    done.set()
                continue
            self._pending.put((out, batch))     # blocks at max_in_flight

    def _completion_loop(self):
        import jax
        while True:
            out, batch = self._pending.get()
            try:
                # One host pull for the whole batch (per-array asarray on
                # the hot path costs a device round-trip each).
                boxes, scores, classes, valid = jax.device_get(out)
                for i, (_, slot, done) in enumerate(batch):
                    slot[0] = (boxes[i], scores[i], classes[i], valid[i])
                    done.set()
            except Exception as e:              # fan the failure out too
                for _, slot, done in batch:
                    slot[1] = e
                    done.set()


def build_handler(detector, classes, batcher: MicroBatcher | None = None):
    from PIL import Image

    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    size = detector.meta["image_size"]
    bs = detector.meta["batch_size"]
    # uint8 artifacts (meta input_dtype, format 1.1) take raw resized
    # pixels and normalize inside the program — 4x less per-request
    # host->device transfer; float32 artifacts expect host normalization.
    uint8_input = detector.meta.get("input_dtype", "float32") == "uint8"

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/detect":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            try:
                im = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception:
                self.send_error(400, "not an image")
                return
            w, h = im.size
            if uint8_input:
                arr = np.asarray(im.resize((size, size)), np.uint8)
            else:
                arr = np.asarray(im.resize((size, size)), np.float32) / 255.0
                arr = (arr - mean) / std
            if batcher is not None:
                det_boxes, det_scores, det_classes, det_valid = \
                    batcher.infer_one(arr)
            else:
                batch = np.broadcast_to(arr, (bs, size, size, 3)).copy()
                # One host pull for all four outputs: per-array np.asarray
                # on the serving hot path costs a device round-trip each.
                import jax
                b, s, c, v = jax.device_get(detector(batch))
                det_boxes, det_scores, det_classes, det_valid = (
                    b[0], s[0], c[0], v[0])
            valid = det_valid
            boxes = det_boxes[valid] * [w, h, w, h]
            out = {
                "detections": [
                    {"box_xyxy": [round(float(v), 1) for v in b],
                     "label": classes[int(c)],
                     "score": round(float(s), 4)}
                    for b, c, s in zip(
                        boxes,
                        det_classes[valid],
                        det_scores[valid])
                ]
            }
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("artifact", help="directory written by `cli export`")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--dynamic-batch", action="store_true",
                   help="coalesce concurrent requests into shared device "
                        "calls (needs a batch_size>1 artifact; see module "
                        "docstring for when this wins)")
    p.add_argument("--max-wait-ms", type=float, default=4.0,
                   help="max time the first request of a batch waits for "
                        "companions (idle-server latency floor)")
    args = p.parse_args(argv)

    det = MinimalExportedDetector(args.artifact)
    batcher = None
    if args.dynamic_batch:
        if det.meta["batch_size"] <= 1:
            raise SystemExit(
                "error: --dynamic-batch needs an artifact compiled with "
                "batch_size > 1 (this one is batch_size="
                f"{det.meta['batch_size']}; re-export with "
                "--serve-batch-size N)")
        batcher = MicroBatcher(det, max_wait_ms=args.max_wait_ms)
    handler = build_handler(det, det.meta["classes"], batcher=batcher)
    # ThreadingHTTPServer: handlers must overlap for requests to coalesce
    # in the batcher (and for keep-alive clients not to starve each other).
    server = ThreadingHTTPServer(("127.0.0.1", args.port), handler)
    mode = ("dynamic batching" if batcher is not None
            else "per-request calls")
    print(f"serving on http://127.0.0.1:{args.port}/detect "
          f"(batch={det.meta['batch_size']}, {mode})")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
