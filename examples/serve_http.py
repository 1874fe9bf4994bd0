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
of the posted image.  Single-image batches for simplicity; production
serving would batch requests up to the artifact's compiled batch size.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

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
        self._call = jax.jit(exported.call)

    def __call__(self, images: np.ndarray):
        """(batch_size, S, S, 3) f32 -> (boxes, scores, classes, valid)."""
        return self._call(images)


def build_handler(detector, classes):
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
            batch = np.broadcast_to(arr, (bs, size, size, 3)).copy()
            # One host pull for all four outputs: per-array np.asarray on
            # the serving hot path costs a device round-trip each.
            import jax
            det_boxes, det_scores, det_classes, det_valid = jax.device_get(
                detector(batch))
            valid = det_valid[0]
            boxes = det_boxes[0][valid] * [w, h, w, h]
            out = {
                "detections": [
                    {"box_xyxy": [round(float(v), 1) for v in b],
                     "label": classes[int(c)],
                     "score": round(float(s), 4)}
                    for b, c, s in zip(
                        boxes,
                        det_classes[0][valid],
                        det_scores[0][valid])
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
    args = p.parse_args(argv)

    det = MinimalExportedDetector(args.artifact)
    handler = build_handler(det, det.meta["classes"])
    server = HTTPServer(("127.0.0.1", args.port), handler)
    print(f"serving on http://127.0.0.1:{args.port}/detect "
          f"(batch={det.meta['batch_size']})")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
