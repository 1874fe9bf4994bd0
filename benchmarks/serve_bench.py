"""HTTP serving benchmark: latency/throughput of examples/serve_http.py
under concurrent clients (VERDICT round-2 task 8).

Exports a fresh SSD300 artifact (random weights — latency is
weight-independent), starts the example server in-process on a free port,
and drives it with concurrent HTTP clients posting a real JPEG.  Reports
p50/p90/p99 end-to-end request latency (client-observed: JPEG upload +
decode + preprocess + device inference + JSON response) and sustained
requests/sec.

Usage: python benchmarks/serve_bench.py [--clients 4] [--requests 100]
"""

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=100,
                    help="requests per client")
    ap.add_argument("--batch", type=int, default=1,
                    help="compiled serving batch size")
    ap.add_argument("--dynamic-batch", action="store_true",
                    help="coalesce concurrent requests into shared device "
                         "calls (A/B vs the default per-request mode; "
                         "needs --batch > 1)")
    ap.add_argument("--max-wait-ms", type=float, default=4.0)
    ap.add_argument("--latency-profile", action="store_true",
                    help="export with the `cli export --latency-profile` "
                         "preset (per-class NMS candidates 32 + int8) "
                         "instead of the default artifact — the serving "
                         "A/B for the one-flag deployment preset")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from objectdetection_ssd_tpu.config import Config
    from objectdetection_ssd_tpu.infer.export import export_detector
    from objectdetection_ssd_tpu.models.ssd import build_model

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    import serve_http

    cfg = Config()
    model = build_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 300, 300, 3)))["params"]
    quant = None
    if args.latency_profile:
        # The exact preset cli.build_config applies for --latency-profile
        # (cli.py:126): per-class candidate cap 32 + int8.  Latency is
        # weight-independent, so calibrating the random weights on random
        # images yields a throughput-identical artifact to a trained one.
        from objectdetection_ssd_tpu.infer import quant as quant_lib
        cfg = cfg.replace(
            postprocess=dataclasses.replace(cfg.postprocess,
                                            per_class_top_k=32),
            quant=dataclasses.replace(cfg.quant, int8=True))
        calib = (np.random.default_rng(0)
                 .integers(0, 255, (8, 300, 300, 3)).astype(np.uint8))
        stats = quant_lib.calibrate(build_model(cfg.model), params, [calib])
        quant = quant_lib.act_scales(stats)
        if cfg.quant.chain_requant:
            quant = quant_lib.chain_scales(quant, cfg.model.backbone)
    artifact = os.path.join(tempfile.mkdtemp(prefix="servebench_"), "art")
    export_detector(cfg, params, artifact, batch_size=args.batch,
                    quant=quant)

    det = serve_http.MinimalExportedDetector(artifact)
    batcher = None
    if args.dynamic_batch:
        if args.batch <= 1:
            raise SystemExit("error: --dynamic-batch needs --batch > 1 "
                             "(otherwise the A/B silently measures "
                             "per-request mode)")
        batcher = serve_http.MicroBatcher(det, max_wait_ms=args.max_wait_ms)
    handler = serve_http.build_handler(det, det.meta["classes"],
                                       batcher=batcher)
    # ThreadingHTTPServer so concurrent clients actually overlap in the
    # server (the jit call itself serializes on the device — that's the
    # point of the measurement).
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    buf = io.BytesIO()
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (375, 500, 3), np.uint8)).save(buf, "JPEG", quality=90)
    payload = buf.getvalue()
    url = f"http://127.0.0.1:{port}/detect"

    def post():
        req = urllib.request.Request(url, data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=300) as resp:
            json.loads(resp.read())

    post()  # warmup: compile + first dispatch

    lats = []
    lock = threading.Lock()

    def client():
        for _ in range(args.requests):
            t0 = time.perf_counter()
            post()
            dt = time.perf_counter() - t0
            with lock:
                lats.append(dt)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()

    lats_ms = np.asarray(sorted(lats)) * 1000.0
    print(json.dumps({
        "metric": "serve_http_latency_ms",
        "latency_profile": args.latency_profile,
        "dynamic_batching": batcher is not None,
        "max_wait_ms": args.max_wait_ms if batcher is not None else None,
        "batch": args.batch,
        "clients": args.clients,
        "requests": len(lats),
        "p50": round(float(np.percentile(lats_ms, 50)), 1),
        "p90": round(float(np.percentile(lats_ms, 90)), 1),
        "p99": round(float(np.percentile(lats_ms, 99)), 1),
        "requests_per_sec": round(len(lats) / wall, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
