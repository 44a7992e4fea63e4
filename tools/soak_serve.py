"""On-chip serve soak: sustained concurrent load through the micro-batching
server, reporting client-side latency percentiles + the server's own /info
stats (PERF.md round-4; verdict r3 stretch item).

Starts the real InferenceServer in-process on a trained checkpoint, drives
it with N client threads x M requests of a real JPEG (distinct bytes per
request via a rotating quality re-encode, so device inputs vary), then
prints one JSON line. Run alone on the chip (1-core host: client threads
and the server's decode threads share the core — that contention is part
of what the soak exercises, but a concurrent unrelated process corrupts
it).

    python tools/soak_serve.py <ckpt_dir> [--threads 8] [--requests 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--requests", type=int, default=200,
                    help="total requests across all threads")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--mask", action="store_true",
                    help="request the base64-PNG seg mask too")
    args = ap.parse_args()

    import cv2

    from desenet_tpu.api import load_predictor
    from desenet_tpu.serve import InferenceServer
    from desenet_tpu.utils.general import enable_compile_cache

    enable_compile_cache()

    pred = load_predictor(args.ckpt, imgsz=args.img_size)

    # pre-warm every power-of-two bucket the soak can hit DIRECTLY through
    # the predictor (the server pads to the same bucket sizes): first-touch
    # bucket compiles through the tunnel take minutes and would eat the
    # per-request timeout as 503s otherwise
    warm_img = np.zeros((480, 640, 3), np.uint8)
    b = 1
    while b <= args.max_batch:
        t0 = time.perf_counter()
        pred([warm_img] * b)
        print(f"# warmed bucket {b} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        b *= 2

    srv = InferenceServer(pred, port=0, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms,
                          request_timeout_s=300.0)
    srv.start()
    url = f"http://127.0.0.1:{srv.port}/predict" + (
        "?mask=1" if args.mask else "")

    # distinct request bodies (jpeg quality rotation) — the axon tunnel
    # replays identical (executable, args) pairs
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (480, 640, 3), np.uint8)
    cv2.rectangle(base, (100, 100), (300, 300), (0, 200, 0), -1)
    bodies = [cv2.imencode(".jpg", base, [cv2.IMWRITE_JPEG_QUALITY, q])[1]
              .tobytes() for q in range(60, 92)]

    # warm every bucket the soak will hit (compile outside the timed region)
    for _ in range(2):
        urllib.request.urlopen(urllib.request.Request(
            url, data=bodies[0], method="POST"), timeout=300).read()

    lat = []
    errors = {"503": 0, "other": 0}
    lock = threading.Lock()
    n_per = args.requests // args.threads

    def worker(tid):
        for i in range(n_per):
            body = bodies[(tid * n_per + i) % len(bodies)]
            t0 = time.perf_counter()
            try:
                r = urllib.request.urlopen(urllib.request.Request(
                    url, data=body, method="POST"), timeout=120)
                payload = json.loads(r.read())
                assert "detections" in payload, payload
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
            except urllib.error.HTTPError as e:
                with lock:
                    errors["503" if e.code == 503 else "other"] += 1
            except Exception:
                with lock:
                    errors["other"] += 1

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    info = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}/info", timeout=30).read())
    srv.stop()

    lat_ms = np.asarray(sorted(lat)) * 1e3
    out = {
        "metric": "serve_soak",
        "threads": args.threads,
        "completed": len(lat),
        "errors": errors,
        "wall_s": round(wall, 2),
        "req_s": round(len(lat) / wall, 1),
        "client_ms": {
            "p50": round(float(np.percentile(lat_ms, 50)), 1),
            "p90": round(float(np.percentile(lat_ms, 90)), 1),
            "p99": round(float(np.percentile(lat_ms, 99)), 1),
            "max": round(float(lat_ms.max()), 1),
        },
        "server_info_stats": info.get("stats", info),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
