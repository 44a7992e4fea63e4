"""Serving CLI — micro-batching HTTP inference server (desenet_tpu/serve.py).

    python -m desenet_tpu.cli.serve --weights runs/train/exp/best --port 8000

POST image bytes to /predict (add ?mask=1 for the base64-PNG class mask);
GET /healthz and /info for liveness and model metadata. Requests are
dynamically micro-batched into power-of-two buckets so the device program
compiles once per bucket and concurrent clients share one MXU pass. The
reference has no serving entry point (its closest surface is the
scripts/detect.py:36-62 file loop).
"""

from __future__ import annotations

import argparse
import os

from desenet_tpu.api import Predictor
from desenet_tpu.serve import InferenceServer
from desenet_tpu.utils.general import set_logging


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", required=True,
                        help="checkpoint dir (orbax + meta.json)")
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address; the endpoint is unauthenticated, "
                             "so pass 0.0.0.0 explicitly to expose it")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--conf-thres", type=float, default=0.25)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--max-det", type=int, default=300)
    parser.add_argument("--max-batch", type=int, default=16,
                        help="micro-batch cap (largest compiled bucket)")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="how long a request waits for batch-mates")
    parser.add_argument("--max-queue", type=int, default=None,
                        help="queue bound before 503 shedding "
                             "(default 4x max-batch)")
    parser.add_argument("--max-body-mb", type=float, default=32.0,
                        help="largest accepted request body (413 above)")
    parser.add_argument("--no-half", action="store_true",
                        help="run float32 instead of bfloat16")
    parser.add_argument("--n-devices", type=int, default=1,
                        help="shard each micro-batch over this many chips "
                             "(1D data mesh; batch pads to a multiple)")
    parser.add_argument("--no-bake-weights", action="store_true",
                        help="pass weights as a jit argument instead of "
                             "baking them per compiled bucket: one shared "
                             "HBM copy across all batch buckets at a ~6%% "
                             "throughput cost (use for large models with "
                             "many buckets)")
    parser.add_argument("--int8", action="store_true",
                        help="serve the int8 W8A8 quantized model "
                             "(measured det mAP50 == bf16, seg mIoU at "
                             "parity — docs/QUANT.md); needs --calib-dir")
    parser.add_argument("--calib-dir", default=None,
                        help="directory of representative images for int8 "
                             "activation calibration (a handful suffices)")
    args = parser.parse_args(argv)

    set_logging()
    calib = None
    if args.int8:
        import glob

        # user-input validation must survive `python -O` (assert does not)
        if not args.calib_dir:
            parser.error("--int8 needs --calib-dir")
        calib = sorted(
            p for p in glob.glob(os.path.join(args.calib_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))[:16]
        if not calib:
            parser.error(f"no images found in {args.calib_dir}")
    predictor = Predictor(
        args.weights, imgsz=args.img_size, conf_thres=args.conf_thres,
        iou_thres=args.iou_thres, max_det=args.max_det,
        half=not args.no_half, n_devices=args.n_devices,
        bake_weights=not args.no_bake_weights,
        int8=args.int8, calib=calib,
    )
    server = InferenceServer(predictor, host=args.host, port=args.port,
                             max_batch=args.max_batch,
                             max_wait_ms=args.max_wait_ms,
                             max_queue=args.max_queue,
                             max_body_bytes=int(args.max_body_mb * 1024 * 1024))
    print(f"serving {args.weights} on http://{args.host}:{server.port} "
          f"(max_batch={args.max_batch}, max_wait={args.max_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
