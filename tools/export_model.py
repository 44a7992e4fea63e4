"""Serving export — the JAX-native replacement for the reference's
ONNX/TF/TFLite inference backends (detect.py:97-124).

Serializes the complete inference program (forward + decode + fixed-shape
NMS + seg argmax, weights baked in) as a portable StableHLO artifact via
jax.export. The artifact reloads with `jax.export.deserialize(...).call(x)`
on any machine with JAX — no framework code needed.

    python tools/export_model.py runs/train/exp/best model.stablehlo \
        --batch 1 --img-size 640
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("weights_dir")
    ap.add_argument("out_path")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.25)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="lowering platform (tpu/cpu/cuda); default = current")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from desenet_tpu.models import build_model, config_path
    from desenet_tpu.ops import non_max_suppression
    from desenet_tpu.utils.checkpoint import load_inference_variables

    variables, meta = load_inference_variables(args.weights_dir)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model, spec = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                              se_nc=meta["se_nc"], dtype=dtype)

    # NMS backend pinned to the portable XLA formulation — a Pallas kernel
    # would tie the artifact to one TPU generation
    def infer(img_u8):
        x = img_u8.astype(dtype) / 255.0
        (dec, _), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(
            dec, conf_thres=args.conf_thres, iou_thres=args.iou_thres,
            max_det=args.max_det, pre_topk=1024, backend="xla",
        )
        seg_cls = jnp.argmax(seg, axis=-1).astype(jnp.uint8)
        return nms.boxes, nms.scores, nms.classes, nms.num, seg_cls

    shape = jax.ShapeDtypeStruct(
        (args.batch, args.img_size, args.img_size, 3), jnp.uint8
    )
    kwargs = {}
    if args.platform:
        kwargs["platforms"] = [args.platform]
    exp = jexport.export(jax.jit(infer), **kwargs)(shape)
    blob = exp.serialize()
    with open(args.out_path, "wb") as f:
        f.write(blob)
    with open(args.out_path + ".json", "w") as f:
        json.dump({
            "meta": meta, "batch": args.batch, "img_size": args.img_size,
            "outputs": ["boxes(B,max_det,4) xyxy letterboxed px",
                        "scores", "classes", "num_valid",
                        "seg_mask(B,H,W) uint8"],
            "platforms": list(exp.platforms),
        }, f, indent=1)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out_path} "
          f"(platforms {list(exp.platforms)})")


if __name__ == "__main__":
    main()
