"""Consume a desenet_tpu StableHLO export from BARE JAX — no framework code.

This proves the export story outside the framework (the reference ships
ONNX/TF backends consumable by third parties, detect.py:97-124; our
equivalent is a `jax.export` artifact consumable by any JAX install):

    python tools/export_model.py runs/train/exp/best model.stablehlo \
        --batch 1 --img-size 640
    python examples/consume_exported_model.py model.stablehlo my_image.jpg

The ONLY imports are jax / numpy / stdlib — `desenet_tpu` is deliberately
not imported (tests/test_engine.py enforces that with an AST check). The
sidecar `<artifact>.json` documents the I/O contract: input is uint8 NHWC
letterboxed RGB at `img_size`; outputs are (boxes xyxy letterboxed px,
scores, classes, num_valid, seg_mask uint8).
"""

import json
import sys

import numpy as np
from jax import export as jexport


def load(artifact_path):
    """Deserialize the artifact + its I/O-contract sidecar."""
    with open(artifact_path, "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(artifact_path + ".json") as f:
        contract = json.load(f)
    return exp, contract


def letterbox_u8(img, size):
    """Minimal letterbox (aspect-preserving pad to size x size, gray 114)
    using numpy only — mirrors the framework's preprocessing contract."""
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    # nearest-neighbor resize via index maps (no cv2 dependency here)
    ys = (np.arange(nh) / r).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(nw) / r).astype(np.int64).clip(0, w - 1)
    resized = img[ys][:, xs]
    out = np.full((size, size, 3), 114, np.uint8)
    top, left = (size - nh) // 2, (size - nw) // 2
    out[top:top + nh, left:left + nw] = resized
    return out, r, (left, top)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(__doc__)
        return 2
    artifact, image_path = argv
    exp, contract = load(artifact)
    size = contract["img_size"]

    # decode with PIL if available, else treat the file as a raw .npy image
    if image_path.endswith(".npy"):
        img = np.load(image_path)
    else:
        from PIL import Image

        img = np.asarray(Image.open(image_path).convert("RGB"))
    x, r, (dx, dy) = letterbox_u8(img, size)
    batch = np.broadcast_to(x, (contract["batch"], size, size, 3))

    boxes, scores, classes, num, seg = exp.call(batch)
    n = int(num[0])
    names = contract["meta"].get("names") or {}
    print(f"{n} detections (artifact platforms: {contract['platforms']})")
    for i in range(n):
        x1, y1, x2, y2 = ((np.asarray(boxes[0, i])
                           - np.array([dx, dy, dx, dy])) / r).tolist()
        c = int(classes[0, i])
        label = names.get(str(c), names.get(c, c)) if names else c
        print(f"  {label}: {float(scores[0, i]):.3f} "
              f"[{x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f}]")
    seg_ids, counts = np.unique(np.asarray(seg[0]), return_counts=True)
    print("seg class histogram:",
          {int(k): int(v) for k, v in zip(seg_ids, counts)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
