"""Standalone segmentation mIoU evaluation CLI — reference
scripts/show_seg_mIoU.py equivalent: run only the seg head over a split and
print running pixAcc / per-class IoU / mIoU.

    python -m desenet_tpu.cli.show_seg_miou --data data.yaml \
        --weights runs/train/exp/best --img-size 640
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.data import create_mixed_dataloader
from desenet_tpu.models import build_model, config_path
from desenet_tpu.utils.checkpoint import load_inference_variables
from desenet_tpu.utils.general import check_dataset, check_img_size, set_logging
from desenet_tpu.utils.metrics import SegMetrics


def run(data, weights, batch_size=16, imgsz=640, task="val", half=True,
        workers=8):
    data = check_dataset(data)
    variables, meta = load_inference_variables(weights)
    assert meta is not None, "checkpoint missing meta.json"
    dtype = jnp.bfloat16 if half else jnp.float32
    model, spec = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                              se_nc=meta["se_nc"], dtype=dtype)
    imgsz = check_img_size(imgsz, s=max(spec.det_strides))
    se_nc = int(data["se"]["nc"])
    se_names = meta.get("se_names") or [str(i) for i in range(se_nc)]

    loader, _ = create_mixed_dataloader(
        data[task], img_size=imgsz, batch_size=batch_size, augment=False,
        rect=True, pad=0.5, stride=max(spec.det_strides), workers=workers,
    )

    cache = {}

    def step_for(shape):
        if shape not in cache:
            @jax.jit
            def step(variables, img_u8):
                x = img_u8.astype(model.dtype) / 255.0
                _, seg = model.apply(variables, x, train=False)
                return jnp.argmax(seg, axis=-1).astype(jnp.uint8)
            cache[shape] = step
        return cache[shape]

    m = SegMetrics(se_nc)
    for batch in loader:
        step = step_for(tuple(batch["image"].shape))
        pred = np.asarray(step(variables, jnp.asarray(batch["image"])))
        m.update(pred, batch["seg_labels"])
        print(f"pixAcc: {m.pix_acc:.3f}, mIoU: {m.miou:.3f}", end="\r")
    print()
    for i, iou in enumerate(m.ious, start=1):
        name = se_names[i] if i < len(se_names) else str(i)
        print(f"  IoU[{name}] = {iou:.4f}")
    print(f"pixAcc = {m.pix_acc:.4f}  mIoU = {m.miou:.4f}")
    return m.miou


def main(argv=None):
    set_logging()
    p = argparse.ArgumentParser("desenet_tpu show_seg_miou")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", "--imgsz", type=int, default=640)
    p.add_argument("--task", type=str, default="val")
    p.add_argument("--no-half", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    o = p.parse_args(argv)
    return run(o.data, o.weights, o.batch_size, o.img_size, o.task,
               not o.no_half, o.workers)


if __name__ == "__main__":
    main()
