"""Inference CLI — reference scripts/detect.py equivalent.

    python -m desenet_tpu.cli.detect --weights runs/train/exp/best \
        --source path/to/imgs --img-size 640

Runs the fused device program (forward + decode + NMS + seg argmax) per
letterboxed frame, rescales boxes to native space, writes annotated jpg +
paletted seg overlay (`*_seg.jpg`), optional txt/crops, video writer for
streams. The reference's hard-coded class-name override (detect.py:88-90
quirk) is NOT replicated — names come from the checkpoint meta.
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.data.sources import LoadImages, LoadStreams
from desenet_tpu.eval.validator import np_scale_coords
from desenet_tpu.models import build_model, config_path
from desenet_tpu.ops import non_max_suppression
from desenet_tpu.ops.seg_pallas import upsample_argmax
from desenet_tpu.utils.checkpoint import load_inference_variables
from desenet_tpu.utils.general import (
    check_img_size,
    increment_path,
    set_logging,
)
from desenet_tpu.utils.plots import Annotator, SegAnnotator, colors


def run(
    weights,
    source,
    imgsz=640,
    conf_thres=0.25,
    iou_thres=0.45,
    max_det=1000,
    save_txt=False,
    save_conf=False,
    save_crop=False,
    nosave=False,
    classes=None,
    agnostic_nms=False,
    augment=False,
    line_thickness=3,
    hide_labels=False,
    hide_conf=False,
    half=True,
    project="runs/detect",
    name="exp",
    exist_ok=False,
    visualize=False,
):
    save_img = not nosave
    # webcam index / stream urls / a *.txt list of stream urls all take the
    # threaded LoadStreams path (reference detect.py:128-135)
    webcam = (str(source).isnumeric()
              or str(source).lower().endswith(".txt")
              or str(source).lower().startswith(
                  ("rtsp://", "rtmp://", "http://", "https://")))
    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok)
    (save_dir / "labels" if save_txt else save_dir).mkdir(parents=True,
                                                          exist_ok=True)

    dtype = jnp.bfloat16 if half else jnp.float32
    weights_list = [weights] if isinstance(weights, (str, Path)) else list(weights)
    if len(weights_list) > 1:
        # multi-checkpoint ensemble — joint NMS over concatenated decodes,
        # seg logits averaged (reference detect.py --weights nargs + ->
        # attempt_load Ensemble, experimental.py:78-108)
        from desenet_tpu.eval.ensemble import EnsembleModel, load_ensemble

        members = load_ensemble(weights_list, dtype=dtype,
                                seg_upsample=False)
        meta = members[0][2]
        model = EnsembleModel([m for m, _, _ in members])
        spec = model.spec
        variables = tuple(v for _, v, _ in members)
    else:
        variables, meta = load_inference_variables(weights_list[0])
        assert meta is not None, "checkpoint missing meta.json"
        model, spec = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                                  se_nc=meta["se_nc"], dtype=dtype,
                                  seg_upsample=False)
    stride = max(spec.det_strides)
    imgsz = check_img_size(imgsz, s=stride)
    names = meta.get("de_names") or [str(i) for i in range(spec.de_nc)]

    @jax.jit
    def infer(variables, img_u8):
        x = img_u8.astype(dtype) / 255.0
        (dec, _), seg = model.apply(variables, x, train=False)
        if augment:  # TTA ensembling (detect.py --augment)
            from desenet_tpu.eval.tta import forward_augment

            dec = forward_augment(model, variables, x)
        nms = non_max_suppression(
            dec, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            pre_topk=2048, agnostic=agnostic_nms,
            classes=tuple(classes) if classes is not None else None,
        )
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        return nms, seg_cls

    dataset = (LoadStreams(source, img_size=imgsz, stride=stride) if webcam
               else LoadImages(source, img_size=imgsz, stride=stride))
    seg_ann = SegAnnotator()
    vid_writer, vid_path = None, None
    dt = [0.0, 0.0]
    seen = 0
    for path, img, im0s, vid_cap in dataset:
        if img.ndim == 3:
            img = img[None]
        if visualize and seen == 0 and len(weights_list) == 1:
            # per-layer feature-map grids for the first image (reference
            # detect.py --visualize -> Model.forward(visualize=save_dir))
            from desenet_tpu.utils.plots import visualize_model_features

            outs = visualize_model_features(
                model, variables, jnp.asarray(img).astype(dtype) / 255.0,
                save_dir=str(save_dir / "features"))
            print(f"feature maps: {len(outs)} layers -> "
                  f"{save_dir / 'features'}")
        t0 = time.perf_counter()
        nms, seg_cls = jax.block_until_ready(
            infer(variables, jnp.asarray(img))
        )
        dt[0] += time.perf_counter() - t0

        t0 = time.perf_counter()
        boxes = np.asarray(nms.boxes)
        scores = np.asarray(nms.scores)
        cls_ids = np.asarray(nms.classes)
        nums = np.asarray(nms.num)
        seg_np = np.asarray(seg_cls)

        batch = im0s if isinstance(im0s, list) else [im0s]
        for si, im0 in enumerate(batch):
            seen += 1
            p = Path(path[si] if isinstance(path, list) else path)
            n = int(nums[si])
            det = np.concatenate(
                [boxes[si, :n], scores[si, :n, None], cls_ids[si, :n, None]],
                axis=1,
            )
            # class filtering happens inside NMS (reference general.py:712
            # semantics: before suppression, so excluded classes don't eat
            # the candidate/max_det budget)
            if len(det):
                np_scale_coords(img.shape[1:3], det[:, :4], im0.shape[:2])

            ann = Annotator(np.ascontiguousarray(im0),
                            line_width=line_thickness)
            for *xyxy, conf, c in det:
                c = int(c)
                label = (None if hide_labels else
                         (names[c] if hide_conf else f"{names[c]} {conf:.2f}"))
                ann.box_label(xyxy, label or "", color=colors(c, True))
                if save_txt:
                    gn = np.array([im0.shape[1], im0.shape[0]] * 2)
                    xywh = [
                        (xyxy[0] + xyxy[2]) / 2 / gn[0],
                        (xyxy[1] + xyxy[3]) / 2 / gn[1],
                        (xyxy[2] - xyxy[0]) / gn[2],
                        (xyxy[3] - xyxy[1]) / gn[3],
                    ]
                    line = ([c, *xywh, conf] if save_conf else [c, *xywh])
                    with open(save_dir / "labels" / f"{p.stem}.txt", "a") as f:
                        f.write(" ".join(f"{v:g}" for v in line) + "\n")
                if save_crop:
                    # reference detect.py:231 -> save_one_box (padded,
                    # image-bounds-clipped crop)
                    from desenet_tpu.utils.general import save_one_box

                    crop_dir = save_dir / "crops" / names[c]
                    crop_dir.mkdir(parents=True, exist_ok=True)
                    save_one_box(xyxy, im0,
                                 file=str(crop_dir / f"{p.stem}.jpg"))

            im_out = ann.result()
            # seg: argmax mask at network res -> nearest to native res
            mask = seg_np[si]
            mask_native = cv2.resize(
                mask, (im0.shape[1], im0.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            )
            seg_overlay = seg_ann.overlay(im_out, mask_native)

            if save_img:
                if dataset.mode == "image":
                    cv2.imwrite(str(save_dir / p.name), im_out)
                    cv2.imwrite(
                        str(save_dir / f"{p.stem}_seg.jpg"), seg_overlay
                    )
                else:  # video / stream
                    if vid_path != str(save_dir / p.name):
                        vid_path = str(save_dir / p.name)
                        if vid_writer is not None:
                            vid_writer.release()
                        fps = (vid_cap.get(cv2.CAP_PROP_FPS)
                               if vid_cap else 30.0)
                        wh = (im0.shape[1], im0.shape[0])
                        vid_writer = cv2.VideoWriter(
                            vid_path, cv2.VideoWriter_fourcc(*"mp4v"),
                            fps, wh,
                        )
                    vid_writer.write(seg_overlay)
        dt[1] += time.perf_counter() - t0

    if vid_writer is not None:
        vid_writer.release()
    print(
        f"Speed: {dt[0] / max(seen, 1) * 1e3:.1f}ms device "
        f"(fwd+decode+NMS+seg), {dt[1] / max(seen, 1) * 1e3:.1f}ms "
        f"postprocess per image; results saved to {save_dir}"
    )
    return str(save_dir)


def parse_opt(argv=None):
    p = argparse.ArgumentParser("desenet_tpu detect")
    p.add_argument("--weights", type=str, nargs="+", required=True,
                   help="checkpoint dir(s); >1 runs a joint-NMS ensemble")
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--img-size", "--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=1000)
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-crop", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--classes", nargs="+", type=int)
    p.add_argument("--agnostic-nms", action="store_true")
    p.add_argument("--augment", action="store_true", help="TTA inference")
    p.add_argument("--visualize", action="store_true",
                   help="dump per-layer feature-map grids for the first "
                        "image")
    p.add_argument("--line-thickness", type=int, default=3)
    p.add_argument("--hide-labels", action="store_true")
    p.add_argument("--hide-conf", action="store_true")
    p.add_argument("--no-half", action="store_true")
    p.add_argument("--project", type=str, default="runs/detect")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--matmul-precision", choices=["default", "high", "highest"],
                   default="default",
                   help="force true-f32 MXU matmuls (use with --no-half) to "
                        "reproduce CPU-f32 parity numbers on TPU")
    return p.parse_args(argv)


def main(argv=None):
    set_logging()
    o = parse_opt(argv)
    from desenet_tpu.utils.general import set_matmul_precision

    set_matmul_precision(o.matmul_precision)
    return run(
        o.weights, o.source, o.img_size, o.conf_thres, o.iou_thres,
        o.max_det, o.save_txt, o.save_conf, o.save_crop, o.nosave, o.classes,
        o.agnostic_nms, o.augment, o.line_thickness, o.hide_labels,
        o.hide_conf, not o.no_half, o.project, o.name, o.exist_ok,
        visualize=o.visualize,
    )


if __name__ == "__main__":
    main()
