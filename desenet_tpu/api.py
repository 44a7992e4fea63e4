"""High-level inference API — reference AutoShape/Detections equivalent
(core/models/common.py:710-882).

    from desenet_tpu.api import load_predictor
    pred = load_predictor("runs/train/exp/best")
    res = pred(["img1.jpg", np_array, pil_image])   # robust input handling
    res.xyxy[0]          # per-image (n, 6) [x1,y1,x2,y2,conf,cls] native px
    res.masks[0]         # (H0, W0) seg class-id mask at native resolution
    res.save("out/")     # annotated jpgs + seg overlays
    res.to_dicts()       # list of per-image dict records

Batch handling is TPU-aware: inputs are letterboxed to a common static shape
and run as one fused jit (forward + decode + NMS + seg argmax).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.data.augment import letterbox
from desenet_tpu.eval.validator import np_scale_coords
from desenet_tpu.models import build_model, config_path
from desenet_tpu.ops import non_max_suppression
from desenet_tpu.ops.seg_pallas import upsample_argmax
from desenet_tpu.utils.checkpoint import load_inference_variables
from desenet_tpu.utils.plots import Annotator, SegAnnotator, colors


class Detections:
    """Result container (common.py:784-882 semantics, numpy-native)."""

    def __init__(self, imgs_bgr, xyxy, masks, names, se_names, times=None):
        self.imgs = imgs_bgr  # native BGR images
        self.xyxy = xyxy  # list of (n, 6) [x1,y1,x2,y2,conf,cls]
        self.masks = masks  # list of (H0, W0) class-id masks
        self.names = names
        self.se_names = se_names
        self.n = len(imgs_bgr)
        self.times = times or {}

    @property
    def xywh(self) -> List[np.ndarray]:
        out = []
        for d in self.xyxy:
            o = d.copy()
            o[:, 0] = (d[:, 0] + d[:, 2]) / 2
            o[:, 1] = (d[:, 1] + d[:, 3]) / 2
            o[:, 2] = d[:, 2] - d[:, 0]
            o[:, 3] = d[:, 3] - d[:, 1]
            out.append(o)
        return out

    @property
    def xyxyn(self) -> List[np.ndarray]:
        """Boxes normalized by native image size (common.py:800-805)."""
        out = []
        for im, d in zip(self.imgs, self.xyxy):
            h, w = im.shape[:2]
            o = d.copy()
            o[:, [0, 2]] /= w
            o[:, [1, 3]] /= h
            out.append(o)
        return out

    @property
    def xywhn(self) -> List[np.ndarray]:
        out = []
        for im, d in zip(self.imgs, self.xywh):
            h, w = im.shape[:2]
            o = d.copy()
            o[:, [0, 2]] /= w
            o[:, [1, 3]] /= h
            out.append(o)
        return out

    def pandas(self, kind: str = "xyxy"):
        """Per-image DataFrames like the reference's Detections.pandas()
        (common.py:855-865). kind in {xyxy, xyxyn, xywh, xywhn}."""
        import pandas as pd

        cols = {
            "xyxy": ["xmin", "ymin", "xmax", "ymax"],
            "xyxyn": ["xmin", "ymin", "xmax", "ymax"],
            "xywh": ["xcenter", "ycenter", "width", "height"],
            "xywhn": ["xcenter", "ycenter", "width", "height"],
        }[kind]
        frames = []
        for d in getattr(self, kind):
            recs = [[*r[:4], r[4], int(r[5]), self.names[int(r[5])]]
                    for r in d]
            frames.append(pd.DataFrame(
                recs, columns=cols + ["confidence", "class", "name"]))
        return frames

    def tolist(self) -> List["Detections"]:
        """Split into per-image Detections (common.py:867-875)."""
        return [
            Detections([self.imgs[i]], [self.xyxy[i]], [self.masks[i]],
                       self.names, self.se_names, self.times)
            for i in range(self.n)
        ]

    def to_dicts(self) -> List[List[dict]]:
        recs = []
        for d in self.xyxy:
            recs.append([
                dict(
                    xmin=float(r[0]), ymin=float(r[1]), xmax=float(r[2]),
                    ymax=float(r[3]), confidence=float(r[4]),
                    cls=int(r[5]), name=self.names[int(r[5])],
                )
                for r in d
            ])
        return recs

    def render(self) -> List[np.ndarray]:
        """Annotated BGR images (boxes + seg overlay)."""
        seg_ann = SegAnnotator()
        out = []
        for im, d, m in zip(self.imgs, self.xyxy, self.masks):
            ann = Annotator(np.ascontiguousarray(im))
            for *xyxy, conf, c in d:
                ann.box_label(xyxy, f"{self.names[int(c)]} {conf:.2f}",
                              colors(int(c), True))
            out.append(seg_ann.overlay(ann.result(), m))
        return out

    def save(self, save_dir: str = "runs/predict"):
        os.makedirs(save_dir, exist_ok=True)
        for i, im in enumerate(self.render()):
            cv2.imwrite(os.path.join(save_dir, f"image{i}.jpg"), im)
        return save_dir

    def crop(self, save_dir: str = "runs/predict/crops"):
        from desenet_tpu.utils.general import save_one_box

        os.makedirs(save_dir, exist_ok=True)
        k = 0
        for im, d in zip(self.imgs, self.xyxy):
            for *xyxy, conf, c in d:
                save_one_box(
                    xyxy, im,
                    file=os.path.join(save_dir,
                                      f"{self.names[int(c)]}_{k}.jpg"),
                )
                k += 1
        return save_dir

    def __len__(self):
        return self.n

    def __repr__(self):
        counts = [len(d) for d in self.xyxy]
        return f"Detections({self.n} images, dets per image {counts})"


class Predictor:
    def __init__(self, weights: str, imgsz: int = 640,
                 conf_thres: float = 0.25, iou_thres: float = 0.45,
                 max_det: int = 300, half: bool = True,
                 stem_s2d: bool = None, n_devices: int = 1,
                 bake_weights: bool = True,
                 int8: bool = False, calib: Optional[Sequence] = None):
        variables, meta = load_inference_variables(weights)
        assert meta is not None, "checkpoint missing meta.json"
        dtype = jnp.bfloat16 if half else jnp.float32
        self.int8 = int8
        if int8:
            # W8A8 PTQ serving (quant.py; measured det mAP50 == bf16, seg
            # mIoU at parity with the default per-channel scales + bias
            # correction — docs/QUANT.md). Calibrates on the caller's
            # representative images; the quantized graph replaces the
            # phase-stem/fused-tail program (those paths are fp-only), so
            # int8 serving trades the stem specialization for halved
            # activation memory.
            if not calib:  # ValueError survives python -O (assert doesn't)
                raise ValueError(
                    "int8=True needs calib=[...]: a few representative "
                    "images (paths/arrays/PIL)")
            from desenet_tpu import quant as Q

            imgs = [self._to_bgr(im) for im in calib]
            lb = [letterbox(im, imgsz, auto=False, stride=32)[0]
                  for im in imgs]
            cal = jnp.asarray(
                np.stack([np.ascontiguousarray(x[:, :, ::-1]) for x in lb]),
                jnp.float32) / 255.0
            self.model, self.spec, _ = Q.quantize_for_inference(
                config_path(meta["cfg"]), variables, [cal],
                nc=meta["de_nc"], se_nc=meta["se_nc"], dtype=dtype)
            stem_s2d = False
        elif stem_s2d is None:
            # phase-layout stem (models/layers.py PhaseStemA/B): host
            # delivers s2d4 batches, l0/l1 run MXU-deep — TPU win only
            stem_s2d = jax.default_backend() == "tpu"
        # seg_upsample=False: 1/8-res logits + the fused Pallas upsample/
        # argmax tail (ops/seg_pallas.py; XLA composition off-TPU) — same
        # class map, no full-res logits round-trip
        if not int8:
            try:
                self.model, self.spec = build_model(
                    config_path(meta["cfg"]), nc=meta["de_nc"],
                    se_nc=meta["se_nc"], dtype=dtype, seg_upsample=False,
                    stem_s2d=stem_s2d,
                )
                if stem_s2d:  # validate the stem shape eagerly
                    from desenet_tpu.models.build import _check_stem_s2d
                    _check_stem_s2d(self.spec, None)
            except ValueError:
                stem_s2d = False
                self.model, self.spec = build_model(
                    config_path(meta["cfg"]), nc=meta["de_nc"],
                    se_nc=meta["se_nc"], dtype=dtype, seg_upsample=False,
                )
        self.stem_s2d = bool(stem_s2d)
        self.variables = variables
        self.imgsz = imgsz
        self.stride = max(self.spec.det_strides)
        self.names = meta.get("de_names") or [str(i) for i in
                                              range(self.spec.de_nc)]
        self.se_names = meta.get("se_names") or [str(i) for i in
                                                 range(self.spec.se_nc)]
        self.dtype = dtype
        # multi-chip data-parallel inference: batches shard over a 1D data
        # mesh (batch padded to a device multiple in __call__); weights are
        # jit constants, replicated by GSPMD. The whole program (forward +
        # NMS + seg tail) is batch-parallel, so no cross-device collectives
        # exist outside the final digest gathers.
        self.n_devices = max(1, n_devices)
        if self.n_devices > len(jax.devices()):
            # make_mesh would silently truncate while __call__ kept padding
            # batches to the REQUESTED multiple — fail loudly instead
            raise ValueError(
                f"n_devices={n_devices} but only {len(jax.devices())} "
                f"devices are visible")
        if self.n_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            from desenet_tpu.parallel import make_mesh

            self._in_sharding = NamedSharding(make_mesh(self.n_devices),
                                              PartitionSpec("data"))
        else:
            self._in_sharding = None

        # bake_weights=True (default): weights are CLOSED OVER (compile-time
        # constants), not jit arguments — a Predictor's weights never change
        # after load, and freeing XLA from the parameter-layout contract
        # measured 6% faster at b128/640 (39.0 -> 36.8 ms/iter, PERF.md
        # round 3). Caveat: every compiled batch shape embeds its own copy
        # of the weights; a multi-bucket server (serve.py compiles one
        # executable per power-of-two bucket) can pass bake_weights=False
        # to share one device copy across buckets at the ~6% cost.
        def _infer_fn(variables, img_u8):
            x = img_u8.astype(dtype) / 255.0
            (dec, _), seg = self.model.apply(variables, x, train=False)
            nms = non_max_suppression(
                dec, conf_thres=conf_thres, iou_thres=iou_thres,
                max_det=max_det,
            )
            if int8:  # quantized graph emits full-res logits
                seg_cls = jnp.argmax(seg, axis=-1).astype(jnp.uint8)
            else:
                seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
            return nms, seg_cls

        if bake_weights:
            self._infer = jax.jit(lambda img: _infer_fn(variables, img))
        else:
            jitted = jax.jit(_infer_fn)
            self._infer = lambda img: jitted(self.variables, img)

    @staticmethod
    def _to_bgr(im) -> np.ndarray:
        """path / ndarray(BGR HWC) / PIL -> BGR uint8."""
        if isinstance(im, (str, os.PathLike)):
            out = cv2.imread(str(im))
            assert out is not None, f"image not found: {im}"
            return out
        if hasattr(im, "mode"):  # PIL
            return cv2.cvtColor(np.asarray(im.convert("RGB")),
                                cv2.COLOR_RGB2BGR)
        arr = np.asarray(im)
        if arr.dtype != np.uint8:
            arr = (arr * 255).clip(0, 255).astype(np.uint8)
        return arr

    def __call__(self, inputs: Union[str, np.ndarray, Sequence]) -> Detections:
        if not isinstance(inputs, (list, tuple)):
            inputs = [inputs]
        imgs0 = [self._to_bgr(im) for im in inputs]

        lb = [letterbox(im, self.imgsz, auto=False, stride=self.stride)
              for im in imgs0]
        rgb = [np.ascontiguousarray(x[0][:, :, ::-1]) for x in lb]
        # network-input HW BEFORE any layout packing: with stem_s2d the
        # staged batch is (N, H/4, W/4, 48) and its shape must not feed the
        # letterbox-undo math below
        h, w = rgb[0].shape[:2]
        if self.stem_s2d:
            from desenet_tpu.native import assemble_batch_s2d4
            batch = assemble_batch_s2d4(rgb)
        else:
            batch = np.stack(rgb)
        if self._in_sharding is not None:
            # pad to a device multiple (repeat the last image), shard the
            # batch axis; padded rows are sliced off with the python loop
            # below (it iterates the original imgs0 only)
            pad = (-batch.shape[0]) % self.n_devices
            if pad:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, axis=0)])
            dev_batch = jax.device_put(batch, self._in_sharding)
        else:
            dev_batch = jnp.asarray(batch)
        nms, seg_cls = jax.block_until_ready(self._infer(dev_batch))

        boxes = np.asarray(nms.boxes)
        scores = np.asarray(nms.scores)
        classes = np.asarray(nms.classes)
        nums = np.asarray(nms.num)
        seg_np = np.asarray(seg_cls)

        xyxy, masks = [], []
        for i, im0 in enumerate(imgs0):
            n = int(nums[i])
            d = np.concatenate(
                [boxes[i, :n], scores[i, :n, None], classes[i, :n, None]],
                axis=1,
            ).astype(np.float64)
            if n:
                np_scale_coords((h, w), d[:, :4], im0.shape[:2])
            xyxy.append(d)
            # undo letterbox on the mask: crop pad, nearest-resize to native
            gain = min(h / im0.shape[0], w / im0.shape[1])
            pw = int(round((w - im0.shape[1] * gain) / 2))
            ph = int(round((h - im0.shape[0] * gain) / 2))
            m = seg_np[i][ph:h - ph or None, pw:w - pw or None]
            masks.append(cv2.resize(
                m, (im0.shape[1], im0.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            ))
        return Detections(imgs0, xyxy, masks,
                          names=self.names, se_names=self.se_names)


def load_predictor(weights: str, **kw) -> Predictor:
    return Predictor(weights, **kw)
