"""Joint validation: detection mAP + segmentation mIoU.

Mirrors scripts/val.py run()/seg_validation() semantics (reference
val.py:42-76, 126-345): rect dataloader (pad 0.5), conf 0.001 / IoU 0.6
multi-label NMS, native-space coordinate rescale, 10-threshold TP matching,
101-pt AP; seg logits -> argmax -> pixAcc/mIoU with class 0 excluded.

TPU design: the model forward + decode + NMS + seg argmax run as ONE jitted
program per batch shape; only the fixed-shape NMS outputs and the (B, H, W)
uint8 class masks come back to the host. The pre/inference/NMS timing split
of the reference is reported as host-staging / device-step / host-metrics.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.data import create_mixed_dataloader
from desenet_tpu.ops import non_max_suppression
from desenet_tpu.utils.metrics import (
    ConfusionMatrix,
    SegMetrics,
    ap_per_class,
    match_predictions,
)


def np_xywh2xyxy(x):
    y = np.empty_like(x)
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def np_scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Letterbox-inverse rescale (general.py:598-609), numpy in place."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    coords[:, [0, 2]] -= pad[0]
    coords[:, [1, 3]] -= pad[1]
    coords[:, :4] /= gain
    coords[:, [0, 2]] = coords[:, [0, 2]].clip(0, img0_shape[1])
    coords[:, [1, 3]] = coords[:, [1, 3]].clip(0, img0_shape[0])
    return coords


class Validator:
    def __init__(
        self,
        model,
        nc: int,
        se_nc: int,
        conf_thres: float = 0.001,
        iou_thres: float = 0.6,
        max_det: int = 300,
        pre_topk: int = None,
        single_cls: bool = False,
        plots: bool = False,
        save_dir: str = "",
        names: Optional[Dict[int, str]] = None,
        augment: bool = False,
        save_txt: bool = False,
        save_conf: bool = False,
        save_json: bool = False,
        save_hybrid: bool = False,
        class_map: Optional[Sequence[int]] = None,  # model idx -> exported
        # COCO category_id (reference val.py:204: coco91 map for real COCO)
    ):
        self.model = model
        self.nc = nc
        self.se_nc = se_nc
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        from desenet_tpu.ops import PRE_TOPK_VAL
        self.pre_topk = PRE_TOPK_VAL if pre_topk is None else pre_topk
        self.single_cls = single_cls
        self.plots = plots
        self.save_dir = save_dir
        self.names = names or {i: str(i) for i in range(nc)}
        self.augment = augment
        self.save_txt = save_txt
        self.save_conf = save_conf
        self.save_json = save_json
        # hybrid label+prediction outputs for auto-labelling: ground-truth
        # boxes are injected pre-NMS as conf-1.0 candidates (reference
        # val.py:226-230 `lb` -> general.py nms labels path). Metrics are
        # NOT meaningful with hybrid on (reference prints the same caveat).
        self.save_hybrid = save_hybrid
        self.class_map = list(class_map) if class_map is not None else None
        self.iouv = np.linspace(0.5, 0.95, 10)
        self._step_cache = {}

    def _eval_step(self, shape):
        if shape in self._step_cache:
            return self._step_cache[shape]
        model = self.model

        augment = self.augment

        @jax.jit
        def step(variables, img_u8, tgts, tmask):
            x = img_u8.astype(model.dtype) / 255.0
            if augment:
                # TTA: det scales+flips ensembled before NMS; seg logits
                # averaged over the same variants (eval/tta.py)
                from desenet_tpu.eval.tta import forward_augment_joint

                dec, seg = forward_augment_joint(model, variables, x)
            else:
                (dec, feats), seg = model.apply(variables, x, train=False)
            if self.save_hybrid:
                # inject GT as conf-1.0 candidates: rows (B, M, 5+nc) with
                # pixel-xywh box, obj=mask, one-hot class prob 1.0 —
                # padded rows carry obj=0 and fall to the conf filter
                h = jnp.float32(x.shape[1])
                w = jnp.float32(x.shape[2])
                box = tgts[..., 1:5] * jnp.asarray([w, h, w, h])
                obj = tmask.astype(dec.dtype)[..., None]
                onehot = jax.nn.one_hot(tgts[..., 0].astype(jnp.int32),
                                        self.nc, dtype=dec.dtype)
                rows = jnp.concatenate(
                    [box.astype(dec.dtype), obj, onehot], axis=-1)
                dec = jnp.concatenate([dec, rows], axis=1)
            nms = non_max_suppression(
                dec,
                conf_thres=self.conf_thres,
                iou_thres=self.iou_thres,
                max_det=self.max_det,
                pre_topk=self.pre_topk,
                multi_label=not self.single_cls and self.nc > 1,
                agnostic=self.single_cls,
            )
            seg_cls = jnp.argmax(seg, axis=-1).astype(jnp.uint8)
            return nms, seg_cls

        self._step_cache[shape] = step
        return step

    def _save_one_txt(self, predn, shape0, path):
        """Per-image normalized-xywh prediction txt (val.py:79-86)."""
        import os

        label_dir = os.path.join(self.save_dir, "labels")
        os.makedirs(label_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(str(path)))[0]
        gn = np.asarray([shape0[1], shape0[0], shape0[1], shape0[0]],
                        np.float64)
        with open(os.path.join(label_dir, stem + ".txt"), "a") as f:
            for *xyxy, conf, cls in predn.tolist():
                xywh = [
                    (xyxy[0] + xyxy[2]) / 2 / gn[0],
                    (xyxy[1] + xyxy[3]) / 2 / gn[1],
                    (xyxy[2] - xyxy[0]) / gn[2],
                    (xyxy[3] - xyxy[1]) / gn[3],
                ]
                row = ([cls, *xywh, conf] if self.save_conf else [cls, *xywh])
                f.write(" ".join(f"{v:g}" for v in row) + "\n")

    def _append_json(self, predn, path):
        """COCO-format prediction records (val.py:89-98)."""
        import os

        stem = os.path.splitext(os.path.basename(str(path)))[0]
        image_id = int(stem) if stem.isnumeric() else stem
        for *xyxy, conf, cls in predn.tolist():
            cid = (self.class_map[int(cls)] if self.class_map is not None
                   else int(cls))
            self.jdict.append({
                "image_id": image_id,
                "category_id": cid,
                "bbox": [round(xyxy[0], 3), round(xyxy[1], 3),
                         round(xyxy[2] - xyxy[0], 3),
                         round(xyxy[3] - xyxy[1], 3)],
                "score": round(conf, 5),
            })

    def run(self, variables, loader) -> Dict[str, float]:
        stats = []
        seen = 0
        self.jdict = []
        seg_m = SegMetrics(self.se_nc)
        cm = ConfusionMatrix(nc=self.nc) if self.plots else None
        dt = [0.0, 0.0, 0.0]

        for batch in loader:
            t0 = time.perf_counter()
            img = jnp.asarray(batch["image"])
            t1 = time.perf_counter()
            step = self._eval_step(tuple(batch["image"].shape))
            nms, seg_cls = jax.block_until_ready(step(
                variables, img, jnp.asarray(batch["det_targets"]),
                jnp.asarray(batch["det_mask"])))
            t2 = time.perf_counter()

            boxes = np.asarray(nms.boxes)
            scores = np.asarray(nms.scores)
            classes = np.asarray(nms.classes)
            nums = np.asarray(nms.num)
            seg_cls = np.asarray(seg_cls)

            seg_m.update(seg_cls, batch["seg_labels"])

            h, w = batch["image"].shape[1:3]
            for si in range(len(nums)):
                seen += 1
                n = int(nums[si])
                tmask = batch["det_mask"][si]
                tg = batch["det_targets"][si][tmask]  # (m, 5) cls,xywhn
                tcls = tg[:, 0].tolist()
                shapes = batch["shapes"][si]
                shape0 = shapes[0] if shapes is not None else (h, w)
                rp = shapes[1] if shapes is not None else None

                if n == 0:
                    if len(tg):
                        stats.append((
                            np.zeros((0, 10), bool), np.zeros(0), np.zeros(0),
                            tcls,
                        ))
                    continue

                pred = np.concatenate(
                    [boxes[si, :n], scores[si, :n, None], classes[si, :n, None]],
                    axis=1,
                ).astype(np.float64)
                if self.single_cls:
                    pred[:, 5] = 0
                predn = pred.copy()
                np_scale_coords((h, w), predn[:, :4], shape0, rp)

                if len(tg):
                    tbox = np_xywh2xyxy(tg[:, 1:5]) * [w, h, w, h]
                    np_scale_coords((h, w), tbox, shape0, rp)
                    labelsn = np.concatenate([tg[:, 0:1], tbox], axis=1)
                    correct = match_predictions(predn, labelsn, self.iouv)
                    if cm is not None:
                        cm.process_batch(predn, labelsn)
                else:
                    correct = np.zeros((n, 10), bool)
                stats.append((correct, pred[:, 4], pred[:, 5], tcls))

                path = batch.get("paths", [None] * len(nums))[si]
                if self.save_txt and path and self.save_dir:
                    self._save_one_txt(predn, shape0, path)
                if self.save_json and path:
                    self._append_json(predn, path)
            dt[0] += t1 - t0
            dt[1] += t2 - t1
            dt[2] += time.perf_counter() - t2

        # aggregate
        out = {
            "mp": 0.0, "mr": 0.0, "map50": 0.0, "map": 0.0,
            "miou": seg_m.miou, "pix_acc": seg_m.pix_acc, "seen": seen,
            "per_class": {},
        }
        if stats:
            flat = [np.concatenate([np.atleast_1d(np.asarray(s[i])) for s in stats], 0)
                    for i in range(4)]
            if len(flat[0]) and flat[0].any():
                p, r, ap, f1, ap_class = ap_per_class(
                    flat[0], flat[1], flat[2], flat[3]
                )
                ap50, apm = ap[:, 0], ap.mean(1)
                out.update(
                    mp=float(p.mean()), mr=float(r.mean()),
                    map50=float(ap50.mean()), map=float(apm.mean()),
                )
                for i, c in enumerate(ap_class):
                    out["per_class"][int(c)] = dict(
                        p=float(p[i]), r=float(r[i]), ap50=float(ap50[i]),
                        ap=float(apm[i]),
                    )
        if cm is not None and self.save_dir:
            cm.plot(save_dir=self.save_dir, names=list(self.names.values()))
        if self.save_json and self.jdict and self.save_dir:
            import json
            import os

            os.makedirs(self.save_dir, exist_ok=True)
            with open(os.path.join(self.save_dir, "predictions.json"),
                      "w") as f:
                json.dump(self.jdict, f)
        out["speed_ms"] = tuple(x / max(seen, 1) * 1e3 for x in dt)
        return out


def seg_validation(model, variables, n_segcls, loader) -> float:
    """Standalone running-mIoU eval (reference val.py:42-76)."""
    m = SegMetrics(n_segcls)

    @jax.jit
    def step(variables, img_u8):
        x = img_u8.astype(model.dtype) / 255.0
        _, seg = model.apply(variables, x, train=False)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    for batch in loader:
        seg_cls = np.asarray(step(variables, jnp.asarray(batch["image"])))
        m.update(seg_cls, batch["seg_labels"])
    return m.miou
