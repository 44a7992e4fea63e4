"""Weights & Biases sink — full reference surface
(core/utils/loggers/wandb/wandb_utils.py:108-513).

Implements dataset artifacts, model artifacts with aliases, artifact-path
resume (``wandb-artifact://``), the per-image validation media panel
(boxes + segmentation masks), and the evaluation result Table.

Transport: the real ``wandb`` package when importable; otherwise the
vendored offline backend (utils/wandb_offline.py) with the same API — this
image is zero-egress, so the offline backend is what tests exercise. Set
WANDB_MODE=disabled (or mode="disabled") to no-op entirely.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

LOGGER = logging.getLogger("desenet_tpu")

WANDB_ARTIFACT_PREFIX = "wandb-artifact://"

try:
    import wandb as _WANDB  # type: ignore

    if not hasattr(_WANDB, "init"):  # stray ./wandb dir = namespace package
        raise ImportError("wandb namespace package is not the real wandb")
except Exception:
    from desenet_tpu.utils import wandb_offline as _WANDB  # type: ignore


class WandbLogger:
    """Run lifecycle + artifact/Table logic (wandb_utils.py WandbLogger)."""

    def __init__(self, project: str = "desenet_tpu",
                 name: Optional[str] = None,
                 config: Optional[Dict] = None,
                 resume_id: Optional[str] = None,
                 job_type: str = "Training",
                 mode: Optional[str] = None,
                 max_imgs_to_log: int = 16,
                 bbox_interval: int = 1,
                 entity: Optional[str] = None,
                 dir: Optional[str] = None):
        self.run = None
        self.current_epoch = 0
        self.log_dict: Dict = {}
        self.bbox_media_panel_images: List = []
        self.max_imgs_to_log = max_imgs_to_log
        self.bbox_interval = max(bbox_interval, 1)
        self.result_table = None
        self.result_artifact = None
        mode = mode or os.environ.get("WANDB_MODE", "offline")
        if mode == "disabled":
            LOGGER.info("wandb disabled — WandbLogger is a no-op")
            return
        try:
            self.run = _WANDB.init(
                project=project, name=name, config=config or {},
                id=resume_id, resume="allow" if resume_id else None,
                job_type=job_type, dir=dir, entity=entity,
            )
            self._new_result_table()
        except Exception as e:  # no-auth online environments
            LOGGER.warning("wandb init failed (%s) — disabled", e)
            self.run = None

    @property
    def enabled(self) -> bool:
        return self.run is not None

    def _new_result_table(self):
        self.result_table = _WANDB.Table(
            ["epoch", "id", "prediction count", "avg_confidence"])
        self.result_artifact = _WANDB.Artifact(
            f"run_{self.run.id}_progress", type="evaluation")

    # ------------------------------------------------------------------
    # metrics (wandb_utils.py:471-503): accumulate, commit per epoch
    def log(self, metrics: Dict, step: Optional[int] = None):
        if self.run is None:
            return
        if step is not None:
            self.run.log(metrics, step=step)
        else:
            self.log_dict.update(metrics)

    def end_epoch(self, best_result: bool = False):
        if self.run is None:
            return
        if self.bbox_media_panel_images:
            self.log_dict["BoundingBoxDebugger"] = self.bbox_media_panel_images
        if self.log_dict:
            self.run.log(self.log_dict)
        self.log_dict = {}
        self.bbox_media_panel_images = []
        if self.result_table is not None and self.result_table.data:
            self.result_artifact.add(self.result_table, "result")
            self.run.log_artifact(
                self.result_artifact,
                aliases=["latest", "last", f"epoch {self.current_epoch}",
                         "best" if best_result else ""])
            self.run.log({"evaluation": self.result_table})
            self._new_result_table()
        self.current_epoch += 1

    # ------------------------------------------------------------------
    # validation media panel (wandb_utils.py:447-469)
    def val_one_image(self, pred, seg_pred, path, de_names, se_names, im):
        """pred: (n, 6) [xyxy, conf, cls]; seg_pred: (H, W) class ids;
        im: HWC uint8 image."""
        if self.run is None:
            return
        if self.result_table is not None:
            pred = np.asarray(pred, np.float64).reshape(-1, 6)
            avg = float(pred[:, 4].mean()) if len(pred) else 0.0
            self.result_table.add_data(
                self.current_epoch, os.path.basename(str(path)), len(pred),
                round(avg, 5))
        if (len(self.bbox_media_panel_images) < self.max_imgs_to_log
                and self.current_epoch % self.bbox_interval == 0):
            box_data = [{
                "position": {"minX": float(x1), "minY": float(y1),
                             "maxX": float(x2), "maxY": float(y2)},
                "class_id": int(cls),
                "box_caption": "%s %.3f" % (de_names.get(int(cls), int(cls)),
                                            conf),
                "scores": {"class_score": float(conf)},
                "domain": "pixel",
            } for x1, y1, x2, y2, conf, cls in
                np.asarray(pred, np.float64).reshape(-1, 6).tolist()]
            boxes = {"predictions": {"box_data": box_data,
                                     "class_labels": de_names}}
            masks = {"predictions": {
                "mask_data": np.asarray(seg_pred, np.uint8),
                "class_labels": se_names}}
            self.bbox_media_panel_images.append(
                _WANDB.Image(im, boxes=boxes, masks=masks,
                             caption=os.path.basename(str(path))))

    # ------------------------------------------------------------------
    # model artifacts (wandb_utils.py:297-319)
    def log_model(self, ckpt_dir: str, epoch: int, fitness_score: float,
                  best_model: bool = False, total_epochs: int = 0):
        if self.run is None:
            return
        art = _WANDB.Artifact(
            f"run_{self.run.id}_model", type="model", metadata={
                "original_url": str(ckpt_dir),
                "epochs_trained": epoch + 1,
                "total_epochs": total_epochs,
                "fitness_score": float(fitness_score),
            })
        art.add_dir(str(ckpt_dir))
        self.run.log_artifact(
            art, aliases=["latest", "last", f"epoch {epoch}",
                          "best" if best_model else ""])
        LOGGER.info("saved model artifact at epoch %d", epoch)

    def download_model_artifact(self, artifact_path: str) -> Optional[str]:
        """Resolve a wandb-artifact:// checkpoint reference to a local dir
        (wandb_utils.py:279-296). Returns None when not found."""
        if self.run is None or not str(artifact_path).startswith(
                WANDB_ARTIFACT_PREFIX):
            return None
        name = str(artifact_path)[len(WANDB_ARTIFACT_PREFIX):]
        art = self.run.use_artifact(name if ":" in name else name + ":latest")
        if art is None:
            return None
        return art.download()

    # ------------------------------------------------------------------
    # dataset artifacts (wandb_utils.py:321-415)
    def log_dataset_artifact(self, data_dict: Dict, names: Dict[int, str],
                             project: str = "desenet_tpu"):
        """Upload train/val dirs as artifacts and return a data dict whose
        splits point at wandb-artifact:// references."""
        if self.run is None:
            return data_dict
        out = dict(data_dict)
        for split in ("train", "val"):
            path = data_dict.get(split)
            if not path:
                continue
            art = _WANDB.Artifact(f"{split}_dataset", type="dataset",
                                  metadata={"names": names})
            art.add_dir(str(path), name="data")
            table = _WANDB.Table(["id", "image"])
            imgs = sorted(
                f for f in os.listdir(path)
                if f.lower().endswith((".jpg", ".png", ".jpeg", ".bmp"))
            )[:self.max_imgs_to_log]
            for f in imgs:
                table.add_data(f, _WANDB.Image(os.path.join(str(path), f)))
            art.add(table, split)
            self.run.log_artifact(art, aliases=["latest"])
            out[split] = WANDB_ARTIFACT_PREFIX + f"{split}_dataset:latest"
        return out

    def download_dataset_artifact(self, path: str,
                                  alias: str = "latest") -> Optional[str]:
        """Resolve a wandb-artifact:// dataset split to a local dir; `alias`
        selects the artifact version (reference --artifact_alias,
        wandb_utils.py:90-97)."""
        if self.run is None or not str(path).startswith(
                WANDB_ARTIFACT_PREFIX):
            return None
        name = str(path)[len(WANDB_ARTIFACT_PREFIX):]
        art = self.run.use_artifact(
            name if ":" in name else f"{name}:{alias}")
        if art is None:
            return None
        return os.path.join(art.download(), "data")

    # ------------------------------------------------------------------
    # legacy simple helpers (kept for sweep CLI + tests)
    def log_image(self, key: str, image, boxes=None, masks=None,
                  class_labels=None):
        if self.run is None:
            return
        kwargs = {}
        if boxes is not None:
            kwargs["boxes"] = {"predictions": {
                "box_data": boxes, "class_labels": class_labels or {}}}
        if masks is not None:
            kwargs["masks"] = {"predictions": {
                "mask_data": masks, "class_labels": class_labels or {}}}
        self.run.log({key: _WANDB.Image(image, **kwargs)})

    def log_artifact(self, path: str, type_: str = "model",
                     name: str = "run_model", aliases=()):
        if self.run is None:
            return
        art = _WANDB.Artifact(name, type=type_)
        art.add_dir(path)
        self.run.log_artifact(art, aliases=list(aliases))

    # callback-hook methods (picked up by Callbacks.auto_register)
    def on_fit_epoch_end(self, row: Dict):
        self.log({k: v for k, v in row.items() if v != ""})
        self.end_epoch()

    def on_train_end(self, *a, **k):
        if self.run is not None:
            self.run.finish()
            self.run = None


SWEEP_CONFIG = {
    # random-search sweep over the hyp space (reference sweep.yaml:17-143)
    "method": "random",
    "metric": {"name": "val/fitness", "goal": "maximize"},
    "parameters": {
        "lr0": {"distribution": "uniform", "min": 1e-5, "max": 0.1},
        "lrf": {"distribution": "uniform", "min": 0.01, "max": 1.0},
        "momentum": {"distribution": "uniform", "min": 0.6, "max": 0.98},
        "weight_decay": {"distribution": "uniform", "min": 0.0, "max": 0.001},
        "warmup_epochs": {"distribution": "uniform", "min": 0.0, "max": 5.0},
        "box": {"distribution": "uniform", "min": 0.02, "max": 0.2},
        "cls": {"distribution": "uniform", "min": 0.2, "max": 4.0},
        "obj": {"distribution": "uniform", "min": 0.2, "max": 4.0},
        "anchor_t": {"distribution": "uniform", "min": 2.0, "max": 8.0},
        "fl_gamma": {"distribution": "uniform", "min": 0.0, "max": 2.0},
        "hsv_h": {"distribution": "uniform", "min": 0.0, "max": 0.1},
        "hsv_s": {"distribution": "uniform", "min": 0.0, "max": 0.9},
        "hsv_v": {"distribution": "uniform", "min": 0.0, "max": 0.9},
        "translate": {"distribution": "uniform", "min": 0.0, "max": 0.9},
        "scale": {"distribution": "uniform", "min": 0.0, "max": 0.9},
        "mosaic": {"distribution": "uniform", "min": 0.0, "max": 1.0},
        "mixup": {"distribution": "uniform", "min": 0.0, "max": 1.0},
    },
}
