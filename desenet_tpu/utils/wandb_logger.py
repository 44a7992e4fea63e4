"""Weights & Biases sink (reference loggers/wandb/wandb_utils.py:108-513).

Gated: this environment is zero-egress, so the logger degrades to a no-op
when `wandb` is unavailable or login fails — the hook surface (run init,
per-epoch metrics, val media with boxes + seg masks, model artifacts) is kept
so dropping in a live wandb works unchanged.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

LOGGER = logging.getLogger("desenet_tpu")

try:
    import wandb  # type: ignore

    _WANDB = wandb
except Exception:
    _WANDB = None


class WandbLogger:
    def __init__(self, project: str = "desenet_tpu", name: Optional[str] = None,
                 config: Optional[Dict] = None, resume_id: Optional[str] = None):
        self.run = None
        if _WANDB is None:
            LOGGER.info("wandb unavailable — WandbLogger is a no-op")
            return
        try:
            self.run = _WANDB.init(
                project=project, name=name, config=config or {},
                id=resume_id, resume="allow" if resume_id else None,
            )
        except Exception as e:  # offline/no-auth environments
            LOGGER.warning("wandb init failed (%s) — disabled", e)
            self.run = None

    @property
    def enabled(self) -> bool:
        return self.run is not None

    def log(self, metrics: Dict, step: Optional[int] = None):
        if self.run is not None:
            self.run.log(metrics, step=step)

    def log_image(self, key: str, image, boxes=None, masks=None,
                  class_labels=None):
        """Val media panel: image + box overlays + seg mask
        (wandb_utils.py:447-469)."""
        if self.run is None:
            return
        kwargs = {}
        if boxes is not None:
            kwargs["boxes"] = {
                "predictions": {
                    "box_data": boxes, "class_labels": class_labels or {}
                }
            }
        if masks is not None:
            kwargs["masks"] = {
                "predictions": {
                    "mask_data": masks, "class_labels": class_labels or {}
                }
            }
        self.run.log({key: _WANDB.Image(image, **kwargs)})

    def log_artifact(self, path: str, type_: str = "model",
                     name: str = "run_model", aliases=()):
        if self.run is None:
            return
        art = _WANDB.Artifact(name, type=type_)
        art.add_dir(path)
        self.run.log_artifact(art, aliases=list(aliases))

    # callback-hook methods
    def on_fit_epoch_end(self, row: Dict):
        self.log({k: v for k, v in row.items() if v != ""},
                 step=int(row.get("epoch", 0)))

    def on_train_end(self, *a, **k):
        if self.run is not None:
            self.run.finish()


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
