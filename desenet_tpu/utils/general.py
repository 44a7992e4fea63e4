"""General utilities: dataset/config checks, run-dir management, seeding,
class weighting — reference core/utils/general.py equivalents for the pieces
that are config/bookkeeping (geometry lives in ops/boxes.py; NMS in
ops/nms.py)."""

from __future__ import annotations

import glob
import logging
import math
import os
import random
import re
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np
import yaml

LOGGER = logging.getLogger("desenet_tpu")


def set_logging(verbose: bool = True):
    logging.basicConfig(
        format="%(message)s",
        level=logging.INFO if verbose else logging.WARNING,
    )


def colorstr(*input):
    """colorstr('blue', 'hello world') — ANSI colored string."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bold": "\033[1m", "underline": "\033[4m", "end": "\033[0m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def init_seeds(seed: int = 0):
    """Seed python/numpy RNGs (general.py:104-112); JAX keys are explicit."""
    random.seed(seed)
    np.random.seed(seed)


def check_dataset(data) -> Dict:
    """Load + validate a dataset yaml with de/se class blocks
    (general.py:318-372). Returns the dict with absolute paths."""
    if isinstance(data, (str, Path)):
        with open(data, encoding="utf-8") as f:
            data = yaml.safe_load(f)
    for k in ("train", "val"):
        assert k in data, f"dataset yaml missing '{k}' key"
    for k in ("de", "se"):
        assert k in data, f"dataset yaml missing '{k}' block"
        assert "nc" in data[k] and "names" in data[k], (
            f"dataset '{k}' block needs nc + names"
        )
        assert len(data[k]["names"]) == int(data[k]["nc"]), (
            f"{k}: len(names) != nc"
        )
    for k in ("train", "val", "test"):
        if data.get(k):
            p = Path(data[k])
            assert p.exists(), f"dataset path does not exist: {p}"
    return data


def check_img_size(imgsz: int, s: int = 32, floor: int = 0) -> int:
    """Round image size to a stride multiple (general.py:256-264)."""
    new = max(make_divisible(int(imgsz), s), floor)
    if new != imgsz:
        LOGGER.warning("img size %d not a multiple of %d, using %d", imgsz, s,
                       new)
    return new


def make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False):
    """runs/exp -> runs/exp2, exp3... (general.py:858-872)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() \
            else (path, "")
        dirs = glob.glob(f"{path}{sep}*")
        matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.stem), d)
                   for d in dirs]
        i = [int(m.groups()[0]) for m in matches if m]
        n = max(i) + 1 if i else 2
        path = Path(f"{path}{sep}{n}{suffix}")
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def labels_to_class_weights(labels: Sequence[np.ndarray], nc: int) -> np.ndarray:
    """Inverse-frequency class weights (general.py:451-467). labels: list of
    (n, 5) [cls, xywh]."""
    if not len(labels):
        return np.ones(nc) / nc
    classes = np.concatenate(
        [l[:, 0] for l in labels if len(l)] or [np.zeros(0)], 0
    ).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    weights /= weights.sum()
    return weights


def labels_to_image_weights(labels, nc: int, class_weights: np.ndarray):
    """Per-image sampling weights from class weights (general.py:470-475)."""
    counts = np.array(
        [np.bincount(l[:, 0].astype(int), minlength=nc) if len(l)
         else np.zeros(nc) for l in labels]
    )
    return (class_weights.reshape(1, nc) * counts).sum(1)


def one_cycle_np(y1=1.0, y2=1.0, steps=100):
    """Host-side one-cycle lambda (general.py:421-423)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def print_mutation(results: dict, hyp: dict, save_dir: str):
    """Hyperparameter-evolution bookkeeping (general.py:769-805): append the
    (metrics, hyp) row to evolve.csv and keep the best row in
    hyp_evolve.yaml. (The reference kept only this helper; the evolve loop
    itself was not ported from YOLOv5.)"""
    import csv

    os.makedirs(save_dir, exist_ok=True)
    csv_path = os.path.join(save_dir, "evolve.csv")
    keys = list(results.keys()) + list(hyp.keys())
    vals = list(results.values()) + list(hyp.values())
    new = not os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(keys)
        w.writerow([f"{float(v):.5g}" for v in vals])

    # keep best generation in yaml
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    fit_key = "fitness" if "fitness" in results else keys[0]
    best = max(rows, key=lambda r: float(r[fit_key]))
    with open(os.path.join(save_dir, "hyp_evolve.yaml"), "w") as f:
        f.write(f"# best of {len(rows)} generations "
                f"({fit_key}={best[fit_key]})\n")
        yaml.safe_dump({k: float(best[k]) for k in hyp}, f)


class EarlyStopping:
    """Fitness-plateau stopper (torch_utils.py:284-301)."""

    def __init__(self, patience: int = 30):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(
                "EarlyStopping: no improvement in last %d epochs "
                "(best epoch %d). Stopping.", self.patience, self.best_epoch,
            )
        return stop
