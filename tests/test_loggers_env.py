"""Loggers / wandb stub / environment check coverage."""

import os

import numpy as np

from desenet_tpu.utils.callbacks import Callbacks
from desenet_tpu.utils.general import check_environment
from desenet_tpu.utils.loggers import CSV_KEYS, Loggers
from desenet_tpu.utils.wandb_logger import SWEEP_CONFIG, WandbLogger


def test_loggers_csv_and_hooks(tmp_path):
    lg = Loggers(str(tmp_path), use_tb=False)
    cb = Callbacks()
    cb.auto_register(lg)
    row = {k: 0.5 for k in CSV_KEYS}
    row["epoch"] = 0
    cb.run("on_fit_epoch_end", row)
    cb.run("on_fit_epoch_end", {**row, "epoch": 1})
    cb.run("on_train_end")
    cb.run("teardown")
    lines = (tmp_path / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 3
    assert lines[0].split(",") == CSV_KEYS


def test_wandb_stub_is_safe():
    wl = WandbLogger(project="x")  # no wandb / no auth -> disabled no-op
    assert not wl.enabled or wl.run is not None
    wl.log({"a": 1.0})
    wl.log_image("img", np.zeros((4, 4, 3), np.uint8))
    wl.on_fit_epoch_end({"epoch": 0, "val/fitness": 0.1})
    wl.on_train_end()
    assert SWEEP_CONFIG["metric"]["name"] == "val/fitness"


def test_check_environment():
    info = check_environment()
    assert "python" in info
    assert "jax" in info or "jax_error" in info
