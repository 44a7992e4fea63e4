"""Dataset misc tools: autosplit / extract_boxes / flatten_recursive."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_fake_dataset import generate  # noqa: E402

from desenet_tpu.data.misc_tools import autosplit, extract_boxes, \
    flatten_recursive


def test_misc_tools(tmp_path):
    generate(str(tmp_path), n_train=10, n_val=2, size=64, seed=2)
    img_dir = os.path.join(str(tmp_path), "Images", "train")

    counts = autosplit(img_dir, weights=(0.8, 0.2, 0.0), seed=0)
    assert sum(counts) == 10
    assert os.path.exists(os.path.join(str(tmp_path), "Images",
                                       "autosplit_train.txt"))

    n = extract_boxes(img_dir)
    assert n > 0
    classifier = os.path.join(img_dir, "classifier")
    assert any(os.scandir(classifier))

    flat = flatten_recursive(img_dir)
    assert len(os.listdir(flat)) >= 10


def test_sweep_print_config(capsys):
    from desenet_tpu.cli.sweep import main

    cfg = main(["--print-config"])
    assert cfg["metric"]["name"] == "val/fitness"
    assert "lr0" in cfg["parameters"]
