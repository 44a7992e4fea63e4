"""Dataset misc tools: autosplit / extract_boxes / flatten_recursive."""

import pytest
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


@pytest.mark.slow
def test_local_sweep(tmp_path):
    """--local N random-search sweep: trials train, evolve.csv accumulates,
    hyp_evolve.yaml keeps the best row (zero-egress replacement for the
    wandb agent; bookkeeping = reference general.py:769-805)."""
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_fake_dataset import generate

    from desenet_tpu.cli.sweep import main

    root = tmp_path / "ds"
    generate(str(root), n_train=4, n_val=2, size=96, seed=2)
    proj = str(tmp_path / "sweep")
    extra = _json.dumps(dict(dtype="float32", nbs=2, warmup_floor=2,
                             noautoanchor=True, max_targets=16, workers=1,
                             noval=True))
    best_fi, best_hyp = main([
        "--local", "2", "--data", str(root / "data.yaml"),
        "--cfg", os.path.join(os.path.dirname(__file__), "configs",
                              "tiny_psp2.yaml"),
        "--epochs", "1", "--batch-size", "2", "--img-size", "64",
        "--project", proj, "--train-kwargs", extra,
    ])
    assert best_hyp is not None and "lr0" in best_hyp
    evolve = os.path.join(proj, "evolve.csv")
    assert os.path.isfile(evolve)
    assert len(open(evolve).read().strip().splitlines()) == 3  # header + 2
    assert os.path.isfile(os.path.join(proj, "hyp_evolve.yaml"))


def test_rename_dataset_prefix(tmp_path):
    """Reference test/批量改数据集名.py behavior: first '_' token of matching
    file/dir basenames replaced, recursively, dirs included."""
    from desenet_tpu.data.misc_tools import rename_dataset_prefix

    root = tmp_path / "ds"
    (root / "sidewalk_images").mkdir(parents=True)
    (root / "sidewalk_images" / "sidewalk_001.jpg").write_bytes(b"x")
    (root / "sidewalk_images" / "step_002.jpg").write_bytes(b"y")
    (root / "other" ).mkdir()
    (root / "other" / "keep.txt").write_text("z")

    pairs = rename_dataset_prefix(root, "blind")
    assert len(pairs) == 3
    assert (root / "blind_images" / "blind_001.jpg").read_bytes() == b"x"
    assert (root / "blind_images" / "blind_002.jpg").read_bytes() == b"y"
    assert (root / "other" / "keep.txt").exists()
