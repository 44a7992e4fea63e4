"""Fast-tier engine smoke (verdict r3 item 5): one micro train epoch ->
checkpoint -> resume -> predict, small enough for the `-m "not slow"` tier.

The full engine matrix (multi-scale, spatial, CLIs, export) lives in the
slow-tier tests/test_engine.py; this file only guarantees that the smoke
tier exercises the train->ckpt->val->predict cycle at all. Budget: <60 s on
the 1-core container (tiny_psp2, 4 images, 64 px, 1 epoch)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_fake_dataset import generate  # noqa: E402

from desenet_tpu.train.engine import TrainConfig, train

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    root = tmp_path_factory.mktemp("nano")
    generate(str(root), n_train=4, n_val=2, size=64, seed=9)
    out = tmp_path_factory.mktemp("runs")
    cfg = TrainConfig(
        data=os.path.join(root, "data.yaml"),
        cfg=os.path.join(HERE, "configs", "tiny_psp2.yaml"),
        epochs=1, batch_size=4, imgsz=64, workers=2,
        project=str(out), name="nano", exist_ok=True,
        dtype="float32", patience=5, nbs=4, warmup_floor=2,
        noautoanchor=True, use_tb=False, max_targets=16,
    )
    return str(root), cfg, train(cfg)


def test_micro_train_artifacts_and_metrics(run):
    _, _, res = run
    sd = res["save_dir"]
    assert os.path.exists(os.path.join(sd, "results.csv"))
    assert os.path.exists(os.path.join(sd, "last", "meta.json"))
    assert os.path.exists(os.path.join(sd, "best_stripped", "meta.json"))
    with open(os.path.join(sd, "results.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 2  # header + 1 epoch
    vals = [v for v in lines[-1].split(",") if v != ""]
    assert all(np.isfinite(float(v)) for v in vals)
    assert 0.0 <= res["miou"] <= 1.0  # val ran


def test_micro_resume_and_predict(run):
    import dataclasses

    root, cfg, res = run
    sd = res["save_dir"]
    out2 = train(dataclasses.replace(
        cfg, epochs=2, resume=os.path.join(sd, "last"),
        project=os.path.dirname(sd), name="nano", exist_ok=True))
    with open(os.path.join(out2["save_dir"], "results.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[-1].startswith("1,")  # continued at epoch 1

    from desenet_tpu.api import load_predictor

    pred = load_predictor(os.path.join(sd, "last"), imgsz=64, half=False)
    img = os.path.join(root, "Images", "val", "img_0000.jpg")
    r = pred([img])
    assert len(r) == 1
    assert r.masks[0].shape == (64, 64)
