"""W&B integration at artifact parity, exercised through the vendored
offline backend (utils/wandb_offline.py) — the reference surface being
matched is core/utils/loggers/wandb/wandb_utils.py:259-345 (artifacts),
:447-469 (val media Table with boxes+masks), :279-296 (artifact resume)."""

import json
import os

import numpy as np
import pytest

from desenet_tpu.utils.wandb_logger import WANDB_ARTIFACT_PREFIX, WandbLogger


def make_logger(tmp_path, **kw):
    return WandbLogger(project="t", config={"lr0": 0.01},
                       dir=str(tmp_path / "wandb"), **kw)


def test_metrics_history_and_media_panel(tmp_path):
    wl = make_logger(tmp_path)
    assert wl.enabled
    wl.log({"train/box_loss": 0.5})
    pred = np.array([[10, 10, 50, 50, 0.9, 1], [5, 5, 20, 20, 0.4, 0]])
    seg = np.zeros((32, 32), np.uint8)
    im = np.zeros((32, 32, 3), np.uint8)
    wl.val_one_image(pred, seg, "img0.jpg", {0: "a", 1: "b"}, {0: "bg"}, im)
    wl.end_epoch(best_result=True)
    run_dir = wl.run.dir if wl.run else None
    wl.on_train_end()

    hist = [json.loads(l) for l in
            open(os.path.join(run_dir, "history.jsonl"))]
    row = hist[0]
    assert row["train/box_loss"] == 0.5
    media = row["BoundingBoxDebugger"][0]
    assert media["_type"] == "image"
    box = media["boxes"]["predictions"]["box_data"][0]
    assert box["position"]["maxX"] == 50.0 and box["class_id"] == 1
    assert "b 0.900" in box["box_caption"]
    mask_path = media["masks"]["predictions"]["mask_path"]
    assert np.load(os.path.join(run_dir, mask_path)).shape == (32, 32)
    # evaluation result table committed as an artifact with the best alias
    ev = next(r["evaluation"] for r in hist if "evaluation" in r)
    assert ev["columns"] == ["epoch", "id", "prediction count",
                             "avg_confidence"]
    assert ev["data"][0][1] == "img0.jpg" and ev["data"][0][2] == 2
    mans = []
    base = os.path.join(run_dir, "artifacts")
    for name in os.listdir(base):
        for f in os.listdir(os.path.join(base, name)):
            if f.endswith(".manifest.json"):
                mans.append(json.load(open(os.path.join(base, name, f))))
    prog = [m for m in mans if m["type"] == "evaluation"]
    assert prog and "best" in prog[0]["aliases"]


def test_model_artifact_and_artifact_resume(tmp_path):
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "weights.bin").write_bytes(b"\x00" * 64)
    (ckpt / "meta.json").write_text('{"cfg": "x"}')

    wl = make_logger(tmp_path)
    run_id = wl.run.id
    wl.log_model(str(ckpt), epoch=3, fitness_score=0.42, best_model=True,
                 total_epochs=10)
    wl.on_train_end()

    # a NEW run resumes from the artifact reference
    wl2 = make_logger(tmp_path)
    path = wl2.download_model_artifact(
        WANDB_ARTIFACT_PREFIX + f"run_{run_id}_model:best")
    assert path is not None
    assert open(os.path.join(path, "meta.json")).read() == '{"cfg": "x"}'
    assert os.path.getsize(os.path.join(path, "weights.bin")) == 64
    # alias that was never logged -> not found
    assert wl2.download_model_artifact(
        WANDB_ARTIFACT_PREFIX + f"run_{run_id}_model:nope") is None
    wl2.on_train_end()


def test_dataset_artifact_roundtrip(tmp_path):
    ds = tmp_path / "train_imgs"
    ds.mkdir()
    import cv2
    for i in range(3):
        cv2.imwrite(str(ds / f"im{i}.jpg"),
                    np.full((8, 8, 3), i * 40, np.uint8))

    wl = make_logger(tmp_path)
    data = {"train": str(ds), "val": None}
    linked = wl.log_dataset_artifact(data, {0: "a"}, project="t")
    assert linked["train"].startswith(WANDB_ARTIFACT_PREFIX)

    local = wl.download_dataset_artifact(linked["train"])
    assert local is not None
    assert sorted(os.listdir(local)) == ["im0.jpg", "im1.jpg", "im2.jpg"]
    # the dataset table rode along in the artifact
    art_dir = os.path.dirname(local)
    table = json.load(open(os.path.join(art_dir, "train.table.json")))
    assert table["columns"] == ["id", "image"]
    assert len(table["data"]) == 3
    wl.on_train_end()


def test_log_dataset_cli(tmp_path, monkeypatch):
    # reference core/utils/loggers/wandb/log_dataset.py: standalone
    # dataset-artifact upload writing a *_wandb.yaml config
    import cv2
    import yaml

    from desenet_tpu.cli.log_dataset import main as log_dataset_main

    for split in ("train", "val"):
        d = tmp_path / split
        d.mkdir()
        cv2.imwrite(str(d / "im0.jpg"), np.zeros((8, 8, 3), np.uint8))
    data_yaml = tmp_path / "data.yaml"
    yaml.safe_dump({
        "train": str(tmp_path / "train"), "val": str(tmp_path / "val"),
        "de": {"nc": 2, "names": ["a", "b"]},
        "se": {"nc": 2, "names": ["bg", "fg"]},
    }, open(data_yaml, "w"))

    monkeypatch.setenv("WANDB_DIR", str(tmp_path / "wandb"))
    log_dataset_main(["--data", str(data_yaml), "--project", "t"])

    out = yaml.safe_load(open(tmp_path / "data_wandb.yaml"))
    assert out["train"].startswith(WANDB_ARTIFACT_PREFIX)
    assert out["val"].startswith(WANDB_ARTIFACT_PREFIX)
    assert out["de"]["names"] == ["a", "b"]


def test_disabled_mode_is_noop(tmp_path):
    wl = make_logger(tmp_path, mode="disabled")
    assert not wl.enabled
    wl.log({"a": 1.0})
    wl.val_one_image(np.zeros((0, 6)), np.zeros((4, 4)), "x.jpg", {}, {},
                     np.zeros((4, 4, 3), np.uint8))
    wl.end_epoch()
    wl.on_train_end()
    assert not (tmp_path / "wandb").exists() or not os.listdir(
        tmp_path / "wandb")
