"""LoadStreams (threaded multi-stream reader, mixed_datasets.py:237-322
analog) driven with a local video file as the stream source — the same
cv2.VideoCapture path RTSP/HTTP urls take, testable without a network.
(The reference's LoadStreams crashes on missing Thread/time imports —
SURVEY appendix; not replicated here.)"""

import os

import cv2
import numpy as np
import pytest

from desenet_tpu.data.sources import LoadStreams


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    path = str(d / "stream.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (96, 64))
    if not w.isOpened():
        pytest.skip("cv2 build lacks mp4v encoder")
    rng = np.random.default_rng(0)
    for _ in range(90):  # 3 seconds at 30 FPS
        w.write(rng.integers(0, 255, (64, 96, 3), np.uint8))
    w.release()
    return path


def test_stream_iteration(clip):
    s = LoadStreams(clip, img_size=64, stride=32)
    assert len(s) == 1
    it = iter(s)
    for _ in range(3):
        sources, imgs, im0, _ = next(it)
        assert imgs.shape[0] == 1 and imgs.shape[-1] == 3
        assert imgs.shape[1] % 32 == 0 and imgs.shape[2] % 32 == 0
        assert im0[0].shape == (64, 96, 3)


def test_stream_sources_file(clip, tmp_path):
    """A text file of stream urls, one per line (reference streams.txt)."""
    lst = tmp_path / "streams.txt"
    lst.write_text(f"{clip}\n{clip}\n")
    s = LoadStreams(str(lst), img_size=64, stride=32)
    assert len(s) == 2
    _, imgs, im0, _ = next(iter(s))
    assert imgs.shape[0] == 2 and len(im0) == 2


@pytest.mark.slow
def test_detect_cli_stream_txt(clip, tmp_path):
    """detect CLI on a streams.txt source: threaded LoadStreams feed, per-
    stream annotated video outputs (reference detect.py:128-135, 256-268)."""
    import glob as _glob

    lst = tmp_path / "streams.txt"
    lst.write_text(f"{clip}\n")
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_fake_dataset import generate

    from desenet_tpu.cli.detect import run as detect_run
    from desenet_tpu.train.engine import TrainConfig, train

    root = tmp_path / "ds"
    generate(str(root), n_train=4, n_val=2, size=96, seed=3)
    res = train(TrainConfig(
        data=str(root / "data.yaml"),
        cfg=os.path.join(os.path.dirname(__file__), "configs",
                         "tiny_psp2.yaml"),
        epochs=1, batch_size=2, imgsz=64, workers=1, project=str(tmp_path),
        name="t", exist_ok=True, dtype="float32", nbs=2, warmup_floor=2,
        noautoanchor=True, use_tb=False, max_targets=16, noval=True,
    ))
    save_dir = detect_run(
        os.path.join(res["save_dir"], "last"), str(lst),
        imgsz=64, conf_thres=0.25, half=False,
        project=str(tmp_path / "det"), name="s", exist_ok=True,
    )
    vids = _glob.glob(os.path.join(save_dir, "*.mp4"))
    assert vids, f"no stream video written in {save_dir}"
