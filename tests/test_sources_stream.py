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
