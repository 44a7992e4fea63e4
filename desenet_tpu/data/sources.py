"""Inference input sources: files/dirs/globs of images & videos, webcam/RTSP
streams — reference LoadImages/LoadStreams (mixed_datasets.py:155-322),
including the threaded stream reader (fixing the reference's missing
Thread/time imports bug there, :270/:296)."""

from __future__ import annotations

import glob
import os
import time
from pathlib import Path
from threading import Thread
from typing import List

import cv2
import numpy as np

from desenet_tpu.data.augment import letterbox

IMG_FORMATS = ["bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp", "mpo"]
VID_FORMATS = ["mov", "avi", "mp4", "mpg", "mpeg", "m4v", "wmv", "mkv"]


class LoadImages:
    """Iterate over image/video files: yields (path, img CHW-free NHWC-ready
    RGB uint8 letterboxed, im0 BGR native, vid_cap)."""

    def __init__(self, path, img_size=640, stride=32, auto=False):
        p = str(Path(path).resolve())
        if "*" in p:
            files = sorted(glob.glob(p, recursive=True))
        elif os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.*")))
        elif os.path.isfile(p):
            files = [p]
        else:
            raise FileNotFoundError(f"{p} does not exist")

        images = [x for x in files if x.split(".")[-1].lower() in IMG_FORMATS]
        videos = [x for x in files if x.split(".")[-1].lower() in VID_FORMATS]
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        self.files = images + videos
        self.video_flag = [False] * len(images) + [True] * len(videos)
        self.nf = len(self.files)
        self.mode = "image"
        self.cap = None
        if videos:
            self._new_video(videos[0])
        assert self.nf > 0, (
            f"no images/videos found in {p} "
            f"(images: {IMG_FORMATS}, videos: {VID_FORMATS})"
        )

    def _new_video(self, path):
        self.frame = 0
        self.cap = cv2.VideoCapture(path)
        self.frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        if self.count == self.nf:
            raise StopIteration
        path = self.files[self.count]
        if self.video_flag[self.count]:
            self.mode = "video"
            ok, im0 = self.cap.read()
            if not ok:
                self.count += 1
                self.cap.release()
                if self.count == self.nf:
                    raise StopIteration
                self._new_video(self.files[self.count])
                ok, im0 = self.cap.read()
            self.frame += 1
        else:
            self.count += 1
            im0 = cv2.imread(path)
            assert im0 is not None, f"image not found {path}"
        img = letterbox(im0, self.img_size, stride=self.stride,
                        auto=self.auto)[0]
        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB, HWC
        return path, img, im0, self.cap

    def __len__(self):
        return self.nf


class LoadStreams:
    """Threaded multi-stream reader (webcam index / RTSP / HTTP urls, one per
    line if `sources` is a file)."""

    def __init__(self, sources="0", img_size=640, stride=32, auto=False):
        self.mode = "stream"
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        if os.path.isfile(sources) and sources.lower().endswith(".txt"):
            # a *.txt file lists one stream url per line (streams.txt);
            # any other existing file (e.g. an .mp4) is itself the stream
            with open(sources) as f:
                sources = [x.strip() for x in f if x.strip()]
        else:
            sources = [sources]
        n = len(sources)
        self.sources = sources
        self.imgs: List = [None] * n
        self.fps = [0.0] * n
        self.frames = [0] * n
        self.threads: List[Thread] = [None] * n
        for i, s in enumerate(sources):
            src = int(s) if s.isnumeric() else s
            cap = cv2.VideoCapture(src)
            assert cap.isOpened(), f"failed to open {s}"
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            self.fps[i] = max(cap.get(cv2.CAP_PROP_FPS) % 100, 0) or 30.0
            self.frames[i] = max(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)), 0) \
                or float("inf")
            ok, self.imgs[i] = cap.read()
            assert ok, f"failed to read from {s}"
            self.threads[i] = Thread(target=self._update, args=(i, cap, s),
                                     daemon=True)
            print(f"stream {i}: {s} ({w}x{h} at {self.fps[i]:.0f} FPS)")
            self.threads[i].start()

    def _update(self, i, cap, stream):
        n, f, read = 0, self.frames[i], 1
        while cap.isOpened() and n < f:
            n += 1
            cap.grab()
            if n % read == 0:
                ok, im = cap.retrieve()
                if ok:
                    self.imgs[i] = im
                else:
                    self.imgs[i] = np.zeros_like(self.imgs[i])
                    cap.open(stream)  # re-open if signal lost
            time.sleep(1 / self.fps[i])

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        if not all(t.is_alive() for t in self.threads) or \
                cv2.waitKey(1) == ord("q"):
            cv2.destroyAllWindows()
            raise StopIteration
        im0 = [im.copy() for im in self.imgs]
        imgs = [
            np.ascontiguousarray(
                letterbox(im, self.img_size, stride=self.stride,
                          auto=self.auto)[0][:, :, ::-1]
            )
            for im in im0
        ]
        return self.sources, np.stack(imgs), im0, None

    def __len__(self):
        return len(self.sources)
