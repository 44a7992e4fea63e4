"""Detections container parity with the reference result object
(common.py:784-882): coordinate variants, pandas frames, tolist split."""

import os
import numpy as np

from desenet_tpu.api import Detections


def make_dets():
    img = np.zeros((100, 200, 3), np.uint8)
    d = np.array([[20.0, 10.0, 60.0, 50.0, 0.9, 1],
                  [100.0, 40.0, 180.0, 90.0, 0.5, 0]], np.float32)
    mask = np.zeros((100, 200), np.uint8)
    return Detections([img], [d], [mask], names=["a", "b"], se_names=["bg"])


def test_xywh_and_normalized_variants():
    dets = make_dets()
    xywh = dets.xywh[0]
    np.testing.assert_allclose(xywh[0, :4], [40, 30, 40, 40])
    xyxyn = dets.xyxyn[0]
    np.testing.assert_allclose(xyxyn[0, :4], [0.1, 0.1, 0.3, 0.5])
    xywhn = dets.xywhn[0]
    np.testing.assert_allclose(xywhn[0, :4], [0.2, 0.3, 0.2, 0.4])
    # conf/cls columns untouched
    np.testing.assert_allclose(xyxyn[:, 4], [0.9, 0.5])


def test_pandas_frames():
    dets = make_dets()
    df = dets.pandas("xyxy")[0]
    assert list(df.columns) == ["xmin", "ymin", "xmax", "ymax",
                                "confidence", "class", "name"]
    assert df.shape == (2, 7)
    assert df["name"].tolist() == ["b", "a"]
    dfn = dets.pandas("xywhn")[0]
    assert abs(dfn["xcenter"][0] - 0.2) < 1e-6


def test_tolist_split():
    img2 = np.zeros((50, 50, 3), np.uint8)
    d2 = np.zeros((0, 6), np.float32)
    base = make_dets()
    dets = Detections(base.imgs + [img2], base.xyxy + [d2],
                      base.masks + [np.zeros((50, 50), np.uint8)],
                      base.names, base.se_names)
    parts = dets.tolist()
    assert len(parts) == 2 and all(len(p) == 1 for p in parts)
    assert len(parts[0].xyxy[0]) == 2 and len(parts[1].xyxy[0]) == 0
    assert "2 images" in repr(dets)


def test_crop_clips_out_of_bounds(tmp_path):
    """Boxes extending past image bounds crop the clipped region (the
    reference save_one_box pads then clips; a raw negative index would
    silently wrap)."""
    import cv2

    img = np.full((100, 200, 3), 255, np.uint8)
    d = np.array([[-30.0, -20.0, 50.0, 40.0, 0.9, 0]], np.float32)
    dets = Detections([img], [d], [np.zeros((100, 200), np.uint8)],
                      names=["a"], se_names=["bg"])
    out = dets.crop(str(tmp_path / "crops"))
    files = os.listdir(out)
    assert len(files) == 1
    crop = cv2.imread(os.path.join(out, files[0]))
    assert crop is not None and crop.size > 0
    h, w = crop.shape[:2]
    assert 0 < w <= 62 and 0 < h <= 52  # clipped at 0, padded past 50/40
