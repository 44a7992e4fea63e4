"""Host-side image/label augmentation (numpy + cv2), deterministic by
construction.

Behavioral contract matches the reference pipeline (mixed_datasets.py:
letterbox :722-752, augment_hsv :643-654, random_perspective :755-837,
load_mosaic :657-719, box_candidates :840-845) with one deliberate redesign:
every stochastic op takes an explicit np.random.Generator instead of mutating
the global `random` state — per-(epoch, index) seeding makes any sample
reproducible in isolation (the reference's global-RNG soup cannot be
replayed; SURVEY §7 determinism note).

Images are HWC BGR uint8 throughout (cv2 convention), converted to RGB once
at tensor-assembly time, like the reference.

Det labels: (n, 5) [cls, x1, y1, x2, y2] *pixel* xyxy inside augmentation.
Seg labels: list of (cls_id, (k, 2) float32 pixel polygon).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import cv2
import numpy as np

PAD_VALUE = 114  # gray fill used by letterbox / mosaic / warps


def letterbox(
    img: np.ndarray,
    new_shape=640,
    color=(PAD_VALUE, PAD_VALUE, PAD_VALUE),
    auto: bool = True,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
):
    """Aspect-preserving resize + pad. Returns (img, (rw, rh), (dw, dh))."""
    shape = img.shape[:2]  # (h, w)
    if isinstance(new_shape, (int, np.integer)):
        new_shape = (int(new_shape), int(new_shape))

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)

    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # (w, h)
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])

    dw /= 2
    dh /= 2
    if (shape[1], shape[0]) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=color)
    return img, ratio, (dw, dh)


def augment_hsv(img: np.ndarray, rng: np.random.Generator,
                hgain=0.5, sgain=0.5, vgain=0.5) -> np.ndarray:
    """LUT-based random HSV jitter (in place, BGR uint8)."""
    if hgain == 0 and sgain == 0 and vgain == 0:
        return img
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=np.int16)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
    hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                     cv2.LUT(val, lut_v)))
    cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def box_candidates(before: np.ndarray, after: np.ndarray,
                   wh_thr=2.0, ar_thr=20.0, area_thr=0.1, eps=1e-16):
    """Keep boxes that survive a geometric transform (4,n) xyxy arrays."""
    w1, h1 = before[2] - before[0], before[3] - before[1]
    w2, h2 = after[2] - after[0], after[3] - after[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (
        (w2 > wh_thr)
        & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + eps) > area_thr)
        & (ar < ar_thr)
    )


def random_perspective(
    img: np.ndarray,
    det: np.ndarray,
    seg: List[Tuple[int, np.ndarray]],
    rng: np.random.Generator,
    degrees=10.0,
    translate=0.1,
    scale=0.1,
    shear=10.0,
    perspective=0.0,
    border=(0, 0),
):
    """Compose center/perspective/rotation-scale/shear/translation into one
    3x3 matrix; warp image, re-fit det boxes (corner transform + min/max +
    candidate filter), transform seg polygons pointwise by the same M."""
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(PAD_VALUE,) * 3)
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(PAD_VALUE,) * 3)

    if len(det):
        n = len(det)
        xy = np.ones((n * 4, 3))
        xy[:, :2] = det[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = box_candidates(det[:, 1:5].T * s, new.T, area_thr=0.10)
        det = det[keep]
        det[:, 1:5] = new[keep]

    new_seg = []
    for cls_id, pts in seg:
        p = np.concatenate([pts, np.ones((len(pts), 1), pts.dtype)], axis=1)
        p = p @ M.T
        p = p[:, :2] / p[:, 2:3] if perspective else p[:, :2]
        new_seg.append((cls_id, p.astype(np.float32)))

    return img, det, new_seg


def flip_ud(img, det, seg):
    """Vertical flip; det is normalized xywh [cls,x,y,w,h], seg pixel polys."""
    img = np.flipud(img)
    h = img.shape[0]
    if len(det):
        det[:, 2] = 1 - det[:, 2]
    seg = [(c, np.stack([p[:, 0], h - p[:, 1]], axis=1)) for c, p in seg]
    return img, det, seg


def flip_lr(img, det, seg):
    img = np.fliplr(img)
    w = img.shape[1]
    if len(det):
        det[:, 1] = 1 - det[:, 1]
    seg = [(c, np.stack([w - p[:, 0], p[:, 1]], axis=1)) for c, p in seg]
    return img, det, seg


def denorm_boxes(xywhn: np.ndarray, w, h, padw=0.0, padh=0.0) -> np.ndarray:
    """normalized xywh -> pixel xyxy with offset (general.py:535-543)."""
    out = np.empty_like(xywhn)
    out[:, 0] = w * (xywhn[:, 0] - xywhn[:, 2] / 2) + padw
    out[:, 1] = h * (xywhn[:, 1] - xywhn[:, 3] / 2) + padh
    out[:, 2] = w * (xywhn[:, 0] + xywhn[:, 2] / 2) + padw
    out[:, 3] = h * (xywhn[:, 1] + xywhn[:, 3] / 2) + padh
    return out


def denorm_polys(seg, w, h, padw=0.0, padh=0.0):
    """normalized polygon points -> pixel coords (general.py seg_xyn2xy)."""
    return [
        (c, np.stack([w * p[:, 0] + padw, h * p[:, 1] + padh], axis=1)
            .astype(np.float32))
        for c, p in seg
    ]
