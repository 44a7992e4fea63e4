"""Box geometry ops vs torch/reference oracle (tests-only torch usage)."""

import numpy as np
import jax.numpy as jnp
import pytest

from desenet_tpu.ops import (
    xyxy2xywh,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywhn,
    box_iou,
    bbox_iou,
    wh_iou,
    bbox_ioa,
    scale_coords,
)

torch = pytest.importorskip("torch")


def rand_xyxy(rng, n):
    xy = rng.uniform(0, 600, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(1, 40, size=(n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=1)


def test_xywh_roundtrip(rng):
    b = rand_xyxy(rng, 64)
    out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-4)


def test_xywhn2xyxy_matches_manual(rng):
    x = rng.uniform(0.2, 0.8, size=(10, 4)).astype(np.float32)
    out = np.asarray(xywhn2xyxy(jnp.asarray(x), w=640, h=480, padw=8, padh=4))
    exp = np.stack(
        [
            640 * (x[:, 0] - x[:, 2] / 2) + 8,
            480 * (x[:, 1] - x[:, 3] / 2) + 4,
            640 * (x[:, 0] + x[:, 2] / 2) + 8,
            480 * (x[:, 1] + x[:, 3] / 2) + 4,
        ],
        axis=1,
    )
    np.testing.assert_allclose(out, exp, rtol=1e-5)
    back = np.asarray(
        xyxy2xywhn(jnp.asarray(exp - np.array([8, 4, 8, 4], np.float32)), w=640, h=480)
    )
    np.testing.assert_allclose(back, x, atol=1e-5)


def _np_box_iou(a, b):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.clip(br - tl, 0, None).prod(-1)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None] - inter)


def test_box_iou_pairwise(rng):
    a, b = rand_xyxy(rng, 50), rand_xyxy(rng, 30)
    exp = _np_box_iou(a, b)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_wh_iou(rng):
    a = rng.uniform(1, 50, (8, 2)).astype(np.float32)
    b = rng.uniform(1, 50, (5, 2)).astype(np.float32)
    got = np.asarray(wh_iou(jnp.asarray(a), jnp.asarray(b)))
    inter = np.minimum(a[:, None], b[None]).prod(2)
    exp = inter / (a.prod(1)[:, None] + b.prod(1)[None] - inter)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_bbox_ioa(rng):
    b1 = rand_xyxy(rng, 1)[0]
    b2 = rand_xyxy(rng, 20)
    got = np.asarray(bbox_ioa(jnp.asarray(b1), jnp.asarray(b2)))
    iw = np.clip(np.minimum(b1[2], b2[:, 2]) - np.maximum(b1[0], b2[:, 0]), 0, None)
    ih = np.clip(np.minimum(b1[3], b2[:, 3]) - np.maximum(b1[1], b2[:, 1]), 0, None)
    exp = iw * ih / ((b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1]) + 1e-7)
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def _torch_bbox_iou_ciou(box1, box2):
    """Reference metrics.py:202-244 CIoU re-expressed in torch for the oracle."""
    import math

    eps = 1e-7
    b1 = torch.from_numpy(box1)
    b2 = torch.from_numpy(box2)
    b1_x1, b1_x2 = b1[:, 0] - b1[:, 2] / 2, b1[:, 0] + b1[:, 2] / 2
    b1_y1, b1_y2 = b1[:, 1] - b1[:, 3] / 2, b1[:, 1] + b1[:, 3] / 2
    b2_x1, b2_x2 = b2[:, 0] - b2[:, 2] / 2, b2[:, 0] + b2[:, 2] / 2
    b2_y1, b2_y2 = b2[:, 1] - b2[:, 3] / 2, b2[:, 1] + b2[:, 3] / 2
    inter = (torch.min(b1_x2, b2_x2) - torch.max(b1_x1, b2_x1)).clamp(0) * (
        torch.min(b1_y2, b2_y2) - torch.max(b1_y1, b2_y1)
    ).clamp(0)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = torch.max(b1_x2, b2_x2) - torch.min(b1_x1, b2_x1)
    ch = torch.max(b1_y2, b2_y2) - torch.min(b1_y1, b2_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = (
        (b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2
    ) / 4
    v = (4 / math.pi**2) * torch.pow(
        torch.atan(w2 / h2) - torch.atan(w1 / h1), 2
    )
    alpha = v / (v - iou + (1 + eps))
    return (iou - (rho2 / c2 + v * alpha)).numpy()


def test_ciou_matches_reference_formula(rng):
    n = 40
    b1 = np.concatenate(
        [rng.uniform(50, 500, (n, 2)), rng.uniform(5, 80, (n, 2))], axis=1
    ).astype(np.float32)
    b2 = np.concatenate(
        [b1[:, :2] + rng.uniform(-10, 10, (n, 2)), rng.uniform(5, 80, (n, 2))], axis=1
    ).astype(np.float32)
    exp = _torch_bbox_iou_ciou(b1, b2)
    got = np.asarray(
        bbox_iou(jnp.asarray(b1), jnp.asarray(b2), x1y1x2y2=False, CIoU=True)
    )
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_scale_coords_letterbox_inverse(rng):
    # image 480x640 letterboxed to 640x640: gain=1.0, pad=(0, 80)
    coords = rand_xyxy(rng, 10) * np.array([1, 0.7, 1, 0.7], np.float32) + np.array(
        [0, 80, 0, 80], np.float32
    )
    out = np.asarray(scale_coords((640, 640), jnp.asarray(coords), (480, 640)))
    exp = coords - np.array([0, 80, 0, 80], np.float32)
    exp[:, [1, 3]] = np.clip(exp[:, [1, 3]], 0, 480)
    np.testing.assert_allclose(out, exp, atol=1e-4)
