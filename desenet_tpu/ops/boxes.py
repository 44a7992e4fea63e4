"""Box geometry: coordinate conversions and the IoU family.

Pure jnp functions (work on both device arrays and numpy via jnp). Semantics
match the reference implementations in core/utils/general.py:513-656 and
core/utils/metrics.py:202-301 (splwany/DeSeNet), re-derived for JAX.

All functions are shape-polymorphic over leading dims; boxes live in the last
axis of size 4.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xyxy2xywh(x):
    """[x1,y1,x2,y2] -> [cx,cy,w,h]  (general.py:513-521)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(x):
    """[cx,cy,w,h] -> [x1,y1,x2,y2]  (general.py:524-532)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized [cx,cy,w,h] -> pixel [x1,y1,x2,y2] with letterbox pad offset
    (general.py:535-543)."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    """Pixel [x1,y1,x2,y2] -> normalized [cx,cy,w,h]  (general.py:546-556)."""
    if clip:
        x = clip_coords(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [((x1 + x2) / 2) / w, ((y1 + y2) / 2) / h, (x2 - x1) / w, (y2 - y1) / h],
        axis=-1,
    )


def xyn2xy(x, w=640, h=640, padw=0, padh=0):
    """Normalized point coords -> pixel coords (general.py:559-565)."""
    xs, ys = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([w * xs + padw, h * ys + padh], axis=-1)


def clip_coords(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)  (general.py:612-623)."""
    h, w = shape
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x1, 0, w),
            jnp.clip(y1, 0, h),
            jnp.clip(x2, 0, w),
            jnp.clip(y2, 0, h),
        ],
        axis=-1,
    )


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Rescale xyxy coords from letterboxed img1_shape (h,w) back to native
    img0_shape (h,w)  (general.py:598-609)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    coords = coords - jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=coords.dtype)
    coords = coords / gain
    return clip_coords(coords, img0_shape)


def box_iou(box1, box2, eps=1e-7):
    """Pairwise IoU matrix between xyxy boxes: (N,4),(M,4) -> (N,M)
    (metrics.py:247-264)."""
    a1 = box1[:, None, :2]  # (N,1,2)
    a2 = box1[:, None, 2:4]
    b1 = box2[None, :, :2]  # (1,M,2)
    b2 = box2[None, :, 2:4]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = jnp.clip(box1[:, 2] - box1[:, 0], 0, None) * jnp.clip(
        box1[:, 3] - box1[:, 1], 0, None
    )
    area2 = jnp.clip(box2[:, 2] - box2[:, 0], 0, None) * jnp.clip(
        box2[:, 3] - box2[:, 1], 0, None
    )
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def wh_iou(wh1, wh2):
    """Pairwise IoU of width-height pairs centered at origin: (N,2),(M,2)->(N,M)
    (metrics.py:293-301)."""
    wh1 = wh1[:, None]  # (N,1,2)
    wh2 = wh2[None]  # (1,M,2)
    inter = jnp.minimum(wh1, wh2).prod(2)
    return inter / (wh1.prod(2) + wh2.prod(2) - inter)


def bbox_ioa(box1, box2, eps=1e-7):
    """Intersection over box2 area: (4,),(N,4)->(N,)  (metrics.py:267-290)."""
    b1x1, b1y1, b1x2, b1y2 = box1[0], box1[1], box1[2], box1[3]
    b2x1, b2y1, b2x2, b2y2 = box2[:, 0], box2[:, 1], box2[:, 2], box2[:, 3]
    iw = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None)
    ih = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None)
    area2 = (b2x2 - b2x1) * (b2y2 - b2y1) + eps
    return iw * ih / area2


def bbox_iou(box1, box2, x1y1x2y2=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """Elementwise IoU / GIoU / DIoU / CIoU between aligned box arrays (...,4).

    Matches metrics.py:202-244 (used by the detection loss with CIoU=True).
    Unlike the torch version (which takes box1 transposed), both inputs here
    are (...,4); broadcasting applies.
    """
    if x1y1x2y2:
        b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
        b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    else:  # xywh -> xyxy
        b1x1, b1x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1y1, b1y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2x1, b2x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2y1, b2y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )

    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # convex width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # convex height
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps  # convex diagonal squared
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if DIoU:
            return iou - rho2 / c2
        # CIoU https://arxiv.org/abs/1911.08287v1
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        # alpha uses stop_gradient like the torch impl (torch.no_grad)
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    # GIoU https://arxiv.org/pdf/1902.09630.pdf
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area
