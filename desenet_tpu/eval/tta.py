"""Test-time augmentation — reference Model._forward_augment /
_descale_pred / scale_img (yolo.py:331-373, torch_utils.py:262-272).

Scales [1, 0.83, 0.67] x flips [none, lr, none]; each variant runs the
normal jitted forward at its own (static) padded shape; decoded predictions
are inverse-transformed and concatenated for one NMS pass.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from desenet_tpu.ops.resize import resize_bilinear

TTA_VARIANTS: Tuple[Tuple[float, str], ...] = (
    (1.0, ""), (0.83, "lr"), (0.67, ""),
)


def scale_img(x: jax.Array, ratio: float, gs: int = 32) -> jax.Array:
    """Resize NHWC by ratio and pad bottom/right to stride multiple with the
    ImageNet-mean gray 0.447 (torch_utils.py:262-272)."""
    if ratio == 1.0:
        return x
    h, w = x.shape[1:3]
    hs, ws = int(h * ratio), int(w * ratio)
    x = resize_bilinear(x, (hs, ws), align_corners=False)
    hp = math.ceil(hs / gs) * gs
    wp = math.ceil(ws / gs) * gs
    return jnp.pad(
        x, ((0, 0), (0, hp - hs), (0, wp - ws), (0, 0)),
        constant_values=0.447,
    )


def descale_pred(p: jax.Array, flip: str, scale: float,
                 img_hw: Tuple[int, int]) -> jax.Array:
    """Invert the scale/flip on decoded predictions (B, A, 5+nc)
    (yolo.py:358-373)."""
    xy = p[..., 0:2] / scale
    wh = p[..., 2:4] / scale
    if flip == "ud":
        xy = jnp.stack([xy[..., 0], img_hw[0] - xy[..., 1]], axis=-1)
    elif flip == "lr":
        xy = jnp.stack([img_hw[1] - xy[..., 0], xy[..., 1]], axis=-1)
    return jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)


def forward_augment(model, variables, x: jax.Array) -> jax.Array:
    """Augmented inference: returns concatenated decoded predictions
    (B, sum_A, 5+nc) ready for NMS. Jit-compatible (static shapes per
    variant)."""
    return forward_augment_joint(model, variables, x, with_seg=False)[0]


def forward_augment_joint(model, variables, x: jax.Array,
                          with_seg: bool = True):
    """Joint TTA: detection predictions concatenated across the variants
    (exactly ``forward_augment``) PLUS segmentation logits averaged over
    them (inverse-flipped, unpadded, resized back to the input grid).

    The reference only augments detection (yolo.py:331-342 discards the seg
    output of each TTA variant); averaging the seg logits is a free quality
    extension since every variant's forward already computes them. Requires
    a full-resolution seg head (``seg_upsample=True`` builds, the
    validator's configuration) — 1/8-res fused-tail builds (detect CLI)
    keep detection-only TTA.

    Returns ``(dec, seg_logits)``; ``seg_logits`` is None when
    ``with_seg=False``.
    """
    img_hw = x.shape[1:3]
    gs = max(model.spec.det_strides)
    outs, segs = [], []
    for scale, flip in TTA_VARIANTS:
        xi = x
        if flip == "lr":
            xi = xi[:, :, ::-1, :]
        elif flip == "ud":
            xi = xi[:, ::-1, :, :]
        xi = scale_img(xi, scale, gs)
        (dec, _), seg = model.apply(variables, xi, train=False)
        outs.append(descale_pred(dec, flip, scale, img_hw))
        if not with_seg:
            continue
        if seg.shape[1:3] != xi.shape[1:3]:
            raise ValueError(
                "seg TTA needs full-resolution seg logits; build the model "
                f"with seg_upsample=True (got seg {seg.shape[1:3]} for "
                f"input {xi.shape[1:3]})")
        if scale != 1.0:
            hs, ws = int(img_hw[0] * scale), int(img_hw[1] * scale)
            # drop the stride padding, then resize the valid logits back to
            # the base grid (align_corners=False — the val resize
            # convention, val.py:47)
            seg = resize_bilinear(seg[:, :hs, :ws, :], img_hw,
                                  align_corners=False)
        if flip == "lr":
            seg = seg[:, :, ::-1, :]
        elif flip == "ud":
            seg = seg[:, ::-1, :, :]
        segs.append(seg.astype(jnp.float32))
    dec = jnp.concatenate(outs, axis=1)
    if not with_seg:
        return dec, None
    return dec, jnp.mean(jnp.stack(segs), axis=0)
