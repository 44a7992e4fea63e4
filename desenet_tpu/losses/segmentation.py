"""Segmentation losses.

Mirrors the reference SegmentationLosses (core/utils/loss.py:227-282): plain
2D cross-entropy over (B, H, W, C) logits vs (B, H, W) int labels, with the
optional aux-output combinations used by the BiSe head (aux_num 1/2,
loss.py:245-256). ignore_index semantics match torch CrossEntropyLoss
(default -1; ignored pixels drop out of the mean).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp


def _ce(logits: jax.Array, labels: jax.Array, ignore_index: int = -1,
        class_weight=None) -> jax.Array:
    """Mean pixel cross-entropy. logits (B,H,W,C) NHWC; labels (B,H,W) int.

    The per-pixel class pick is a comparison-masked reduction, NOT a gather:
    take_along_axis over B*H*W pixels lowers to a scalar-gather loop on TPU
    and dominated the whole train step (~20x the conv forward) before this
    formulation.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    c = logits.shape[-1]
    onehot = safe[..., None] == jnp.arange(c, dtype=safe.dtype)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        w = jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
        nll = nll * w
        denom = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def segmentation_loss(
    preds: Union[jax.Array, Sequence[jax.Array]],
    labels: jax.Array,
    aux_weight: float = 0.1,
    ignore_index: int = -1,
    class_weight=None,
) -> jax.Array:
    """Dispatch on aux count like the reference's ugly-interface forward
    (loss.py:241-256):
      1 output  -> plain CE (PSP/PSP2/Lab/Base heads)
      2 outputs -> main + aux_weight * aux
      3 outputs -> main + 1.5*aux_weight * aux16 + 0.5*aux_weight * aux32
    """
    if isinstance(preds, (list, tuple)):
        if len(preds) == 1:
            return _ce(preds[0], labels, ignore_index, class_weight)
        if len(preds) == 2:
            return _ce(preds[0], labels, ignore_index, class_weight) + (
                aux_weight * _ce(preds[1], labels, ignore_index, class_weight)
            )
        if len(preds) == 3:
            return (
                _ce(preds[0], labels, ignore_index, class_weight)
                + aux_weight * 1.5 * _ce(preds[1], labels, ignore_index, class_weight)
                + aux_weight / 2.0 * _ce(preds[2], labels, ignore_index, class_weight)
            )
        raise ValueError(f"unsupported aux count {len(preds)}")
    return _ce(preds, labels, ignore_index, class_weight)
