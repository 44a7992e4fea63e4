"""Fused tiled upsample + cross-entropy for segmentation training.

The reference training objective is pixel CE against the seg head's
8x-bilinear-upsampled logits (/root/reference/core/models/yolo.py:170-183
align_corners=True upsample; core/utils/loss.py:242-243 CrossEntropyLoss).
Computing it literally materializes a (B, H*8, W*8, C) logits tensor plus
its f32 cotangent — at l-scale/b128/640 the dominant single activation of
the train step (PERF.md round-4; l/b128 RESOURCE_EXHAUSTED on one 16 GB
v5e even with remat).

:func:`upsampled_ce` computes the SAME loss and gradient without ever
holding the full-resolution tensor: a ``lax.scan`` over output row-blocks
upsamples one block at a time (the separable interp-matrix formulation of
ops/resize.py, sliced along the output-H axis — per-element bit-identical
to ``resize_bilinear`` because the contraction order, operand dtypes and
precision flags are the same), reduces the masked CE partial sums, and in
the custom VJP re-runs the scan accumulating the exact transposed-matrix
gradient into the low-res logits. Live memory per step is one
(B, TB, W*8, C) block instead of the full map; FLOPs grow only by the one
block recompute in the backward.

Numerics note: the loss equals the unfused
``segmentation_loss(resize_bilinear(z), y)`` up to f32 summation order
(partial sums per block; ~1e-7 rel), and the gradient matches the unfused
VJP the same way — verified against the composition in
tests/test_seg_ce_fused.py at f32 and bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.ops.resize import _linear_matrix

__all__ = ["upsampled_ce"]


def _row_blocks(h_out: int, target: int = 64) -> int:
    """Number of uniform output-row blocks (a divisor of h_out, block size
    as close to `target` rows as possible from below)."""
    nblk = max(1, h_out // target)
    while h_out % nblk:
        nblk += 1
    return nblk


def _compute_cfg(dtype):
    """Mirror ops/resize._apply_separable's precision rule exactly."""
    if dtype == jnp.bfloat16 or dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        return jax.lax.Precision.DEFAULT, jnp.bfloat16
    return jax.lax.Precision.HIGHEST, jnp.float32


def _upsample_block(z, mh_blk, mw, prec, cdt, out_dtype):
    """One output-row block of resize_bilinear(z): H-contract with the
    block's rows of the H matrix, then the full W matrix — identical
    per-element math to ops/resize._apply_separable."""
    y = jnp.einsum("oh,nhwc->nowc", mh_blk, z.astype(cdt), precision=prec)
    y = jnp.einsum("pw,nhwc->nhpc", mw, y, precision=prec)
    return y.astype(out_dtype)


def _block_ce_sums(logits_blk, labels_blk, ignore_index, cw):
    """Masked CE partial sums over one block: (sum nll, sum weights)."""
    lf = logits_blk.astype(jnp.float32)
    valid = labels_blk != ignore_index
    safe = jnp.where(valid, labels_blk, 0)
    logp = jax.nn.log_softmax(lf, axis=-1)
    c = lf.shape[-1]
    onehot = safe[..., None] == jnp.arange(c, dtype=safe.dtype)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    if cw is not None:
        w = jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
        nll = nll * w
        den = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        den = jnp.sum(valid).astype(jnp.float32)
    return jnp.sum(jnp.where(valid, nll, 0.0)), den


def _prep(z, labels, out_hw, align_corners, row_target):
    b, h_in, w_in, c = z.shape
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    nblk = _row_blocks(h_out, row_target)
    tb = h_out // nblk
    prec, cdt = _compute_cfg(z.dtype)
    mh = jnp.asarray(_linear_matrix(h_in, h_out, align_corners), cdt)
    mw = jnp.asarray(_linear_matrix(w_in, w_out, align_corners), cdt)
    mh_blocks = mh.reshape(nblk, tb, h_in)
    # scan carries blocks on the leading axis
    lab_blocks = jnp.moveaxis(labels.reshape(b, nblk, tb, w_out), 1, 0)
    return mh_blocks, mw, lab_blocks, prec, cdt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 6))
def upsampled_ce(z, labels, out_hw, align_corners=True, ignore_index=-1,
                 class_weight=None, row_target=64):
    """Mean pixel CE of bilinear-upsampled logits, tiled over output rows.

    == ``segmentation_loss(resize_bilinear(z, out_hw, align_corners),
    labels, ...)`` (losses/segmentation.py) without materializing the
    upsampled map. ``z`` (B, h, w, C) low-res logits; ``labels``
    (B, H_out, W_out) int class ids; ``class_weight`` optional (C,) vector
    (differentiation w.r.t. it is not supported — it rides the residuals).
    """
    loss, _ = _fwd_sums(z, labels, out_hw, align_corners, ignore_index,
                        class_weight, row_target)
    return loss


def _fwd_sums(z, labels, out_hw, align_corners, ignore_index, class_weight,
              row_target):
    mh_blocks, mw, lab_blocks, prec, cdt = _prep(
        z, labels, out_hw, align_corners, row_target)
    cw = (None if class_weight is None
          else jnp.asarray(class_weight, jnp.float32))

    def body(carry, inp):
        mh_blk, lab_blk = inp
        up = _upsample_block(z, mh_blk, mw, prec, cdt, z.dtype)
        s, d = _block_ce_sums(up, lab_blk, ignore_index, cw)
        return (carry[0] + s, carry[1] + d), None

    (nll_sum, den), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.float32(0.0)), (mh_blocks, lab_blocks))
    den = jnp.maximum(den, 1.0)
    return nll_sum / den, den


def _ce_fwd(z, labels, out_hw, align_corners, ignore_index, class_weight,
            row_target):
    loss, den = _fwd_sums(z, labels, out_hw, align_corners, ignore_index,
                          class_weight, row_target)
    return loss, (z, labels, den, class_weight)


def _ce_bwd(out_hw, align_corners, ignore_index, row_target, res, g):
    z, labels, den, class_weight = res
    mh_blocks, mw, lab_blocks, prec, cdt = _prep(
        z, labels, out_hw, align_corners, row_target)
    cw = (None if class_weight is None
          else jnp.asarray(class_weight, jnp.float32))
    c = z.shape[-1]
    scale = g / den  # d loss / d nll_sum

    def body(dz, inp):
        mh_blk, lab_blk = inp
        up = _upsample_block(z, mh_blk, mw, prec, cdt, z.dtype)
        lf = up.astype(jnp.float32)
        valid = lab_blk != ignore_index
        safe = jnp.where(valid, lab_blk, 0)
        onehot = safe[..., None] == jnp.arange(c, dtype=safe.dtype)
        p = jax.nn.softmax(lf, axis=-1)
        if cw is None:
            w = valid.astype(jnp.float32)
        else:
            w = jnp.where(valid,
                          jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1), 0.0)
        g_up = (p - onehot.astype(jnp.float32)) * (w * scale)[..., None]
        # unfused-path parity: the astype(f32) boundary casts the cotangent
        # back to the logits dtype BEFORE the resize VJP's transposed
        # contractions run at the forward's precision/dtype
        g_up = g_up.astype(z.dtype).astype(cdt)
        gw = jnp.einsum("pw,nhpc->nhwc", mw, g_up, precision=prec)
        dz_blk = jnp.einsum("oh,nowc->nhwc", mh_blk, gw, precision=prec)
        return dz + dz_blk.astype(jnp.float32), None

    dz0 = jnp.zeros(z.shape, jnp.float32)
    dz, _ = jax.lax.scan(body, dz0, (mh_blocks, lab_blocks))
    return dz.astype(z.dtype), None, None


upsampled_ce.defvjp(_ce_fwd, _ce_bwd)
