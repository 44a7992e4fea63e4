"""Fused seg-tail kernel: bilinear 8x upsample + channel argmax in VMEM.

The production seg tail (reference yolo.py:227-230 upsample + val/detect
argmax) is `argmax_c(resize_bilinear(logits, 8x))`. Composed in XLA this
materializes the full-res logits (B, 8h, 8w, C) in HBM (plus the separable-
matmul intermediate) and the channel dim C is far below the 128-lane width,
so the resize matmuls starve the MXU — measured 5.4 ms standalone at b128
(PERF.md "Inference split").

This kernel keeps everything per-image in VMEM: read the (h, w, C) low-res
logits once (~19 KB for C=3), form the row-interpolated (8h, w*C) panel with
one MXU matmul, column-interpolate each channel with a second matmul, run
the argmax incrementally, and write ONLY the (8h, 8w) uint8 class map.
Interpolation matrices are the same `_linear_matrix` constants the XLA
path uses (ops/resize.py), computed in f32 — i.e. at least as accurate as
the bf16 production composition and bit-matched to the f32 composition.

Argmax tie-breaking: first (lowest) channel index wins, matching
jnp.argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desenet_tpu.ops.resize import _linear_matrix


def _kernel(x_ref, mh_ref, mwt_ref, out_ref, *, n, h, w, c, ho, wo, mxu):
    # x_ref is (N, C, h, w): channel slices are leading-dim reads (Mosaic
    # cannot shape-cast a narrow minor dim inside vector registers). The N
    # images of a block are batched into ONE pair of stacked matmuls per
    # channel — per-grid-step overhead killed a per-image grid (measured
    # 5.5 ms ~= 128 x ~40 us step latency).
    best_val = None
    best_idx = None
    for ch in range(c):
        # row pass: mh @ [x_0 | x_1 | ...] — images stacked along lanes.
        # w is zero-padded to a 128-lane multiple OUTSIDE the kernel so all
        # concat/slice offsets here are tile-aligned (Mosaic requirement).
        xc = jnp.concatenate(
            [x_ref[i, ch].astype(mxu) for i in range(n)], axis=1)
        rows = jnp.dot(mh_ref[:], xc,
                       preferred_element_type=jnp.float32)  # (ho, n*w)
        # column pass: images stacked along sublanes
        rows = jnp.concatenate(
            [rows[:, i * w:(i + 1) * w] for i in range(n)], axis=0)
        plane = jnp.dot(rows.astype(mxu), mwt_ref[:],
                        preferred_element_type=jnp.float32)  # (n*ho, wo)
        if ch == 0:
            best_val = plane
            best_idx = jnp.zeros((n * ho, wo), jnp.int32)
        else:
            better = plane > best_val  # strict: first max wins (jnp.argmax)
            best_val = jnp.where(better, plane, best_val)
            best_idx = jnp.where(better, ch, best_idx)
    out_ref[:] = best_idx.reshape(n, ho, wo).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "align_corners",
                                             "interpret", "mxu_dtype"))
def upsample_argmax(x: jax.Array, scale: int = 8, align_corners: bool = True,
                    interpret: bool = False,
                    mxu_dtype=jnp.float32) -> jax.Array:
    """argmax_c(bilinear_resize(x, (h*scale, w*scale))) -> (B, H, W) uint8.

    x: (B, h, w, C) float logits (bf16/f32). Uses the Pallas kernel on TPU,
    the XLA composition elsewhere. `mxu_dtype` sets the matmul operand
    precision: f32 bit-matches the f32 XLA composition; bf16 runs the MXU at
    full rate (accumulation stays f32) and can flip argmax picks only where
    the interpolated top-2 margin is below bf16 resolution — i.e. at class
    boundaries that are already noise in the bf16 production logits.
    """
    b, h, w, c = x.shape
    ho, wo = h * scale, w * scale
    if jax.default_backend() != "tpu" and not interpret:
        from desenet_tpu.ops.resize import resize_bilinear

        up = resize_bilinear(x.astype(jnp.float32), (ho, wo), align_corners)
        return jnp.argmax(up, axis=-1).astype(jnp.uint8)

    mh = jnp.asarray(_linear_matrix(h, ho, align_corners), mxu_dtype)
    mwt = np.asarray(_linear_matrix(w, wo, align_corners).T)
    # pad the contracted dim to a 128-lane multiple: in-kernel concat/slice
    # offsets must be tile-aligned, and the zero rows contribute nothing
    wp = -(-w // 128) * 128
    mwt = jnp.asarray(np.pad(mwt, ((0, wp - w), (0, 0))), mxu_dtype)
    xt = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, h, w): lane-friendly slices
    if wp != w:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    n = 1
    for cand in (8, 4, 2):
        if b % cand == 0:
            n = cand
            break
    kernel = functools.partial(_kernel, n=n, h=h, w=wp, c=c, ho=ho, wo=wo,
                               mxu=mxu_dtype)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // n,),
        in_specs=[
            pl.BlockSpec((n, c, h, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(ho, h),
            full(wp, wo),
        ],
        out_specs=pl.BlockSpec((n, ho, wo), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, mh, mwt)
