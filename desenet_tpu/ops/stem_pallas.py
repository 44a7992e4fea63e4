"""Pallas TPU kernel for the FusedFocus stem (6x6/s2 conv, 3->C_out).

Why: XLA's conv on a 3-channel input runs at ~6% MXU (7.6 ms of the 44.6 ms
b128-640px inference program — the single worst layer, tools/profile_layers.py;
channel padding, space-to-depth, NCHW, f32 accum all measured no better,
tools/probe_stem*.py). The contraction per tap is K=3; the MXU wants ~128.

Formulation: an XLA prepass splits the padded input into 12 PHASE PLANES
(row parity sy, column parity sx, channel c) stored ROW-INTERLEAVED as
(B, H/2+8, 16, lanes) — plane dim padded 12->16, output-pixel-contiguous
lanes (zero lane pad so shifted windows never read garbage). The 6x6/s2
conv becomes a 3x3/s1 conv over the planes:

    out[i,j] = sum_{dy,dx,p} plane[p][i+dy, j+dx] * Wm[(dy*3+dx)*12+p]

Per row-block the kernel builds A (112, TH*lanes) — tap dim in SUBLANES
(108 used + 4 zero rows, so K fits ONE MXU pass and every tap copy is a
bulk (12, lanes) 2D move), then ONE dot Wm^T x A -> (co, M) so the
bias+SiLU epilogue runs on full lanes, and stores each row back NHWC via
small (co, w_out) transposes.

Hard-won Mosaic/TPU constraints baked into this design (each one was a
measured compile error or a >10 ms stall):
  - no bf16 strided sublane loads; no minor-dim reshapes; no 3D dots
  - DMA sublane slices must be 8-aligned
  - manual DMA start/wait serializes against compute (~17 us/block stall):
    inputs stream via BlockSpec'd main + halo arrays (auto double-buffered)
  - a full scratch zero-fill per block costs more than the matmul: scratch
    persists across sequential grid steps, so zero the 4 K-pad rows once
  - sublane-thin copies are cheap (vreg count ~ sublanes/8); lane-thin
    copies and epilogues are 4-10x waste — hence A with K in sublanes and
    the (co, M) epilogue orientation

Training keeps the XLA conv (no backward here); this is the inference stem.

Reference analog: Focus (common.py:618-627) == the fused 6x6/s2 conv
(round-1 equivalence, models/layers.py FusedFocus).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - pallas availability
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    HAVE_PALLAS = False

K_TAPS = 108  # 3x3 offsets x 12 phase planes
K_PAD = 112   # sublane-padded K (one MXU pass, <=128)


def stem_weight_matrix(w, dtype=jnp.bfloat16):
    """(6,6,3,CO) HWIO kernel -> (112, CO) tap matrix in kernel order:
    kk = (dy*3+dx)*12 + sy*6 + sx*3 + c,  tap = W[2dy+sy, 2dx+sx, c]."""
    w = np.asarray(w, np.float32)
    assert w.shape[:3] == (6, 6, 3), w.shape
    co = w.shape[3]
    wm = np.zeros((K_PAD, co), np.float32)
    for dy in range(3):
        for dx in range(3):
            for sy in range(2):
                for sx in range(2):
                    for c in range(3):
                        kk = (dy * 3 + dx) * 12 + sy * 6 + sx * 3 + c
                        wm[kk] = w[2 * dy + sy, 2 * dx + sx, c]
    return jnp.asarray(wm, dtype)


def _kernel(xm_ref, xh_ref, wm_ref, b_ref, out_ref, abuf, *, th, w_out,
            silu):
    lanes = xm_ref.shape[-1]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _zero_pad_rows():  # scratch persists across (sequential) grid steps
        abuf[K_TAPS:K_PAD, :] = jnp.zeros_like(abuf[K_TAPS:K_PAD, :])

    def src_row(i):  # rows 0..th-1 from the main block, th.. from the halo
        return xm_ref[0, i] if i < th else xh_ref[0, 0, i - th]

    for dy in range(3):
        for i in range(th):
            row = src_row(dy + i)  # (16, lanes)
            for dx in range(3):
                g = dy * 3 + dx
                abuf[g * 12:(g + 1) * 12,
                     i * lanes:i * lanes + lanes - dx] = row[0:12, dx:]

    y = jax.lax.dot_general(
        wm_ref[:], abuf[...],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (co, th*lanes)
    y = y + b_ref[:].astype(jnp.float32)[:, None]
    if silu:
        y = y * jax.nn.sigmoid(y)
    y = y.astype(out_ref.dtype)
    for i in range(th):
        out_ref[0, i] = y[:, i * lanes:i * lanes + w_out].T  # (w_out, co)


def _plane_split(x):
    """(B,H,W,3) -> (B, H/2+8, 16, lanes) row-interleaved phase planes."""
    b, h, w, _ = x.shape
    hp, wp = h // 2 + 2, w // 2 + 2
    lanes = -((-wp) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xp = xp.reshape(b, hp, 2, wp, 2, 3)
    xp = xp.transpose(0, 1, 2, 4, 5, 3)  # (B, hp, sy, sx, c, wp)
    xp = xp.reshape(b, hp, 12, wp)
    return jnp.pad(xp, ((0, 0), (0, 6), (0, 4), (0, lanes - wp)))


@functools.partial(jax.jit,
                   static_argnames=("silu", "block_rows", "interpret"))
def stem_conv(x, wm, bias, *, silu=True, block_rows=32, interpret=False):
    """6x6/s2 'same'(pad 2) conv + bias + optional SiLU via Pallas.

    NOT on the production path — a documented NEGATIVE result. The kernel
    itself is bit-exact vs the XLA conv and its body is nearly free, but
    the XLA prepass (_plane_split) costs 8.7 ms at b128 — more than the
    7.8 ms XLA conv it replaces — and Mosaic cannot deinterleave the NHWC
    rows in-kernel (no bf16 strided loads / minor-dim reshapes). Full
    measurement history in PERF.md "Pallas stem kernel".

    x:    (B, H, W, 3), H and W even
    wm:   (112, CO) from stem_weight_matrix (BN pre-folded for inference)
    bias: (CO,) f32
    returns (B, H//2, W//2, CO) in x.dtype
    """
    b, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, x.shape
    h_out, w_out = h // 2, w // 2
    th = block_rows
    if h_out % th:
        th = next(t for t in (16, 8, 4, 2, 1) if h_out % t == 0)
    co = wm.shape[1]
    xq = _plane_split(x)  # (B, h_out+8, 16, lanes)
    lanes = xq.shape[-1]
    nblk = h_out // th
    # halo: rows [th*(r+1), th*(r+1)+2) for each block r (padded to 8 rows
    # upstream; 2 used). Streamed as a second BlockSpec input so pallas
    # pipelines both DMAs (manual DMA stalls ~17us/block).
    halo = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xq, th * (r + 1), 8, axis=1)
         for r in range(nblk)], axis=1)  # (B, nblk, 8, 16, lanes)

    kern = functools.partial(_kernel, th=th, w_out=w_out, silu=silu)
    out = pl.pallas_call(
        kern,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, th, 16, lanes), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 16, lanes), lambda i, r: (i, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_PAD, co), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co,), lambda i, r: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w_out, co),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((K_PAD, th * lanes), x.dtype),
        ],
        interpret=interpret,
    )(xq, halo, wm, bias)
    return out


def stem_conv_reference(x, w, bias=None, silu=True):
    """XLA reference for parity tests: 6x6/s2 pad-2 conv (+bias, SiLU)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)
