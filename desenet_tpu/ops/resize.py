"""Resize / pooling primitives with exact PyTorch semantics, TPU-first.

Design: interpolation and adaptive pooling are expressed as *separable dense
matrix contractions* (one (H_out, H_in) matrix per axis, built at trace time
with numpy, closed over as constants). On TPU this maps onto the MXU instead
of gather chains, and gives bit-exact control of the boundary semantics:

- ``align_corners=True`` bilinear (PyramidPooling + seg-head upsample parity,
  reference common.py:610-613, yolo.py:212-216, 227-230)
- ``align_corners=False`` bilinear (val.py:47 logits resize)
- ``nearest`` with floor(i * in/out) source indexing (torch F.interpolate
  default / nn.Upsample(mode='nearest'), reference ASPP/RFB2 global branches)
- torch ``AdaptiveAvgPool2d`` integer-boundary windows (floor/ceil), used by
  PyramidPooling k=[1,2,3,6] and every channel-attention global pool.

All image ops take NHWC arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic 1-D linear interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
            src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _nearest_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) one-hot matrix for torch 'nearest' (floor) indexing."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    idx = np.minimum((np.arange(n_out) * n_in // n_out), n_in - 1)
    m[np.arange(n_out), idx] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) averaging matrix with torch AdaptiveAvgPool boundaries:
    window i covers [floor(i*n_in/n_out), ceil((i+1)*n_in/n_out))."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """Contract NHWC x with per-axis (out,in) matrices.

    Precision rule: fp32 inputs use HIGHEST (full-fp32 MXU passes) — the
    parity gates (mIoU within 1%, golden tests at 2e-5) are sensitive to
    resample error and TPU default fp32 matmul is bf16-grade. bf16 inputs
    keep DEFAULT precision: the data has ~3 decimal digits anyway and the
    fp32 passes would triple the pass count on the production path.
    """
    dt = x.dtype
    if dt == jnp.bfloat16 or dt in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # fp8 = STORAGE dtype of a bf16-compute model (layers.act_store_scope)
        # — resample on the bf16 fast path, not the fp32 parity path
        prec = jax.lax.Precision.DEFAULT
        cdt = jnp.bfloat16
    else:
        prec = jax.lax.Precision.HIGHEST
        cdt = jnp.float32
    a = jnp.asarray(mh, dtype=cdt)
    b = jnp.asarray(mw, dtype=cdt)
    y = jnp.einsum("oh,nhwc->nowc", a, x.astype(cdt), precision=prec)
    y = jnp.einsum("pw,nhwc->nhpc", b, y, precision=prec)
    return y.astype(dt)


def resize_bilinear(x: jax.Array, out_hw, align_corners: bool = False) -> jax.Array:
    """Bilinear resize of NHWC x to (H_out, W_out) with exact torch semantics."""
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _apply_separable(
        x,
        _linear_matrix(h_in, h_out, align_corners),
        _linear_matrix(w_in, w_out, align_corners),
    )


def resize_nearest(x: jax.Array, out_hw) -> jax.Array:
    """Nearest resize of NHWC x with torch floor-index semantics."""
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    if h_out % h_in == 0 and w_out % w_in == 0:
        # per-axis integer factors (they differ on non-square rect shapes)
        sy, sx = h_out // h_in, w_out // w_in
        y = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (n, h_in, sy, w_in, sx, c))
        return y.reshape(n, h_out, w_out, c)
    hi = np.minimum(np.arange(h_out) * h_in // h_out, h_in - 1)
    wi = np.minimum(np.arange(w_out) * w_in // w_out, w_in - 1)
    return x[:, hi][:, :, wi]


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Integer-factor nearest upsample (the PANet neck 2x, yolov5s_seg.yaml:31,36)."""
    if scale == 1:
        return x
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def adaptive_avg_pool(x: jax.Array, out_hw) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d on NHWC input (exact window boundaries)."""
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    _, h_in, w_in, _ = x.shape
    if h_out == 1 and w_out == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32).astype(x.dtype)
    return _apply_separable(
        x, _adaptive_pool_matrix(h_in, h_out), _adaptive_pool_matrix(w_in, w_out)
    )


def _neg_inf(dtype):
    return (-jnp.inf if jnp.issubdtype(dtype, jnp.floating)
            else np.asarray(jnp.iinfo(dtype).min, dtype)[()])


def _max_pool_1d(x: jax.Array, k: int, axis: int) -> jax.Array:
    dims, pads = [1, 1, 1, 1], [(0, 0)] * 4
    dims[axis] = k
    pads[axis] = (k // 2, k // 2)
    return jax.lax.reduce_window(
        x, _neg_inf(x.dtype), jax.lax.max,
        window_dimensions=tuple(dims), window_strides=(1, 1, 1, 1),
        padding=pads,
    )


def _shift(x, d: int, axis: int, fill):
    """x_{i+d} at position i; out-of-range positions take `fill`."""
    if d == 0:
        return x
    n = x.shape[axis]
    if abs(d) >= n:
        return jnp.full_like(x, fill)
    pads = [(0, 0, 0)] * x.ndim
    if d > 0:
        x = jax.lax.slice_in_dim(x, d, n, axis=axis)
        pads[axis] = (0, d, 0)
    else:
        x = jax.lax.slice_in_dim(x, 0, n + d, axis=axis)
        pads[axis] = (-d, 0, 0)
    return jax.lax.pad(x, jnp.asarray(fill, x.dtype), pads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_1d_vjp(x, k: int, axis: int):
    return _max_pool_1d(x, k, axis)


def _mp1_fwd(x, k, axis):
    y = _max_pool_1d(x, k, axis)
    return y, (x, y)


def _mp1_bwd(k, axis, res, g):
    # Mask-based max-pool backward: dx_i = sum_{|d|<=k//2} [x_i == y_{i+d}]
    # * g_{i+d}. Replaces XLA's select_and_scatter VJP, which (a) GSPMD
    # miscompiles under spatial sharding (measured: rel grad error ~1.0 at
    # H=40/k=5 on an H-sharded mesh) and (b) lowers notoriously slowly on
    # TPU. Semantics delta: a window with several exactly-tied maxima routes
    # gradient to every tied element (select_and_scatter picks one) —
    # measure-zero on float activations.
    x, y = res
    r = k // 2
    dx = jnp.zeros_like(g)
    for d in range(-r, r + 1):
        y_sh = _shift(y, d, axis, _neg_inf(y.dtype))
        g_sh = _shift(g, d, axis, 0) if d else g
        dx = dx + jnp.where(x == y_sh, g_sh, jnp.zeros_like(g_sh))
    return (dx,)


_max_pool_1d_vjp.defvjp(_mp1_fwd, _mp1_bwd)


def max_pool_same(x: jax.Array, k: int) -> jax.Array:
    """MaxPool2d(kernel=k, stride=1, padding=k//2) on NHWC — the SPP pools
    (reference common.py:179). -inf padding == torch behavior for stride 1,
    pad k//2 (window always overlaps valid data).

    Computed separably (max over H, then W — identical for square stride-1
    windows) with a custom shifted-compare VJP; see _mp1_bwd for why."""
    return _max_pool_1d_vjp(_max_pool_1d_vjp(x, k, 1), k, 2)
