"""Space-to-depth-4 input layout for the phase stem (models/layers.py
PhaseStemA/B).

The permutation is host-side by design: on-device relayout measured SLOWER
than the standard stem it feeds (tools/probe_stem_s2d.py — base 8.74 ms,
s2d convs 6.87 ms, s2d convs + device relayout 9.88 ms at b128 640px). The
loader folds it into the native batch-assembly copy (native/fastops.cpp
assemble_batch_s2d4); these helpers cover the predictor / small-batch /
test paths.

Channel order is (pr, pc, ci): output channel (pr * 4 + pc) * C + ci holds
input pixel (4y + pr, 4x + pc, ci) — matching phase_stem_kernel_a.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth4(x):
    """jnp (B, H, W, C) -> (B, H/4, W/4, 16C). Device-side: use only where
    the input is already on device (e.g. tests); prefer the host variants."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)


def space_to_depth4_np(x: np.ndarray) -> np.ndarray:
    """numpy (..., H, W, C) -> (..., H/4, W/4, 16C), contiguous."""
    *lead, h, w, c = x.shape
    if h % 4 or w % 4:
        raise ValueError(f"s2d4 needs H, W divisible by 4, got {h}x{w}")
    x = x.reshape(*lead, h // 4, 4, w // 4, 4, c)
    n = len(lead)
    x = np.moveaxis(x, (n + 1, n + 3), (n + 2, n + 3))
    return np.ascontiguousarray(x).reshape(*lead, h // 4, w // 4, 16 * c)
