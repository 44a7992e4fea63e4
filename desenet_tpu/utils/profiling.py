"""Profiling & model-info utilities.

Reference equivalents (core/utils/torch_utils.py): time_sync (:81-85) ->
block_until_ready timing; profile op benchmark (:88-138) -> profile_fn;
model_info param/FLOP banner (:219-240) -> model_info via XLA cost analysis;
Profile context (general.py:47-53). Per-layer timing (`Model.forward
(profile=True)`, yolo.py:375-386) is replaced by `jax.profiler` traces —
layer boundaries don't survive XLA fusion, so a per-module wall-clock table
would measure a graph that never runs; `trace()` captures the real one.

BN-fold (fuse_conv_and_bn, torch_utils.py:196-216) note: on XLA the
inference-mode BN affine folds into the conv epilogue automatically, so
there is no runtime fuse() step; `fold_conv_bn` computes folded weights for
exporting to eager frameworks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Profile(contextlib.ContextDecorator):
    """`with Profile():` or @Profile() wall-clock timing (general.py:47-53),
    with device sync."""

    def __init__(self, name: str = ""):
        self.name = name
        self.t = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.t = time.perf_counter() - self.start
        print(f"{self.name or 'profile'}: {self.t:.4f}s")
        return False


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Steady-state seconds/call with full device sync (time_sync analog)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def profile_fn(fn: Callable, *args, iters: int = 10,
               with_grad: bool = False) -> Dict[str, float]:
    """Forward (and optional backward) timing + FLOP estimate for an op —
    reference `profile` (torch_utils.py:88-138)."""
    jfn = jax.jit(fn)
    fwd = time_fn(jfn, *args, iters=iters)
    out = {"forward_ms": fwd * 1e3, "gflops": flops_estimate(fn, *args) / 1e9}
    if with_grad:
        def scalar(*a):
            return jnp.sum(jnp.asarray(fn(*a)).astype(jnp.float32))
        g = jax.jit(jax.grad(scalar))
        out["backward_ms"] = time_fn(g, *args, iters=iters) * 1e3
    return out


def flops_estimate(fn: Callable, *args) -> float:
    """FLOPs from XLA's cost analysis of the lowered computation."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def model_info(model, variables, img_size: int = 640) -> Dict[str, float]:
    """Param count + forward GFLOPs banner (torch_utils.py:219-240)."""
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree.leaves(variables["params"]))
    x = jnp.zeros((1, img_size, img_size, model.spec.ch_in), model.dtype)
    gflops = flops_estimate(
        lambda v, xx: model.apply(v, xx, train=False), variables, x
    ) / 1e9
    print(f"model: {n_params / 1e6:.2f}M params, {gflops:.1f} GFLOPs "
          f"@ {img_size}px")
    return {"params": n_params, "gflops": gflops}


def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context — view with tensorboard/xprof."""
    return jax.profiler.trace(log_dir)


def fold_conv_bn(
    kernel: np.ndarray, bias, gamma, beta, mean, var, eps: float = 1e-3
) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic BN fold into a conv (torch_utils.py:196-216). kernel HWIO;
    returns (kernel', bias')."""
    scale = gamma / np.sqrt(var + eps)
    k = kernel * scale.reshape(1, 1, 1, -1)
    b = (bias if bias is not None else 0.0) * scale + beta - mean * scale
    return k, b


def sparsity(params) -> float:
    """Global fraction of zero weights (torch_utils.py:176-180)."""
    total = zeros = 0
    for x in jax.tree.leaves(params):
        x = np.asarray(x)
        total += x.size
        zeros += int((x == 0).sum())
    return zeros / max(total, 1)


def prune(params, amount: float = 0.3):
    """Global L1 unstructured pruning of conv kernels
    (torch_utils.py:183-193): zero the `amount` fraction of smallest-|w|
    entries per kernel."""
    def prune_leaf(path, x):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if names[-1] != "kernel":
            return x
        x = np.asarray(x)
        k = int(x.size * amount)
        if k == 0:
            return x
        thresh = np.partition(np.abs(x).ravel(), k)[k]
        return np.where(np.abs(x) < thresh, 0.0, x).astype(x.dtype)

    return jax.tree_util.tree_map_with_path(prune_leaf, params)
