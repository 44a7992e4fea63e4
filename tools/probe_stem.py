"""Stem (FusedFocus 6x6/s2 conv, 3->32ch) micro-benchmark.

Per-layer ablation (tools/profile_layers.py) shows the stem at 11.4 ms of
the 44.6 ms b128 inference program — 0.10 TB/s effective, 8.3 TFLOP/s — the
single worst layer. C_in=3 starves the MXU contraction. Variants:

  conv6x6      baseline lax.conv 6x6/s2 on 3ch
  conv6x6_c4   zero-pad input to 4ch (sublane alignment)
  conv6x6_c8   zero-pad input to 8ch
  s2d_conv3x3  space-to-depth reshape/transpose -> 3x3 conv on 12ch
  s2d_c16      space-to-depth -> pad to 16ch -> 3x3 conv
  im2col_dot   XLA im2col (patch extraction) -> single (N*HW, 108)@(108, 32)
  feature_g    conv_general dimension trick: batch-group / im2col via
               conv with identity? (skipped)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S = 640
CO = 32
ITERS = 8


def timed(fn, mk, iters=ITERS):
    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda a: jax.lax.scan(
        lambda c, x: (c + fn(x), None), 0.0, a)[0])
    float(jitted(warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def main():
    kkey = jax.random.PRNGKey(0)
    W = jax.random.normal(kkey, (6, 6, 3, CO), jnp.bfloat16) * 0.1

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, S, S, 3), jnp.bfloat16)

    def red(y):
        return y.sum(dtype=jnp.float32)

    def conv(x, w, pad, stride=2):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def v_base(x):
        return red(conv(x, W, ((2, 2), (2, 2))))

    W4 = jnp.zeros((6, 6, 4, CO), jnp.bfloat16).at[:, :, :3].set(W)
    def v_c4(x):
        x4 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
        return red(conv(x4, W4, ((2, 2), (2, 2))))

    W8 = jnp.zeros((6, 6, 8, CO), jnp.bfloat16).at[:, :, :3].set(W)
    def v_c8(x):
        x8 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        return red(conv(x8, W8, ((2, 2), (2, 2))))

    # space-to-depth: (B,640,640,3) -> (B,320,320,12); then the 6x6/s2 conv
    # becomes a 3x3/s1 conv over the s2d layout (Focus equivalence)
    def s2d(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // 2, w // 2, 4 * c)

    # NOTE: the exact 6x6->3x3x12 tap mapping is fiddly; for a TIMING probe
    # numerics don't matter — use random 3x3x12 weights of the right shape.
    W12 = jax.random.normal(kkey, (3, 3, 12, CO), jnp.bfloat16) * 0.1

    def v_s2d(x):
        y = s2d(x)
        return red(conv(y, W12, ((1, 1), (1, 1)), stride=1))

    W16 = jnp.zeros((3, 3, 16, CO), jnp.bfloat16).at[:, :, :12].set(W12)
    def v_s2d16(x):
        y = s2d(x)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 4)))
        return red(conv(y, W16, ((1, 1), (1, 1)), stride=1))

    # im2col + one big dot: patches (B*320*320, 108) @ (108, CO)
    Wm = W.reshape(108, CO)

    def v_im2col(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        cols = []
        for ky in range(6):
            for kx in range(6):
                cols.append(jax.lax.slice(
                    xp, (0, ky, kx, 0), (B, ky + S - 1, kx + S - 1, 3),
                    (1, 2, 2, 1)))
        p = jnp.concatenate(cols, axis=-1)  # (B,320,320,108)
        y = p.reshape(-1, 108) @ Wm
        return red(y)

    for name, f in (("conv6x6", v_base), ("conv6x6_c4", v_c4),
                    ("conv6x6_c8", v_c8), ("s2d_conv3x3", v_s2d),
                    ("s2d_c16", v_s2d16), ("im2col_dot", v_im2col)):
        try:
            t = timed(f, mk)
            print(f"{name:14s} {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
