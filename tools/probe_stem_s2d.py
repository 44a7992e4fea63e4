"""Probe: phase-layout (space-to-depth-4) stem reformulation.

The FusedFocus stem (6x6/s2 conv on 3 input channels) runs at ~6% MXU —
cin=3 starves the 128-deep contraction and XLA pads ~10x useful work
(PERF.md "l0:FusedFocus"). Every *device-side* relayout alternative measured
worse (tools/probe_stem{,2,3}.py, ops/stem_pallas.py).

This probe tests the one reformulation that moves the relayout OFF the
device: the host loader delivers images in space-to-depth-4 layout
(160,160,48) — a fixed per-image permutation that costs ~nothing in the
CPU workers — and the first TWO layers become MXU-deep convs at the 160
grid, never materializing the 320x320x32 l0 output at all:

  l0': 3x3/s1 conv (pr,pc,ch)=48 -> (qy,qx,co)=128, pad 1   [exact rewrite of l0]
  l1': 2x2/s1 conv 128 -> 64, pad (1,0)x(1,0)               [exact rewrite of l1 3x3/s2]

Weight maps (derivation in comments below):
  W3[dr, dc, (pr,pc,ci), (qy,qx,co)] = W6[4dr+pr-2qy+2, 4dc+pc-2qx+2, ci, co]
  W2[er, ec, (qy,qx,ci), co]        = W1[2er+qy+1, 2ec+qx+1, ci, co]
(out of range -> 0)

Variants at b128 640px (l0+l1 chain, bf16):
  base      x(640,640,3) -> conv6x6/s2 (3->32) -> conv3x3/s2 (32->64)
  s2d4      x4(160,160,48) -> conv3x3 (48->128) -> conv2x2 (128->64)
Both end at (160,160,64); s2d4 is verified exact vs base before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PROBE_B", "128"))
S = 640
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


def conv(x, w, s, pad):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d4_weights(W6, W1):
    """Exact phase-layout rewrites of (W6: 6x6x3x32 s2 p2) and
    (W1: 3x3x32x64 s2 p1)."""
    co = W6.shape[-1]
    ci = W6.shape[-2]
    co1 = W1.shape[-1]
    W6 = np.asarray(W6, np.float32)
    W1 = np.asarray(W1, np.float32)
    # l0': (3,3, 4*4*ci, 2*2*co); in-ch order (pr,pc,ci), out-ch order (qy,qx,co)
    W3 = np.zeros((3, 3, 16 * ci, 4 * co), np.float32)
    for dr in range(-1, 2):
        for dc in range(-1, 2):
            for pr in range(4):
                for pc in range(4):
                    for qy in range(2):
                        for qx in range(2):
                            kr = 4 * dr + pr - 2 * qy + 2
                            kc = 4 * dc + pc - 2 * qx + 2
                            if 0 <= kr < 6 and 0 <= kc < 6:
                                W3[dr + 1, dc + 1,
                                   (pr * 4 + pc) * ci:(pr * 4 + pc + 1) * ci,
                                   (qy * 2 + qx) * co:(qy * 2 + qx + 1) * co] \
                                    = W6[kr, kc]
    # l1': (2,2, 2*2*co, co1); in-ch order (qy,qx,co); offsets er,ec in {-1,0}
    W2 = np.zeros((2, 2, 4 * co, co1), np.float32)
    for er in range(-1, 1):
        for ec in range(-1, 1):
            for qy in range(2):
                for qx in range(2):
                    kr = 2 * er + qy + 1
                    kc = 2 * ec + qx + 1
                    if 0 <= kr < 3 and 0 <= kc < 3:
                        W2[er + 1, ec + 1,
                           (qy * 2 + qx) * co:(qy * 2 + qx + 1) * co] = W1[kr, kc]
    return jnp.asarray(W3, jnp.bfloat16), jnp.asarray(W2, jnp.bfloat16)


def s2d4(x):
    """(B,H,W,C) -> (B,H/4,W/4,16C), channel order (pr,pc,ci)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)


def main():
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    W6 = jax.random.normal(k0, (6, 6, 3, 32), jnp.bfloat16) * 0.1
    W1 = jax.random.normal(k1, (3, 3, 32, 64), jnp.bfloat16) * 0.1
    W3, W2 = s2d4_weights(W6, W1)

    def base(x):
        y = conv(x, W6, 2, ((2, 2), (2, 2)))
        z = conv(jax.nn.silu(y), W1, 2, ((1, 1), (1, 1)))
        return jax.nn.silu(z)

    def phase(x4):
        y4 = conv(x4, W3, 1, ((1, 1), (1, 1)))
        # silu applies per 320-pixel = per phase channel: exact
        z = conv(jax.nn.silu(y4), W2, 1, ((1, 0), (1, 0)))
        return jax.nn.silu(z)

    # --- exactness check (small) ---
    xs = jax.random.uniform(k2, (2, 64, 64, 3), jnp.bfloat16)
    a = np.asarray(base(xs), np.float32)
    b = np.asarray(phase(s2d4(xs)), np.float32)
    err = np.max(np.abs(a - b) / (np.abs(a) + 1e-3))
    print(f"exactness: shapes {a.shape} vs {b.shape}, max rel err {err:.2e}",
          flush=True)
    assert a.shape == b.shape and err < 2e-2  # bf16 re-association noise

    def red(y):
        return y.sum(dtype=jnp.float32)

    def mk_base(key):
        return jax.random.uniform(key, (ITERS, B, S, S, 3), jnp.bfloat16)

    def mk_phase(key):
        return jax.random.uniform(key, (ITERS, B, S // 4, S // 4, 48),
                                  jnp.bfloat16)

    t = timed(lambda x: red(base(x)), mk_base)
    print(f"base  (conv6 s2 + conv3 s2):  {t*1000:8.2f} ms", flush=True)
    t = timed(lambda x: red(phase(x)), mk_phase)
    print(f"s2d4  (conv3 48->128 + conv2): {t*1000:8.2f} ms", flush=True)
    # device-side relayout variant, for reference (expected to lose)
    t = timed(lambda x: red(phase(s2d4(x))), mk_base)
    print(f"s2d4 + on-device relayout:    {t*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
