"""Stem probe round 3: layout/precision knobs on the 6x6/s2 3->32 conv."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, S, CO, ITERS = 128, 640, 32, 8


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
    k = jax.random.PRNGKey(0)
    W = jax.random.normal(k, (6, 6, 3, CO), jnp.bfloat16) * 0.1
    Wn = jnp.transpose(W, (3, 2, 0, 1))  # OIHW

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, S, S, 3), jnp.bfloat16)

    def red(y):
        return y.sum(dtype=jnp.float32)

    def v_nhwc(x):
        return red(jax.lax.conv_general_dilated(
            x, W, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

    def v_nchw(x):
        xc = jnp.transpose(x, (0, 3, 1, 2))
        y = jax.lax.conv_general_dilated(
            xc, Wn, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return red(y)

    def v_pref32(x):
        return red(jax.lax.conv_general_dilated(
            x, W, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32))

    # NHWC but with H,W swapped into the batch: 1D conv over W only after
    # an explicit H-tap sum: y = sum_ky conv1d(x[:, ky::2? ...]) — 6 1D convs
    def v_six_1d(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = None
        for ky in range(6):
            xs = jax.lax.slice(xp, (0, ky, 0, 0), (B, ky + S - 1, S + 4, 3),
                               (1, 2, 1, 1))  # (B,320,644,3)
            w1 = W[ky:ky + 1]  # (1,6,3,CO)
            y = jax.lax.conv_general_dilated(
                xs, w1, (1, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            acc = y if acc is None else acc + y
        return red(acc)

    for name, f in (("nhwc(base)", v_nhwc), ("nchw", v_nchw),
                    ("pref_f32", v_pref32), ("six_1d_convs", v_six_1d)):
        try:
            t = timed(f, mk)
            print(f"{name:14s} {t*1e3:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
