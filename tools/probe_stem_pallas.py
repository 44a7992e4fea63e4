"""Correctness + timing of the Pallas stem kernel vs XLA conv (b128 640px)."""

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
    from desenet_tpu.ops.stem_pallas import (
        stem_conv, stem_conv_reference, stem_weight_matrix)

    k = jax.random.PRNGKey(0)
    W = jax.random.normal(k, (6, 6, 3, CO), jnp.bfloat16) * 0.3
    bias = jax.random.normal(jax.random.PRNGKey(1), (CO,), jnp.float32) * 0.1
    wm = stem_weight_matrix(W)

    # correctness on a small case
    xs = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3),
                            jnp.bfloat16)
    ref = stem_conv_reference(xs, W, bias)
    got = stem_conv(xs, wm, bias, block_rows=16)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    rel = err / max(float(jnp.max(jnp.abs(ref.astype(jnp.float32)))), 1e-9)
    print(f"small parity: max abs {err:.3e} rel {rel:.3e}", flush=True)

    xb = jax.random.uniform(jax.random.PRNGKey(3), (4, S, S, 3),
                            jnp.bfloat16)
    ref = stem_conv_reference(xb, W, bias)
    got = stem_conv(xb, wm, bias)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"640px parity: max abs {err:.3e}", flush=True)

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, S, S, 3), jnp.bfloat16)

    def red(y):
        return y.sum(dtype=jnp.float32)

    def v_xla(x):
        return red(stem_conv_reference(x, W, bias))

    def v_pallas(x):
        return red(stem_conv(x, wm, bias))

    for name, f in (("xla_conv_silu", v_xla), ("pallas_stem", v_pallas)):
        t = timed(f, mk)
        print(f"{name:16s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
