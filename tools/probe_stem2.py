"""Stem epilogue probe: is the extra ~3.8 ms of l0 (11.38 in-program vs
7.62 isolated conv) the unfolded BN+SiLU epilogue?

Variants at b128 640px (6x6/s2 conv 3->32):
  conv            bare conv (baseline 7.62 ms)
  conv_bn_silu    conv -> running-stat BN (f32 params) -> SiLU, as eval does
  folded_silu     BN pre-folded into weights+bias -> SiLU
  conv_bn_silu_f32conv  same as conv_bn_silu but f32 conv input/weights
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 128
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
    k = jax.random.PRNGKey(0)
    W = jax.random.normal(k, (6, 6, 3, CO), jnp.bfloat16) * 0.1
    scale = jax.random.uniform(k, (CO,), jnp.float32, 0.5, 1.5)
    bias = jax.random.uniform(k, (CO,), jnp.float32, -0.5, 0.5)
    mean = jax.random.uniform(k, (CO,), jnp.float32, -0.5, 0.5)
    var = jax.random.uniform(k, (CO,), jnp.float32, 0.5, 1.5)

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, S, S, 3), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def red(y):
        return y.sum(dtype=jnp.float32)

    def v_conv(x):
        return red(conv(x, W))

    def v_bn_silu(x):
        y = conv(x, W)
        yn = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-3)
        yn = (yn * scale + bias).astype(jnp.bfloat16)
        return red(jax.nn.silu(yn))

    g = (scale * jax.lax.rsqrt(var + 1e-3))
    Wf = (W.astype(jnp.float32) * g).astype(jnp.bfloat16)
    bf = (bias - mean * g).astype(jnp.bfloat16)

    def v_folded(x):
        y = conv(x, Wf) + bf
        return red(jax.nn.silu(y))

    W32 = W.astype(jnp.float32)

    def v_bn_silu_f32(x):
        y = conv(x.astype(jnp.float32), W32)
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-3)
        yn = yn * scale + bias
        return red(jax.nn.silu(yn).astype(jnp.bfloat16))

    for name, f in (("conv", v_conv), ("conv_bn_silu", v_bn_silu),
                    ("folded_silu", v_folded),
                    ("conv_bn_silu_f32conv", v_bn_silu_f32)):
        t = timed(f, mk)
        print(f"{name:22s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
