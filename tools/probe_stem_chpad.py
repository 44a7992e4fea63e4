"""Probe: is PhaseStemA's conv (3x3, 48->128 @160x160) losing to input-
channel padding?

Production attribution (profile_layers_prod.py) shows l0 at 7.7 ms for
363 GF dense = 24% MXU. Hypothesis: XLA pads the 48-channel input to a full
128-lane contraction (dense-equivalent 968 GF -> ~4.9 ms) plus overheads.
Variants (all bf16, b128):

  s2d4-48   (3,3,48,128)  on (160,160,48)   [production today]
  s2d4-64   (3,3,64,128)  on (160,160,64)   [host pads 48->64: sublane-mult]
  s2d4-128  (3,3,128,128) on (160,160,128)  [host pads 48->128: full lane]
  rows96    (2,3,96,128)  on (160,160,96)   [host doubles rows: k=2x3]
  s2d8      (2,2,192,512) on (80,80,192)    [deeper phase: K=768, 644 GF]

Only s2d4-* are exact rewrites of each other (zero channels); rows96/s2d8
timings are shape-proxies here (weight maps not derived — FLOP structure is
what's being measured).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("PROBE_B", "128"))
ITERS = 16


def timed(fn, mk, iters=ITERS):
    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda a: jax.lax.scan(
        lambda c, x: (c + fn(x), None), 0.0, a)[0])
    float(jitted(warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def conv(x, w, pad=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run(name, hw, cin, kr, kc, cout, pad=((1, 1), (1, 1))):
    w = jax.random.normal(jax.random.PRNGKey(0), (kr, kc, cin, cout),
                          jnp.bfloat16) * 0.1

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, hw, hw, cin), jnp.bfloat16)

    t = timed(lambda x: jax.nn.silu(conv(x, w, pad)).sum(dtype=jnp.float32),
              mk)
    gf = 2 * B * hw * hw * cout * kr * kc * cin / 1e9
    print(f"{name:10s} {t*1000:8.2f} ms  dense {gf:6.0f} GF "
          f"-> {gf/t/1e3:6.1f} TFLOP/s", flush=True)


def main():
    run("s2d4-48", 160, 48, 3, 3, 128)
    run("s2d4-64", 160, 64, 3, 3, 128)
    run("s2d4-128", 160, 128, 3, 3, 128)
    run("rows96", 160, 96, 2, 3, 128, pad=((1, 0), (1, 1)))
    run("s2d8", 80, 192, 2, 2, 512, pad=((1, 0), (1, 0)))


if __name__ == "__main__":
    main()
