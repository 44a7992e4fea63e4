"""Probe: fp8(e4m3) activation STORAGE between conv blocks, bf16 compute.

Hypothesis (PERF.md "Open levers" #2): the eval forward is HBM-bound; int8
W8A8 failed because of requant epilogues + s32 conv outputs. fp8 storage has
neither problem — the cast is a pure convert that XLA can fuse into the
producing fusion's write and the consuming conv's read, so activation bytes
halve with zero extra passes IF the convert actually fuses.

Measures a depth-D ConvBnSiLU chain at the model's hot shapes in three modes:
  bf16   : baseline, activations stored bf16
  fp8    : silu output cast to float8_e4m3fn before the next conv reads it
  fp8w   : fp8 activations AND fp8-stored weights (read-side halving only)

Prints per-shape ms + cost_analysis bytes; the fp8/bf16 byte ratio reveals
whether the converts fused (≈0.55) or materialized copies (≈1.5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 128
DEPTH = 8
ITERS = 16
F8 = jnp.float8_e4m3fn


def block(x, w, scale, bias, store):
    """conv -> scale+bias (folded BN) -> silu -> cast to storage dtype."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * scale + bias
    y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
    return y.astype(store)


def bench(name, H, W, C, store, wdtype):
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), wdtype)
          for _ in range(DEPTH)]
    scale = jnp.asarray(rng.normal(1, 0.1, (C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)

    def body_fn(x):
        for w in ws:
            x = block(x, w, scale, bias, store)
        return x

    @jax.jit
    def chain(x0):
        def body(c, _):
            # keep the chain inside the loop (carry-dependent input)
            x = (x0.astype(jnp.bfloat16) + c.astype(jnp.bfloat16) * 0).astype(store)
            r = body_fn(x)
            return c + r.astype(jnp.float32).mean(), None
        return jax.lax.scan(body, 0.0, None, length=ITERS)[0]

    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), store)
    ca = chain.lower(x).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    gb = ca.get("bytes accessed", 0) / 1e9 / ITERS
    float(chain(x))
    x2 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), store)
    t0 = time.perf_counter()
    float(chain(x2))
    dt = (time.perf_counter() - t0) / ITERS
    flops = 2 * B * H * W * 9 * C * C * DEPTH
    print(f"{name:28s} {dt*1e3:7.2f}ms  bytes={gb:6.2f}GB "
          f"mxu={flops/dt/1e12/197.0*100:5.1f}%", flush=True)
    return dt


def main():
    import sys
    shapes = [(160, 160, 64), (80, 80, 128)]
    if "--full" in sys.argv:
        shapes += [(80, 80, 64), (40, 40, 256)]
    for (H, W, C) in shapes:
        t_bf = bench(f"bf16  {H}x{W}x{C}", H, W, C, jnp.bfloat16, jnp.bfloat16)
        t_f8 = bench(f"fp8   {H}x{W}x{C}", H, W, C, F8, jnp.bfloat16)
        t_f8w = bench(f"fp8w  {H}x{W}x{C}", H, W, C, F8, F8)
        print(f"  -> fp8 speedup {t_bf/t_f8:4.2f}x   fp8w {t_bf/t_f8w:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
