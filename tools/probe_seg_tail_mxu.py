"""Probe: seg-tail kernel MXU operand precision (f32 vs bf16).

The fused bilinear-8x+argmax kernel (ops/seg_pallas.py) runs its two
interpolation matmuls with f32 operands — 3.65 ms standalone at b128
(PERF.md), far above both its HBM floor (~60 MB moved) and its bf16 MXU
floor. bf16 operands with f32 accumulation run the MXU at full rate; the
argmax can flip only where the interpolated top-2 margin is below bf16
resolution. This probe times both and reports the flip rate on random
logits (the worst case — trained logits have real margins).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    def mk(key):
        return jax.random.normal(key, (ITERS, B, 80, 80, 3), jnp.bfloat16)

    red = lambda y: y.sum(dtype=jnp.int32).astype(jnp.float32)

    t32 = timed(lambda x: red(upsample_argmax(x, 8)), mk)
    print(f"f32  operands: {t32*1000:8.2f} ms", flush=True)
    tbf = timed(lambda x: red(upsample_argmax(x, 8, mxu_dtype=jnp.bfloat16)),
                mk)
    print(f"bf16 operands: {tbf*1000:8.2f} ms", flush=True)

    x = jax.random.normal(jax.random.PRNGKey(5), (8, 80, 80, 3), jnp.bfloat16)
    a = np.asarray(upsample_argmax(x, 8))
    b = np.asarray(upsample_argmax(x, 8, mxu_dtype=jnp.bfloat16))
    flips = float((a != b).mean())
    print(f"argmax flip rate (random logits): {flips:.2e}")


if __name__ == "__main__":
    main()
