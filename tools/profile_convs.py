"""Micro-profile the network's representative convs on the real TPU.

For each conv: analytic (unpadded) HBM bytes vs XLA cost_analysis bytes vs
achieved time -> effective GB/s and MXU%. Tells us whether small-C stages
pay lane padding and which blocks are worth Pallas effort.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 128
PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBS = 820.0


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def bench_conv(name, H, W, C, K, CO, stride=1, iters=32):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.05, (K, K, C, CO)), jnp.bfloat16)

    @jax.jit
    def chain(x0):
        def body(c, _):
            r = conv(x0 + c.astype(x0.dtype) * 0, w, stride)
            return c + r.mean().astype(jnp.float32), None
        return jax.lax.scan(body, 0.0, None, length=iters)[0]

    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    c = jax.jit(lambda v: conv(v, w, stride)).lower(x).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    float(chain(x))
    x2 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    t0 = time.perf_counter()
    float(chain(x2))
    dt = (time.perf_counter() - t0) / iters

    Ho, Wo = H // stride, W // stride
    analytic = (B * H * W * C + B * Ho * Wo * CO) * 2 + K * K * C * CO * 2
    flops = 2 * B * Ho * Wo * K * K * C * CO
    print(f"{name:22s} {dt*1e3:7.2f}ms  xla_bytes={c.get('bytes accessed',0)/1e9:6.2f}GB "
          f"analytic={analytic/1e9:6.2f}GB  eff_bw={analytic/dt/1e9:5.0f}GB/s "
          f"mxu={flops/dt/1e12/PEAK_TFLOPS*100:5.1f}%", flush=True)


def main():
    # (name, H, W, Cin, k, Cout, stride) — yolov5s_seg hot convs at 640
    cases = [
        ("stem 6x6/2 3->32", 640, 640, 3, 6, 32, 2),
        ("P1 3x3/2 32->64", 320, 320, 32, 3, 64, 2),
        ("P2 1x1 64->32", 160, 160, 64, 1, 32, 1),
        ("P2 3x3 32->32", 160, 160, 32, 3, 32, 1),
        ("P2->P3 3x3/2 64->128", 160, 160, 64, 3, 128, 2),
        ("P3 1x1 128->64", 80, 80, 128, 1, 64, 1),
        ("P3 3x3 64->64", 80, 80, 64, 3, 64, 1),
        ("P4 3x3 128->128", 40, 40, 128, 3, 128, 1),
        ("P5 3x3 256->256", 20, 20, 256, 3, 256, 1),
        ("head 1x1 256->128", 40, 40, 256, 1, 128, 1),
    ]
    for case in cases:
        bench_conv(*case)


if __name__ == "__main__":
    main()
