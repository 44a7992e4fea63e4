"""Prototype: fused C3 block as ONE Pallas kernel (inference, folded BN).

The C3 block (cv12 1x1 -> n x Bottleneck(1x1,3x3,res) -> concat -> cv3 1x1)
is the HBM-traffic hot spot: XLA writes/reads every intermediate activation
to HBM, ~6-8 tensors per block. This kernel keeps the whole chain VMEM-
resident per image: read x once, write out once, weights stay on-chip.

3x3 convs are expressed as 9 shifted (HW, c_) @ (c_, c_) MXU matmuls over a
zero-padded VMEM scratch.

Usage: python tools/proto_c3_kernel.py [--interpret]
Compares vs a pure-JAX reference (conv_general_dilated) and times both at
the four yolov5s C3 shapes.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def silu(x):
    return x * jax.nn.sigmoid(x)


def _c3_kernel(x_ref, w12_ref, b12_ref, wb1_ref, bb1_ref, wb2_ref, bb2_ref,
               w3_ref, b3_ref, out_ref, tpad_ref, *, n, shortcut, H, W,
               c_, C2):
    f32 = jnp.float32
    xm = x_ref[0].reshape(H * W, x_ref.shape[-1])
    y = jnp.dot(xm, w12_ref[:], preferred_element_type=f32) + b12_ref[:]
    y = silu(y)
    y1 = y[:, :c_].astype(xm.dtype)
    y2 = y[:, c_:].astype(xm.dtype)

    tpad_ref[:] = jnp.zeros_like(tpad_ref)
    for i in range(n):
        t = jnp.dot(y1, wb1_ref[i], preferred_element_type=f32) + bb1_ref[i]
        t = silu(t).astype(xm.dtype)
        tpad_ref[1:H + 1, 1:W + 1, :] = t.reshape(H, W, c_)
        acc = bb2_ref[i].astype(f32) * jnp.ones((H * W, c_), f32)
        for dy in range(3):
            for dx in range(3):
                sl = tpad_ref[dy:dy + H, dx:dx + W, :].reshape(H * W, c_)
                acc = acc + jnp.dot(sl, wb2_ref[i, dy * 3 + dx],
                                    preferred_element_type=f32)
        t2 = silu(acc)
        if shortcut:
            y1 = (y1.astype(f32) + t2).astype(xm.dtype)
        else:
            y1 = t2.astype(xm.dtype)

    cat = jnp.concatenate([y1, y2], axis=-1)
    out = jnp.dot(cat, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
    out_ref[0] = silu(out).reshape(H, W, C2).astype(out_ref.dtype)


def c3_pallas(x, params, n, shortcut=True, interpret=False):
    B, H, W, C = x.shape
    c_ = params["wb1"].shape[-1]
    C2 = params["w3"].shape[-1]
    kernel = functools.partial(_c3_kernel, n=n, shortcut=shortcut, H=H, W=W,
                               c_=c_, C2=C2)
    full = lambda *s: pl.BlockSpec(s, lambda b: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(C, 2 * c_), full(2 * c_),
            full(n, c_, c_), full(n, c_),
            full(n, 9, c_, c_), full(n, c_),
            full(2 * c_, C2), full(C2),
        ],
        out_specs=pl.BlockSpec((1, H, W, C2), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C2), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, c_), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, params["w12"], params["b12"], params["wb1"], params["bb1"],
      params["wb2"], params["bb2"], params["w3"], params["b3"])


def c3_xla(x, params, n, shortcut=True):
    """Pure-JAX reference with the same folded-BN math."""
    c_ = params["wb1"].shape[-1]
    y = jnp.einsum("bhwc,cd->bhwd", x, params["w12"].astype(x.dtype)
                   ).astype(jnp.float32) + params["b12"]
    y = silu(y).astype(x.dtype)
    y1, y2 = y[..., :c_], y[..., c_:]
    for i in range(n):
        t = silu(jnp.einsum("bhwc,cd->bhwd", y1, params["wb1"][i].astype(
            x.dtype)).astype(jnp.float32) + params["bb1"][i]).astype(x.dtype)
        w3x3 = params["wb2"][i].reshape(3, 3, c_, c_).astype(x.dtype)
        conv = jax.lax.conv_general_dilated(
            t, w3x3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        t2 = silu(conv + params["bb2"][i])
        y1 = ((y1.astype(jnp.float32) + t2) if shortcut else t2
              ).astype(x.dtype)
    cat = jnp.concatenate([y1, y2], axis=-1)
    out = jnp.einsum("bhwc,cd->bhwd", cat, params["w3"].astype(x.dtype)
                     ).astype(jnp.float32) + params["b3"]
    return silu(out).astype(x.dtype)


def make_params(rng, C, c_, C2, n, dtype):
    r = lambda *s: jnp.asarray(rng.normal(0, 0.1, s), dtype)
    rf = lambda *s: jnp.asarray(rng.normal(0, 0.1, s), jnp.float32)
    return {
        "w12": r(C, 2 * c_), "b12": rf(2 * c_),
        "wb1": r(n, c_, c_), "bb1": rf(n, c_),
        "wb2": r(n, 9, c_, c_), "bb2": rf(n, c_),
        "w3": r(2 * c_, C2), "b3": rf(C2),
    }


def bench(fn, x, iters=16):
    xs = [x + jnp.float32(i).astype(x.dtype) * 0 + i for i in range(2)]

    @jax.jit
    def chain(x0):
        def body(c, _):
            r = fn(x0 + c * 0)
            return c + r.mean().astype(jnp.float32), None
        return jax.lax.scan(body, 0.0, None, length=iters)[0]

    float(chain(xs[0]))
    t0 = time.perf_counter()
    float(chain(xs[1]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    shapes = [  # (H, W, C, c_, C2, n, shortcut) — yolov5s_seg C3s at 640px
        ("P2", 160, 160, 64, 32, 64, 1, True),
        ("P3", 80, 80, 128, 64, 128, 2, True),
        ("P4", 40, 40, 256, 128, 256, 3, True),
        ("P5", 20, 20, 512, 256, 512, 1, True),
    ]
    B = 2 if args.interpret else args.batch
    for name, H, W, C, c_, C2, n, sc in shapes:
        params = make_params(rng, C, c_, C2, n, dtype)
        x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), dtype)
        ref = c3_xla(x, params, n, sc)
        got = c3_pallas(x, params, n, sc, interpret=args.interpret)
        err = jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        rel = float(err) / (float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
                            + 1e-9)
        line = f"{name}: max_abs_err={float(err):.4f} rel={rel:.4f}"
        if not args.interpret:
            t_x = bench(lambda v: c3_xla(v, params, n, sc), x)
            t_p = bench(lambda v: c3_pallas(v, params, n, sc), x)
            line += (f"  xla={t_x*1e3:.2f}ms pallas={t_p*1e3:.2f}ms "
                     f"speedup={t_x/t_p:.2f}x")
        print(line, flush=True)


if __name__ == "__main__":
    main()
