"""Probe: narrow channel-concat alternatives at real C3 shapes.

PERF.md "HLO-level findings": this libtpu decomposes channel `concatenate`
into pad+maximum chains that materialize full-size zero-padded tensors per
operand. Wide concats (every part >=128ch) are already rewritten as implicit
split-convs (layers.py maybe_cat / SPLIT_CONV_MIN_PART); the NARROW cats —
C3's internal cat at 64/128 total channels on large maps (l2: 32+32 @160x160,
l4: 64+64 @80x80, neck C3s) — still materialize, and split-conv loses there
(K<128 starves the MXU contraction; measured 2684->2295 full-split).

This probe measures a third formulation at those exact shapes:
**zero-padded producers**: cv1/cv2 emit the full cat width directly (their
kernels zero-extended along Cout), so cat(a,b) == a' + b' — one add that can
fuse into cv3's input, no pad+maximum, no narrow-K matmuls (the producer
convs keep their full contraction depth; they waste Cout lanes instead,
which is free when the conv is HBM-bound).

Variants per shape (chain harness, ITERS scans, one host sync):
  cat    cv1, cv2 -> jnp.concatenate -> cv3(1x1)        [production today]
  split  cv1, cv2 -> [a, b] implicit -> split cv3       [narrow-K loser]
  zpad   cv1', cv2' (zero-extended) -> add -> cv3(1x1)  [candidate]
Exactness of zpad vs cat is asserted before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PROBE_B", "128"))
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


def conv(x, w, s=1):
    p = (w.shape[0] // 2,) * 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), (p, p), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run_shape(hw, cin, c_):
    """C3-like tail: x -> cv1(1x1,c_), cv2(1x1,c_) -> cat -> cv3(1x1,2c_)."""
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    w1 = jax.random.normal(k[0], (1, 1, cin, c_), jnp.bfloat16) * 0.1
    w2 = jax.random.normal(k[1], (1, 1, cin, c_), jnp.bfloat16) * 0.1
    w3 = jax.random.normal(k[2], (1, 1, 2 * c_, 2 * c_), jnp.bfloat16) * 0.1

    # zero-extended producer kernels: cv1' fills [0:c_], cv2' fills [c_:2c_]
    z = jnp.zeros((1, 1, cin, c_), jnp.bfloat16)
    w1z = jnp.concatenate([w1, z], axis=-1)
    w2z = jnp.concatenate([z, w2], axis=-1)

    def v_cat(x):
        a, b = jax.nn.silu(conv(x, w1)), jax.nn.silu(conv(x, w2))
        return conv(jnp.concatenate([a, b], -1), w3)

    def v_split(x):
        a, b = jax.nn.silu(conv(x, w1)), jax.nn.silu(conv(x, w2))
        return conv(a, w3[:, :, :c_]) + conv(b, w3[:, :, c_:])

    def v_zpad(x):
        # silu(0)=0, so the zero lanes stay zero through the activation and
        # the add reproduces the concat exactly
        a = jax.nn.silu(conv(x, w1z))
        b = jax.nn.silu(conv(x, w2z))
        return conv(a + b, w3)

    xs = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, cin),
                            jnp.bfloat16)
    ref = np.asarray(v_cat(xs), np.float32)
    scale = np.abs(ref).max()
    for name, f in (("split", v_split), ("zpad", v_zpad)):
        got = np.asarray(f(xs), np.float32)
        # bf16 re-association noise scales with the summands, not the
        # (possibly cancelled-to-zero) result — tolerance vs the map's scale
        err = np.max(np.abs(ref - got)) / scale
        assert err < 2e-2, (name, err)

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, hw, hw, cin), jnp.bfloat16)

    red = lambda y: y.sum(dtype=jnp.float32)
    print(f"--- {hw}x{hw} cin={cin} c_={c_} (cat width {2*c_}) b{B}")
    for name, f in (("cat", v_cat), ("split", v_split), ("zpad", v_zpad)):
        t = timed(lambda x, f=f: red(f(x)), mk)
        print(f"  {name:6s} {t*1000:8.2f} ms", flush=True)


def main():
    # l2-equivalent: 160x160, C3(64): cv1/cv2 out 32, cat 64
    run_shape(160, 64, 32)
    # l4-equivalent: 80x80, C3(128): cat 128
    run_shape(80, 128, 64)
    # neck l17-equivalent: 80x80, C3(128) after cat-256 input
    run_shape(80, 256, 64)


if __name__ == "__main__":
    main()
