"""Per-layer attribution of the eval forward via prefix ablation.

Times model prefixes (DeSeNet.__call__ up_to=k, one jit per k) and diffs
consecutive prefixes to attribute ms / HBM GB per layer. Fusion can bleed
work across a boundary, so treat deltas as approximations; the totals and
the ranking are what matter. Eval forward runs at only ~0.58 TB/s vs the
grad program's 0.66 (PERF.md) — this finds where the bandwidth is lost.

Usage: python tools/profile_layers.py [batch] [> report]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 640
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 4


def reduce_out(o):
    if isinstance(o, (list, tuple)):
        return sum(reduce_out(v) for v in o)
    if hasattr(o, "data") and hasattr(o, "scale"):  # QTensor
        o = o.data
    return o.sum(dtype=jnp.float32)


def timed(fn, mk, iters=ITERS):
    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda a: jax.lax.scan(
        lambda c, x: (c + fn(x), None), 0.0, a)[0])
    float(jitted(warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def cost(fn, z):
    c = jax.jit(fn).lower(z).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (c.get("flops", 0.0) / 1e9, c.get("bytes accessed", 0.0) / 1e9)


def main():
    from desenet_tpu.models import build_model, config_path, init_model

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)

    def mk(key):
        return jax.random.uniform(key, (ITERS, B, SIZE, SIZE, 3),
                                  jnp.bfloat16)

    z = jnp.zeros((B, SIZE, SIZE, 3), jnp.bfloat16)
    prev_ms = prev_gf = prev_gb = 0.0
    print(f"{'layer':24s} {'cum_ms':>8s} {'d_ms':>7s} {'d_GF':>8s} "
          f"{'d_GB':>7s} {'TB/s':>6s}", flush=True)
    rows = []
    for ls in spec.layers:
        k = ls.i

        def fk(x, k=k):
            return reduce_out(model.apply(variables, x, train=False,
                                          up_to=k))

        t = timed(fk, mk) * 1e3
        gf, gb = cost(fk, z)
        d_ms, d_gf, d_gb = t - prev_ms, gf - prev_gf, gb - prev_gb
        bw = d_gb / d_ms if d_ms > 0.05 else float("nan")
        name = f"l{k}:{ls.name}"
        print(f"{name:24s} {t:8.2f} {d_ms:7.2f} {d_gf:8.1f} {d_gb:7.2f} "
              f"{bw:6.2f}", flush=True)
        rows.append((name, t, d_ms, d_gf, d_gb))
        prev_ms, prev_gf, prev_gb = t, gf, gb

    # full program (decode + seg tail) for reference
    def full(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        return dec.sum(dtype=jnp.float32) + reduce_out(seg)

    t = timed(full, mk) * 1e3
    gf, gb = cost(full, z)
    print(f"{'FULL (decode+seg)':24s} {t:8.2f} {'':7s} {gf:8.1f} {gb:7.2f}",
          flush=True)
    print("\nworst layers by d_ms:")
    for name, t, d_ms, d_gf, d_gb in sorted(rows, key=lambda r: -r[2])[:8]:
        print(f"  {name:22s} {d_ms:7.2f} ms  {d_gf:7.1f} GF {d_gb:6.2f} GB",
              flush=True)


if __name__ == "__main__":
    main()
