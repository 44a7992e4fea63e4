"""Per-layer attribution of the PRODUCTION bench program (stem_s2d=True,
seg_upsample=False + fused Pallas tail + fused NMS) via prefix ablation.

Same methodology as profile_layers.py (prefix diffs cancel the fixed tunnel
round-trip); inputs are the host-s2d4 layout the bench uses. Run alone on
the chip — a concurrent process corrupts timings (PERF.md env note).

Usage: python tools/profile_layers_prod.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 640
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 8
CFG = os.environ.get("PROFILE_CFG", "yolov5s_seg")  # family attribution


def reduce_out(o):
    if isinstance(o, (list, tuple)):
        return sum(reduce_out(v) for v in o)
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
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    model, spec = build_model(config_path(CFG), dtype=jnp.bfloat16,
                              seg_upsample=False, stem_s2d=True)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)

    def mk(key):
        return jax.random.uniform(
            key, (ITERS, B, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)

    z = jnp.zeros((B, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)
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

    # production tail increments: +decode, +NMS, +seg tail
    def fwd(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        return dec.sum(dtype=jnp.float32) + reduce_out(seg)

    def fwd_nms(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        return (nms.boxes.sum() + nms.scores.sum()
                + nms.num.sum().astype(jnp.float32) + reduce_out(seg))

    def full(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        return (nms.boxes.sum() + nms.scores.sum()
                + nms.num.sum().astype(jnp.float32)
                + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32))

    for name, f in (("fwd+decode", fwd), ("+NMS", fwd_nms),
                    ("FULL (+seg tail)", full)):
        t = timed(f, mk) * 1e3
        gf, gb = cost(f, z)
        print(f"{name:24s} {t:8.2f} {t-prev_ms:7.2f} {gf:8.1f} {gb:7.2f}",
              flush=True)
        prev_ms = t

    print("\nworst layers by d_ms:")
    for name, t, d_ms, d_gf, d_gb in sorted(rows, key=lambda r: -r[2])[:8]:
        print(f"  {name:22s} {d_ms:7.2f} ms  {d_gf:7.1f} GF {d_gb:6.2f} GB",
              flush=True)


if __name__ == "__main__":
    main()
