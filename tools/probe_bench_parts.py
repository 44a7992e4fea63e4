"""Component ablation + roofline of the PRODUCTION bench program.

Measures, with the bench.py scan-chain methodology (distinct per-iteration
inputs, one host sync), the b128 production inference program and its
prefixes:

  fwd        forward only (decode + raw seg logits, digest-summed)
  fwd+seg    + fused Pallas seg tail (bilinear-8x + argmax)
  fwd+nms    + fused dense-plane NMS
  full       bench.py program (fwd + NMS + seg tail)

and prints each program's cost_analysis bytes so the HBM roofline
(floor = bytes / 0.82 TB/s on v5e) can be compared with the achieved time.
Run ALONE on the chip (PERF.md env note). Usage:
    python tools/probe_bench_parts.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from desenet_tpu.utils.general import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

SIZE = 640
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 24
HBM_TBS = 0.82  # v5e peak HBM bandwidth


def main():
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    model, _ = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                           seg_upsample=False, stem_s2d=True)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)

    def fwd(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        return dec.sum(dtype=jnp.float32) + seg.sum(dtype=jnp.float32)

    def fwd_seg(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        return dec.sum(dtype=jnp.float32) + seg_cls.sum(
            dtype=jnp.int32).astype(jnp.float32)

    def fwd_nms(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        return (nms.boxes.sum() + nms.scores.sum()
                + nms.num.sum().astype(jnp.float32)
                + seg.sum(dtype=jnp.float32))

    def full(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        return (nms.boxes.sum() + nms.scores.sum()
                + nms.num.sum().astype(jnp.float32)
                + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32))

    @jax.jit
    def make_inputs(key):
        return jax.random.uniform(
            key, (ITERS, B, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)

    def timed(fn):
        jitted = jax.jit(lambda a: jax.lax.scan(
            lambda c, x: (c + fn(x), None), 0.0, a)[0])
        warm = jax.block_until_ready(make_inputs(jax.random.PRNGKey(3)))
        float(jitted(warm))
        del warm
        xs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(7)))
        t0 = time.perf_counter()
        float(jitted(xs))
        dt = (time.perf_counter() - t0) / ITERS
        del xs
        return dt

    def bytes_gb(fn):
        z = jnp.zeros((B, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)
        c = jax.jit(fn).lower(z).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return c.get("bytes accessed", 0.0) / 1e9

    rows = []
    for name, fn in [("fwd", fwd), ("fwd+seg", fwd_seg),
                     ("fwd+nms", fwd_nms), ("full", full)]:
        gb = bytes_gb(fn)
        ms = timed(fn) * 1e3
        floor_ms = gb / HBM_TBS  # GB / (TB/s) = ms
        rows.append((name, ms, gb, floor_ms))
        print(f"{name:8s} {ms:7.2f} ms   {gb:6.2f} GB   "
              f"HBM floor {floor_ms:6.2f} ms   "
              f"{100 * floor_ms / ms:5.1f}% of roofline   "
              f"{B / ms * 1e3:7.1f} img/s")

    f = dict((r[0], r) for r in rows)
    print(f"\nseg tail delta: {f['fwd+seg'][1] - f['fwd'][1]:.2f} ms;  "
          f"NMS delta: {f['fwd+nms'][1] - f['fwd'][1]:.2f} ms;  "
          f"full - fwd: {f['full'][1] - f['fwd'][1]:.2f} ms")


if __name__ == "__main__":
    main()
