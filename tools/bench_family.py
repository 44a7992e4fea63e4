"""Model-family throughput: the bench.py program at s/m/l scale.

Same methodology as bench.py (in-jit scan over pre-generated distinct
inputs, one host sync; production config: stem_s2d host-s2d4 layout,
seg_upsample=False + fused Pallas tail, fused NMS). Reference scaling
story: gd/gw in the model yamls (yolo.py:458-463).

    python tools/bench_family.py [--batch 128] [--iters 12] [--size 640] \
        [--models s,m,l]

Run alone on the chip (PERF.md env note: one host core; a concurrent
process corrupts device timings).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from desenet_tpu.utils.general import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--models", type=str, default="s,m,l")
    ap.add_argument("--ca", action="store_true",
                    help="print cost_analysis bytes + HBM roofline split "
                         "(AOT cost_analysis is slow over the tunnel)")
    ap.add_argument("--pre-topk", type=int, default=None,
                    help="override PRE_TOPK_PRODUCTION (knob validation "
                         "at m/l scale)")
    args = ap.parse_args()

    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    B, S, ITERS = args.batch, args.size, args.iters
    for name in args.models.split(","):
        cfg = config_path(f"yolov5{name.strip()}_seg")
        model, spec = build_model(
            cfg, dtype=jnp.bfloat16, seg_upsample=False, stem_s2d=True,
            # A/B knob for the fused Pallas SegMaskPSP2 head (wash at s,
            # PERF.md round 2; m/l economics probe, round 5)
            seg_head_fused=os.environ.get("DESENET_FUSED_SEG_HEAD") == "1")
        variables = init_model(model, jax.random.PRNGKey(0), img_size=S,
                               batch=1)
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

        pre_topk = (args.pre_topk if args.pre_topk is not None
                    else PRE_TOPK_PRODUCTION)

        def digest(variables, x_u8):
            # uint8 widened in-graph — the Predictor's exact program
            # (bench.py round 4)
            x = x_u8.astype(model.dtype) / 255.0
            (dec, feats), seg = model.apply(variables, x, train=False)
            nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                      max_det=300,
                                      pre_topk=pre_topk)
            seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
            return (nms.boxes.sum() + nms.scores.sum()
                    + nms.num.sum().astype(jnp.float32)
                    + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32))

        @jax.jit
        def make_inputs(key):
            return jax.random.randint(
                key, (ITERS, B, S // 4, S // 4, 48), 0, 256,
                jnp.int32).astype(jnp.uint8)

        # weights closed over (compile-time constants), like bench.py:
        # measured 6% faster than passing variables as a jit argument
        def chain_fn(xs):
            return jax.lax.scan(
                lambda c, x: (c + digest(variables, x), None), 0.0, xs)[0]

        opt_env = os.environ.get("DESENET_FAMILY_XLA_OPTS", "")
        opts = dict(kv.split("=", 1) for kv in opt_env.split(",")
                    if "=" in kv)
        chain = jax.jit(chain_fn).lower(jax.ShapeDtypeStruct(
            (ITERS, B, S // 4, S // 4, 48), jnp.uint8)).compile(
                compiler_options=opts or None)

        xs_warm = jax.block_until_ready(make_inputs(jax.random.PRNGKey(3)))
        float(chain(xs_warm))
        del xs_warm
        xs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(7)))
        t0 = time.perf_counter()
        float(chain(xs))
        dt = (time.perf_counter() - t0) / ITERS
        line = (f"yolov5{name}_seg: {n_params / 1e6:.2f}M params  "
                f"b{B}@{S}px  {dt * 1e3:.1f} ms/batch  "
                f"{B / dt:.0f} img/s/chip")
        if args.ca:
            # cost_analysis counts the lax.scan BODY once (not trip-count
            # times), so the raw numbers already are per-iteration
            ca = chain.cost_analysis()
            gb = ca.get("bytes accessed", 0.0) / 1e9
            tf = ca.get("flops", 0.0) / 1e12
            hbm_ms = gb / 0.82   # v5e ~0.82 TB/s usable HBM
            mxu_ms = tf / 0.197  # v5e ~197 bf16 TFLOP/s peak
            floor = max(hbm_ms, mxu_ms)
            line += (f"  | {gb:.1f} GB, {tf:.1f} TF/iter -> floors HBM "
                     f"{hbm_ms:.1f} / MXU {mxu_ms:.1f} ms; at "
                     f"{100 * floor / (dt * 1e3):.0f}% of "
                     f"{'HBM' if hbm_ms >= mxu_ms else 'MXU'} roofline")
        print(line)
        del xs, variables


if __name__ == "__main__":
    main()
