"""Probe: fp8(e4m3) activation STORAGE on the full production inference model.

Follow-up to probe_fp8_act.py (isolated chains: the converts fuse, bytes drop
~45%). This measures the real program: yolov5s_seg b128 640px bf16 compute,
production config (stem_s2d + fused Pallas seg tail + fused NMS), with
`build_model(act_store="fp8")` — every ConvBnAct/DilatedConvBnSiLU output is
written to HBM as float8_e4m3fn, det-src layers excluded
(models/layers.py act_store_scope; PERF.md "int8" for the exclusion
rationale).

Usage: python tools/probe_fp8_model.py  (run ALONE on the chip — concurrent
processes starve the single-core tunnel client and corrupt timings)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 128
SIZE = 640
ITERS = 8


def build(act_store):
    from desenet_tpu.models import build_model, init_model, config_path
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                              seg_upsample=False, stem_s2d=True,
                              act_store=act_store)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)

    def infer_digest(variables, x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        return (
            nms.boxes.sum() + nms.scores.sum()
            + nms.num.sum().astype(jnp.float32)
            + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32)
        )

    @jax.jit
    def chain(variables, xs):
        def body(carry, x):
            return carry + infer_digest(variables, x), None

        return jax.lax.scan(body, 0.0, xs)[0]

    return variables, chain


@jax.jit
def make_inputs(key):
    return jax.random.uniform(
        key, (ITERS, BATCH, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)


def main():
    xs_warm = jax.block_until_ready(make_inputs(jax.random.PRNGKey(3)))
    xs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(7)))
    with_ca = "--ca" in sys.argv  # AOT cost_analysis is slow over the tunnel
    for store in (None, "fp8"):
        name = store or "bf16"
        variables, chain = build(store)
        print(f"{name}: built, compiling...", flush=True)
        gb = float("nan")
        if with_ca:
            ca = chain.lower(variables, xs_warm).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            gb = ca.get("bytes accessed", 0) / 1e9 / ITERS
        d = float(chain(variables, xs_warm))  # warm/compile
        print(f"{name}: warm done", flush=True)
        t0 = time.perf_counter()
        float(chain(variables, xs))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:5s} {dt*1e3:6.2f} ms/iter  {BATCH/dt:7.1f} img/s  "
              f"bytes={gb:5.2f} GB/iter  digest={d:.1f}", flush=True)


if __name__ == "__main__":
    main()
