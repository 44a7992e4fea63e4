"""XLA compiler-option sweep on the PRODUCTION INFERENCE program.

The round-2 train-side sweep (probe_xla_flags.py) measured negative;
inference has a different mix — fwd runs at 77% of its HBM floor with an
8 ms scheduling+stem residual (PERF.md round 3). Options are passed via
``.compile(compiler_options=...)`` so they reach the server-side TPU
compiler through the axon tunnel (local XLA_FLAGS parsing rejects TPU
flags).

Run ALONE on the chip. Usage:
    python tools/probe_infer_xla_flags.py              # built-in sweep
    python tools/probe_infer_xla_flags.py k=v [k=v...] # custom options
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 640
B = 128
ITERS = 16

SWEEP = [
    ("baseline", {}),
    ("latency_hiding", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("async_all", {"xla_tpu_enable_async_collective_fusion": "true"}),
]


def main():
    custom = dict(kv.split("=", 1) for kv in sys.argv[1:])
    sweep = [("custom", custom)] if custom else SWEEP

    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    model, _ = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                           seg_upsample=False, stem_s2d=True)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)

    def digest(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        return (nms.boxes.sum() + nms.scores.sum()
                + nms.num.sum().astype(jnp.float32)
                + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32))

    def chain(xs):
        return jax.lax.scan(lambda c, x: (c + digest(x), None), 0.0, xs)[0]

    @jax.jit
    def mk(key):
        return jax.random.uniform(
            key, (ITERS, B, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)

    lowered = jax.jit(chain).lower(
        jax.ShapeDtypeStruct((ITERS, B, SIZE // 4, SIZE // 4, 48),
                             jnp.bfloat16))
    base = None
    for name, opts in sweep:
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            print(f"{name:24s} COMPILE FAILED: {str(e)[:160]}", flush=True)
            continue
        warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
        float(compiled(warm))
        del warm
        xs = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
        t0 = time.perf_counter()
        float(compiled(xs))
        dt = (time.perf_counter() - t0) / ITERS
        del xs
        val = B / dt
        if name == "baseline":
            base = val
        rel = f"  ({val / base - 1:+.1%})" if base and name != "baseline" else ""
        print(f"{name:24s} {val:8.1f} img/s  {dt * 1e3:6.2f} ms{rel}",
              flush=True)


if __name__ == "__main__":
    main()
