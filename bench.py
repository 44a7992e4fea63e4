"""Benchmark: joint (det+seg) batched inference throughput on one TPU chip.

Measures the full production inference program — forward (bf16, NHWC) +
Detect decode + fixed-shape NMS + seg argmax — at batch 128, 640x640, matching
BASELINE.md's north-star config (>=2000 img/s/chip on v5e).

Methodology notes (this environment):
- inputs are generated on-device from per-iteration PRNG keys: the axon
  tunnel replays identical (executable, args) pairs, so same-input timing
  loops report fantasy numbers; warm and timed runs use two DISTINCT
  input stacks (the warm stack is freed before the timed one is made);
- the timed region is an in-jit lax.scan chain of ITERS full inference
  steps with a single host sync — per-call dispatch through the tunnel
  serializes on a ~30-70 ms round-trip and would under-report the chip by
  ~2x. The scan's trip count is STATIC: a dynamic fori_loop count was
  measured 6% slower (39.1 vs 36.8 ms/iter — XLA can't pipeline a
  while-loop with an unknown trip count; PERF.md round 3);
- a persistent compilation cache (.jax_cache/) makes reruns skip the
  multi-minute tunnel compile (measured: 14 min cold -> <1 min warm
  end-to-end). Compile time is the ONLY unbounded stage; everything after
  it is seconds. DESENET_BENCH_BUDGET_S shrinks ITERS pre-compile when the
  backend bring-up has already eaten the budget (smaller input stacks,
  ~2-6% dispatch under-report at ITERS=8 — an honest smaller number).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

_REPO = os.path.dirname(os.path.abspath(__file__))

import jax
import jax.numpy as jnp

# Persistent compile cache: first run through a healthy tunnel pays the
# compile once; every later run (including the driver's end-of-round run)
# deserializes in seconds. DESENET_BENCH_NO_CACHE opts out (flag-sweep
# probes must not cross-pollinate executables compiled under other flags).
from desenet_tpu.utils.general import enable_compile_cache

enable_compile_cache(_REPO)

BATCH = 128
SIZE = 640
BASELINE_IMG_S = 2000.0  # BASELINE.md north-star target
# 40 iters x (128,160,160,48) uint8 = 6.3 GB per input stack (the warm
# stack is dropped before the timed one is made; peak fits v5e's 16 GB with
# the ~3 GB of live activations; round 4 switched the staged inputs from
# bf16 to the Predictor's exact uint8-widen-in-graph program, halving the
# stack). The axon tunnel carries a fixed ~44 ms cost per *call* (fitted
# across ITERS=16/24/32/40); longer chains amortize the dispatch artifact:
# 24 iters reads 3472, 40 reads 3496-3514 img/s for the same program.
ITERS = int(os.environ.get("DESENET_BENCH_ITERS", "40"))
# Wall-clock budget for the WHOLE script (driver timeouts historically
# produced rc=124 with no number). Only the tunnel compile is unbounded;
# if bring-up already burned most of the budget, degrade ITERS pre-compile.
BUDGET_S = float(os.environ.get("DESENET_BENCH_BUDGET_S", "1500"))


def main():
    t_start = time.perf_counter()
    verbose = os.environ.get("DESENET_BENCH_VERBOSE")

    def remaining():
        return BUDGET_S - (time.perf_counter() - t_start)

    def mark(label):
        if verbose:
            print(f"# t+{time.perf_counter() - t_start:7.1f}s  {label}",
                  flush=True)

    from desenet_tpu.models import build_model, init_model, config_path
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    mark("imports done")
    # seg_upsample=False: the head returns 1/8-res logits and the fused
    # Pallas tail does bilinear-8x + argmax in VMEM (ops/seg_pallas.py).
    # stem_s2d=True: inputs arrive in host space-to-depth-4 layout — the
    # loader folds the permutation into its batch-assembly memcpy
    # (native/fastops.cpp assemble_batch_s2d4; api.Predictor does the same)
    # — and l0/l1 run as MXU-deep phase convs (models/layers.py PhaseStem*)
    model, _ = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                           seg_upsample=False, stem_s2d=True)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE, batch=1)
    mark("init_model done (backend up)")

    def infer_digest(variables, x_u8):
        # uint8 inputs widened in-graph — byte-identical to the served
        # program (api.py Predictor `img_u8.astype(dtype)/255.0`); u8 also
        # reads 2x less HBM than staging bf16 inputs would
        x = x_u8.astype(model.dtype) / 255.0
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        # scalar digest forces full materialization of every output
        return (
            nms.boxes.sum() + nms.scores.sum() + nms.num.sum().astype(jnp.float32)
            + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32)
        )

    # Pre-compile budget check: backend bring-up through a degraded tunnel
    # can take many minutes on its own; shrink the chain when little budget
    # is left so the remaining stages (input gen, two chain runs) stay cheap.
    iters = ITERS
    if remaining() < 120 and iters > 8:
        iters = 8
        print(f"# budget: {remaining():.0f}s left before compile "
              f"-> degraded ITERS={iters}", flush=True)

    @jax.jit
    def make_inputs(key):
        # pre-generated varied inputs: the timed region is pure inference
        # (per-iteration on-device RNG is not part of the workload, and
        # identical inputs would be replayed by the axon tunnel). uint8 in
        # the host-s2d layout, exactly what the Predictor is fed.
        return jax.random.randint(
            key, (iters, BATCH, SIZE // 4, SIZE // 4, 48), 0, 256,
            jnp.int32).astype(jnp.uint8)

    # `variables` is CLOSED OVER, not passed as an argument: weights are
    # compile-time constants, exactly as a deployed inference program bakes
    # them (tools/export_model.py does the same). This frees XLA to pick
    # weight layouts instead of honoring a parameter-layout contract —
    # measured 6% faster than passing variables as an argument (39.0 ->
    # 36.8 ms/iter; PERF.md round 3).
    def chain_fn(xs):
        def body(carry, x):
            return carry + infer_digest(variables, x), None

        out, _ = jax.lax.scan(body, 0.0, xs)
        return out

    # Optional compiler-option experiment hook (tools/probe_infer_xla_flags
    # found ~+1% from xla_tpu_rwb_fusion=false at ITERS=16, but it did NOT
    # reproduce on the full ITERS=24 program — see PERF.md round 3; default
    # options are the production path).
    t0 = time.perf_counter()
    lowered = jax.jit(chain_fn).lower(jax.ShapeDtypeStruct(
        (iters, BATCH, SIZE // 4, SIZE // 4, 48), jnp.uint8))
    opt_env = os.environ.get("DESENET_BENCH_XLA_OPTS", "")
    opts = dict(kv.split("=", 1) for kv in opt_env.split(",") if "=" in kv)
    try:
        chain = lowered.compile(compiler_options=opts or None)
    except Exception as e:
        if opts:
            # ALWAYS loud: an explicitly requested flag experiment falling
            # back to defaults must not report a default-config number as
            # the experiment's result
            import sys

            print(f"# DESENET_BENCH_XLA_OPTS rejected ({e}); "
                  "re-compiling with DEFAULT options — this run is NOT "
                  "the requested experiment", file=sys.stderr, flush=True)
        chain = lowered.compile()
    mark(f"chain compiled ({time.perf_counter() - t0:.1f}s)")

    # two distinct input stacks: warm on one, time the other (re-calling
    # with identical args would hit the tunnel's replay cache)
    xs_warm = jax.block_until_ready(make_inputs(jax.random.PRNGKey(3)))
    mark("inputs materialized")
    float(chain(xs_warm))  # warm
    mark("warm run done")
    del xs_warm  # free HBM before materializing the timed stack
    xs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(chain(xs))
    dt = (time.perf_counter() - t0) / iters

    img_s = BATCH / dt
    print(json.dumps({
        "metric": "joint_det_seg_inference_throughput_b128_640",
        "value": round(img_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
