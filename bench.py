"""Benchmark: joint (det+seg) batched inference throughput on one TPU chip.

Measures the full production inference program — forward (bf16, NHWC) +
Detect decode + fixed-shape NMS + seg argmax — at batch 128, 640x640, matching
BASELINE.md's north-star config (>=2000 img/s/chip on v5e).

Methodology notes (this environment):
- inputs are generated on-device from per-iteration PRNG keys: the axon
  tunnel replays identical (executable, args) pairs, so same-input timing
  loops report fantasy numbers;
- the timed region is an in-jit chain of N full inference steps with a single
  host sync — per-call dispatch through the tunnel serializes on a ~30-70 ms
  round-trip and would under-report the chip by ~2x;
- the chain takes the iteration count as a *runtime* argument
  (lax.fori_loop over a fixed-shape input stack), so ONE compiled executable
  serves both the warm/calibration run and any degraded iteration count;
- a persistent compilation cache (.jax_cache/) makes reruns skip the
  multi-minute tunnel compile entirely;
- a wall-clock budget (env DESENET_BENCH_BUDGET_S) degrades the timed
  iteration count 24 -> 8 -> 4 -> 2 instead of overrunning: a smaller honest
  number always beats rc=124/no number. At ITERS=8 the residual per-call
  dispatch artifact under-reports the chip by ~2-6% (PERF.md addenda V).

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
# deserializes in seconds. Harmless if the backend declines to serialize.
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BATCH = 128
SIZE = 640
BASELINE_IMG_S = 2000.0  # BASELINE.md north-star target
# 24 iters x (128,160,160,48) bf16 = 7.4 GB input stack, generated on-device.
# The axon tunnel carries a fixed ~22 ms round-trip per *call*; at ITERS=8
# that under-reported the chip by ~6% (2.75 ms/iter) — longer chains amortize
# the dispatch artifact, so 24 is used whenever the budget allows.
ITERS_MAX = 24
# Wall-clock budget for the WHOLE script. The driver historically killed the
# bench at rc=124 with no number; degrade instead. Default leaves headroom
# under a 30-minute external timeout even after a slow-tunnel compile.
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

    # seg_upsample=False: the head returns 1/8-res logits and the fused
    # Pallas tail does bilinear-8x + argmax in VMEM (ops/seg_pallas.py).
    # stem_s2d=True: inputs arrive in host space-to-depth-4 layout — the
    # loader folds the permutation into its batch-assembly memcpy
    # (native/fastops.cpp assemble_batch_s2d4; api.Predictor does the same)
    # — and l0/l1 run as MXU-deep phase convs (models/layers.py PhaseStem*)
    mark("imports done")
    model, _ = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                           seg_upsample=False, stem_s2d=True)
    mark("model built")
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE, batch=1)
    mark("init_model done (backend up)")

    def infer_digest(variables, x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                  max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        seg_cls = upsample_argmax(seg, scale=8, align_corners=True)
        # scalar digest forces full materialization of every output
        return (
            nms.boxes.sum() + nms.scores.sum() + nms.num.sum().astype(jnp.float32)
            + seg_cls.sum(dtype=jnp.int32).astype(jnp.float32)
        )

    @jax.jit
    def make_inputs(key):
        # pre-generated varied inputs: the timed region is pure inference
        # (per-iteration on-device RNG is not part of the workload, and
        # identical inputs would be replayed by the axon tunnel)
        return jax.random.uniform(
            key, (ITERS_MAX, BATCH, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)

    @jax.jit
    def chain(variables, xs, n):
        # n is a runtime scalar: warm, calibration, and (possibly degraded)
        # timed runs all reuse this one executable — and distinct n values
        # keep every (executable, args) pair unique for the tunnel.
        def body(i, carry):
            return carry + infer_digest(variables, xs[i])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    xs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(7)))
    mark("inputs materialized")

    # Compile + warm with a 2-iter pass; its post-compile duration calibrates
    # the per-iteration cost for the budget decision below.
    t0 = time.perf_counter()
    float(chain(variables, xs, jnp.int32(1)))  # pays the compile
    t_compile = time.perf_counter() - t0
    mark(f"chain compiled ({t_compile:.1f}s)")
    t0 = time.perf_counter()
    float(chain(variables, xs, jnp.int32(2)))  # warm, rough per-iter estimate
    per_iter_est = (time.perf_counter() - t0) / 2

    # Pick the largest iteration count that fits the remaining budget with a
    # 2x safety factor (tunnel variance), never exceeding ITERS_MAX.
    iters = 2
    for cand in (4, 8, ITERS_MAX):
        if cand * per_iter_est * 2 + 5.0 < remaining():
            iters = cand
    if iters < ITERS_MAX:
        print(f"# budget: compile {t_compile:.0f}s, {remaining():.0f}s left "
              f"-> degraded ITERS={iters}", flush=True)

    t0 = time.perf_counter()
    float(chain(variables, xs, jnp.int32(iters)))
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
