"""Benchmark: joint (det+seg) batched inference throughput on one TPU chip.

Measures the full production inference program — forward (bf16, NHWC) +
Detect decode + fixed-shape NMS + seg argmax — at batch 128, 640x640, matching
BASELINE.md's north-star config (>=2000 img/s/chip on v5e).

Methodology notes (this environment):
- inputs are generated on-device from per-iteration PRNG keys: the axon
  tunnel replays identical (executable, args) pairs, so same-input timing
  loops report fantasy numbers;
- the timed region is an in-jit lax.scan chain of ITERS full inference steps
  with a single host sync — per-call dispatch through the tunnel serializes
  on a ~30-70 ms round-trip and would under-report the chip by ~2x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BATCH = 128
SIZE = 640
BASELINE_IMG_S = 2000.0  # BASELINE.md north-star target
# 24 iters x (128,160,160,48) bf16 = 7.4 GB per input set (warm set is
# dropped before the timed set is made). The axon tunnel carries a fixed
# ~22 ms round-trip per *call*; at ITERS=8 that under-reported the chip by
# ~6% (2.75 ms/iter) — longer chains amortize the dispatch artifact.
ITERS = 24


def main():
    from desenet_tpu.models import build_model, init_model, config_path
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.seg_pallas import upsample_argmax

    # seg_upsample=False: the head returns 1/8-res logits and the fused
    # Pallas tail does bilinear-8x + argmax in VMEM (ops/seg_pallas.py).
    # stem_s2d=True: inputs arrive in host space-to-depth-4 layout — the
    # loader folds the permutation into its batch-assembly memcpy
    # (native/fastops.cpp assemble_batch_s2d4; api.Predictor does the same)
    # — and l0/l1 run as MXU-deep phase convs (models/layers.py PhaseStem*)
    model, _ = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                           seg_upsample=False, stem_s2d=True)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE, batch=1)

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
            key, (ITERS, BATCH, SIZE // 4, SIZE // 4, 48), jnp.bfloat16)

    @jax.jit
    def chain(variables, xs):
        def body(carry, x):
            return carry + infer_digest(variables, x), None

        out, _ = jax.lax.scan(body, 0.0, xs)
        return out

    # two distinct input sets: warm on one, time the other (re-calling with
    # identical args would hit the tunnel's replay cache)
    xs_warm = jax.block_until_ready(make_inputs(jax.random.PRNGKey(3)))
    float(chain(variables, xs_warm))  # compile + warm
    del xs_warm  # free HBM before materializing the timed set
    xs = jax.block_until_ready(make_inputs(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(chain(variables, xs))
    dt = (time.perf_counter() - t0) / ITERS

    img_s = BATCH / dt
    print(json.dumps({
        "metric": "joint_det_seg_inference_throughput_b128_640",
        "value": round(img_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
