"""Run all five BASELINE.md benchmark configs and print a result table.

  1. single-image detect latency (fused fwd+decode+NMS+seg, batch 1)
  2. det-only decode+NMS throughput, batch 32, 6 classes / 3 scales
  3. seg-only mIoU eval throughput (forward + argmax)
  4. full joint val path (per-image device ms at val thresholds)
  5. end-to-end train step (mosaic-augmented batch, multi-task loss)

All timed on the current JAX backend with in-jit chains over distinct inputs
(see bench.py's methodology notes). Accuracy-side evidence for configs 3/4
lives in PARITY.md (4-decimal agreement with the reference val pipeline).

    python tools/run_baseline_configs.py [--size 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(body, n, *args):
    @jax.jit
    def chain(key):
        def f(c, k):
            return c + body(k), None
        return jax.lax.scan(f, 0.0, jax.random.split(key, n))[0]

    float(chain(jax.random.PRNGKey(0)))  # compile + warm
    t0 = time.perf_counter()
    float(chain(jax.random.PRNGKey(1)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args()
    s = args.size

    from desenet_tpu.losses import DetectionLoss, segmentation_loss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.ops import non_max_suppression

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=s, batch=1)
    rows = []

    # 1. single-image detect latency
    def c1(k):
        x = jax.random.uniform(k, (1, s, s, 3), jnp.bfloat16)
        (dec, _), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, 0.25, 0.45, max_det=300, pre_topk=512)
        return nms.boxes.sum() + jnp.argmax(seg, -1).sum(
            dtype=jnp.int32).astype(jnp.float32)

    dt = chain_time(c1, 16)
    rows.append(("1 single-image detect (b1)", f"{dt * 1e3:.2f} ms/img"))

    # 2. det-only decode+NMS, batch 32
    def c2(k):
        x = jax.random.uniform(k, (32, s, s, 3), jnp.bfloat16)
        (dec, _), _ = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, 0.25, 0.45, max_det=300, pre_topk=512)
        return nms.boxes.sum() + nms.num.sum().astype(jnp.float32)

    dt = chain_time(c2, 8)
    rows.append(("2 det-only decode+NMS (b32)", f"{32 / dt:.0f} img/s"))

    # 3. seg-only eval (forward + argmax at full res)
    def c3(k):
        x = jax.random.uniform(k, (32, s, s, 3), jnp.bfloat16)
        _, seg = model.apply(variables, x, train=False)
        return jnp.argmax(seg, -1).sum(dtype=jnp.int32).astype(jnp.float32)

    dt = chain_time(c3, 8)
    rows.append(("3 seg-only eval (b32)", f"{32 / dt:.0f} img/s"))

    # 4. joint val-threshold path (conf 0.001, multi-label)
    def c4(k):
        x = jax.random.uniform(k, (32, s, s, 3), jnp.bfloat16)
        (dec, _), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, 0.001, 0.6, max_det=300,
                                  pre_topk=2048, multi_label=True)
        return nms.boxes.sum() + jnp.argmax(seg, -1).sum(
            dtype=jnp.int32).astype(jnp.float32)

    dt = chain_time(c4, 8)
    rows.append(("4 joint val path (b32, conf .001)",
                 f"{dt / 32 * 1e3:.2f} ms/img"))

    # 5. end-to-end train step (fwd+loss+bwd+opt+EMA)
    from desenet_tpu.train import create_train_state, make_train_step, one_cycle
    from desenet_tpu.train.optim import OptimConfig

    tmodel, tspec = build_model(config_path("yolov5s_seg"),
                                fused_csp=False, dtype=jnp.bfloat16)
    tvars = init_model(tmodel, jax.random.PRNGKey(0), img_size=s, batch=1)
    head = Detect(nc=tspec.de_nc,
                  anchors=tspec.layers[tspec.det_layer].args[1],
                  strides=tspec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in sc)
                    for sc in head.anchors_grid_units())
    loss_fn = DetectionLoss(anchors=anchors, nc=tspec.de_nc)
    opt = OptimConfig()
    B = 64
    step = make_train_step(tmodel, loss_fn, opt, one_cycle(1, 0.2, 300),
                           nb=100, warmup_iters=300, nominal_bs=64,
                           batch_size=B, donate=False, compiler_options=None)
    state = create_train_state(tvars, opt)

    @jax.jit
    def c5_chain(state, key):
        def f(carry, k):
            st, tot = carry
            k1, k2 = jax.random.split(k)
            batch = {
                "image": jax.random.uniform(k1, (B, s, s, 3), jnp.bfloat16),
                "det_targets": jax.random.uniform(
                    k2, (B, 64, 5), jnp.float32) * 0.6 + 0.2,
                "det_mask": jax.random.uniform(k2, (B, 64)) > 0.7,
                "seg_labels": jax.random.randint(k2, (B, s, s), 0, 3),
            }
            st, m = step(st, batch, k1)
            return (st, tot + m["loss"]), None
        (st, tot), _ = jax.lax.scan(f, (state, 0.0),
                                    jax.random.split(key, 4))
        return tot

    float(c5_chain(state, jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    float(c5_chain(state, jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / 4
    rows.append((f"5 e2e train step (b{B})", f"{B / dt:.0f} img/s"))

    print(f"\nBASELINE configs @ {s}px, backend={jax.default_backend()}:")
    for name, val in rows:
        print(f"  {name:<38} {val}")


if __name__ == "__main__":
    main()
