"""AOT-compile the production train step and print XLA's memory analysis —
no execution, so shapes that would RESOURCE_EXHAUST still yield numbers.

Answers "where does the memory actually sit" for the l/b128 fit question
(VERDICT r4 item 4): generated-code temp size vs argument/output bytes,
across {materialized, fused-seg-CE} x {no-remat, remat} variants.

Usage: PROBE_CFG=yolov5l_seg PROBE_B=128 python tools/probe_step_memory.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("PROBE_SIZE", "640"))
B = int(os.environ.get("PROBE_B", "128"))
CFG = os.environ.get("PROBE_CFG", "yolov5l_seg")


def build(seg_upsample, remat, remat_convs=False):
    from desenet_tpu.losses import DetectionLoss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.train import (create_train_state, make_train_step,
                                   one_cycle)
    from desenet_tpu.train.optim import OptimConfig

    model, spec = build_model(config_path(CFG), dtype=jnp.bfloat16,
                              fused_csp=False, remat=remat,
                              seg_upsample=seg_upsample)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    opt_cfg = OptimConfig(lr0=0.01)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(model, det_loss, opt_cfg, one_cycle(1, 0.2, 10),
                           nb=100, warmup_iters=0, nominal_bs=B,
                           batch_size=B, donate=True,
                           remat_convs=remat_convs,
                           compiler_options=None)
    return step, state, spec


def main():
    variants = [(True, False, False), (False, False, False),
                (False, True, False), (False, False, True),
                (False, True, True)]
    only = os.environ.get("PROBE_VARIANTS")  # e.g. "3,4" to run a subset
    if only:
        variants = [variants[int(i)] for i in only.split(",")]
    for seg_up, remat, rc in variants:
        step, state, spec = build(seg_up, remat, rc)
        batch = {
            "image": jax.ShapeDtypeStruct((B, SIZE, SIZE, 3), jnp.uint8),
            "det_targets": jax.ShapeDtypeStruct((B, 8, 5), jnp.float32),
            "det_mask": jax.ShapeDtypeStruct((B, 8), jnp.bool_),
            "seg_labels": jax.ShapeDtypeStruct((B, SIZE, SIZE), jnp.uint8),
        }
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        try:
            compiled = step.lower(state, batch, rng).compile()
            m = compiled.memory_analysis()
            gb = 1 / 2**30
            print(f"seg_upsample={seg_up} remat={remat} remat_convs={rc}: "
                  f"temp {m.temp_size_in_bytes * gb:.2f} GB  "
                  f"args {m.argument_size_in_bytes * gb:.2f} GB  "
                  f"out {m.output_size_in_bytes * gb:.2f} GB  "
                  f"alias {m.alias_size_in_bytes * gb:.2f} GB  "
                  f"peak(gen code) {(m.temp_size_in_bytes + m.argument_size_in_bytes + m.output_size_in_bytes - m.alias_size_in_bytes) * gb:.2f} GB",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record per-variant failures
            print(f"seg_upsample={seg_up} remat={remat} remat_convs={rc}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
