"""Probe XLA TPU compiler options on the production (unfused) train step.

Usage: python tools/probe_xla_flags.py key=val [key=val ...]
Compiles the full b64 step with the given options and prints steady ms.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("PROBE_SIZE", "640"))
B = int(os.environ.get("PROBE_B", "64"))
ITERS = int(os.environ.get("PROBE_ITERS", "4"))
CFG = os.environ.get("PROBE_CFG", "yolov5s_seg")  # family knob validation
REMAT = os.environ.get("PROBE_REMAT") == "1"  # activation rematerialization
SEG_UP = os.environ.get("PROBE_SEG_UPSAMPLE", "1") == "1"  # 0 = 1/8-res
# head + fused tiled upsample+CE loss (the production engine default,
# ops/seg_ce.py); 1 = materialized full-res logits (the literal formulation)


def main():
    opts = dict(kv.split("=", 1) for kv in sys.argv[1:])

    from desenet_tpu.losses import DetectionLoss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.train import create_train_state, make_train_step, one_cycle
    from desenet_tpu.train.optim import OptimConfig

    model, spec = build_model(config_path(CFG), dtype=jnp.bfloat16,
                              fused_csp=False, remat=REMAT,
                              seg_upsample=SEG_UP)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)

    tgt = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.4, 0.3]], jnp.float32),
                   (B, 8, 1))
    msk = jnp.tile(jnp.asarray([[True] * 4 + [False] * 4]), (B, 1))
    opt_cfg = OptimConfig(lr0=0.01)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(model, det_loss, opt_cfg, one_cycle(1, 0.2, 10),
                           nb=100, warmup_iters=0, nominal_bs=B,
                           batch_size=B, donate=False, compiler_options=None)

    def chain(state, xs, segs):
        def body(st, inp):
            x, s_i = inp
            batch = {"image": x, "det_targets": tgt, "det_mask": msk,
                     "seg_labels": s_i}
            st, m = step(st, batch, jax.random.PRNGKey(0))
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, (xs, segs))
        return losses.sum()

    def mk(key):
        xs = jax.random.randint(key, (ITERS, B, SIZE, SIZE, 3), 0, 256,
                                jnp.uint8)
        # uint8 masks match the production collate contract (the step widens
        # on-device) and quarter the input-stack HBM footprint
        seg = jax.random.randint(key, (ITERS, B, SIZE, SIZE), 0, spec.se_nc,
                                 jnp.uint8)
        return xs, seg

    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    compiled = jax.jit(chain).lower(state, *warm).compile(
        compiler_options=opts or None)
    float(compiled(state, *warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(compiled(state, *args))
    t = (time.perf_counter() - t0) / ITERS
    print(f"opts={opts} -> {t*1e3:.2f} ms  {B/t:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
