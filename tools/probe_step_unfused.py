"""Measure the PRODUCTION train step (unfused C3 engine layout, donate) and
forward-only variants to attribute the train-vs-eval forward gap.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 640
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = 4


def timed(fn, mk, iters=ITERS):
    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda a: jax.lax.scan(
        lambda c, x: (c + fn(*x), None), 0.0, a)[0])
    float(jitted(warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def main():
    from desenet_tpu.losses import DetectionLoss, segmentation_loss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.train import create_train_state, make_train_step, one_cycle
    from desenet_tpu.train.optim import OptimConfig

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                              fused_csp=False)  # engine training layout
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    params0, bs0 = variables["params"], variables["batch_stats"]

    def mk(key):
        xs = jax.random.randint(key, (ITERS, B, SIZE, SIZE, 3), 0, 256,
                                jnp.uint8)
        seg = jax.random.randint(key, (ITERS, B, SIZE, SIZE), 0, spec.se_nc,
                                 jnp.int32)
        return xs, seg

    # fwd-only variants to attribute the train-vs-eval forward gap
    def fwd_train(x, seg):
        xb = x.astype(jnp.bfloat16) / 255.0
        out, _ = model.apply({"params": params0, "batch_stats": bs0}, xb,
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(0)})
        det_feats, seg_out = out
        s = seg_out[0] if isinstance(seg_out, (list, tuple)) else seg_out
        return s.sum(dtype=jnp.float32) + sum(
            f.sum(dtype=jnp.float32) for f in det_feats)

    def fwd_eval(x, seg):
        xb = x.astype(jnp.bfloat16) / 255.0
        (dec, feats), s = model.apply(
            {"params": params0, "batch_stats": bs0}, xb, train=False)
        return s.sum(dtype=jnp.float32) + sum(
            f.sum(dtype=jnp.float32) for f in feats)

    for name, f in (("fwd_train_unfused", fwd_train),
                    ("fwd_eval_unfused", fwd_eval)):
        t = timed(f, mk)
        print(f"{name:22s} {t*1e3:8.2f} ms  {B/t:8.1f} img/s", flush=True)

    # the production step program
    tgt = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.4, 0.3]], jnp.float32),
                   (B, 8, 1))
    msk = jnp.tile(jnp.asarray([[True] * 4 + [False] * 4]), (B, 1))
    opt_cfg = OptimConfig(lr0=0.01)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(model, det_loss, opt_cfg, one_cycle(1, 0.2, 10),
                           nb=100, warmup_iters=0, nominal_bs=B,
                           batch_size=B, donate=False, compiler_options=None)

    @jax.jit
    def chain(state, xs, segs):
        def body(st, inp):
            x, s_i = inp
            batch = {"image": x, "det_targets": tgt, "det_mask": msk,
                     "seg_labels": s_i}
            st, m = step(st, batch, jax.random.PRNGKey(0))
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, (xs, segs))
        return losses.sum()

    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    float(chain(state, *warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(chain(state, *args))
    t = (time.perf_counter() - t0) / ITERS
    print(f"{'full_step_unfused':22s} {t*1e3:8.2f} ms  {B/t:8.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
