"""Probe train-step (loss+grad) throughput across batch size / remat on the
real TPU — the backward pass is 61% of the step (tools/profile_step.py), so
these are the cheap levers to test before kernel work.

Variants: b64, b128, b64+remat, b128+remat (unfused-C3 training layout, bf16
compute like the engine). Chain methodology per bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 640
ITERS = 4


def run_variant(batch, remat):
    from desenet_tpu.losses import DetectionLoss, segmentation_loss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                              fused_csp=False, remat=remat)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1], strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)

    params0, bs0 = variables["params"], variables["batch_stats"]
    tgt = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.4, 0.3]], jnp.float32),
                   (ITERS, batch, 8, 1))
    msk = jnp.tile(jnp.asarray([[True] * 4 + [False] * 4]), (ITERS, batch, 1))
    seg_small = jnp.asarray(np.random.default_rng(0).integers(
        0, spec.se_nc, (ITERS, batch, SIZE // 8, SIZE // 8)).astype(np.int32))

    def loss_fn(params, x, t_i, m_i, s_i):
        out, mut = model.apply(
            {"params": params, "batch_stats": bs0}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        det_feats, seg_out = out
        det_total, comps = det_loss(det_feats, t_i, m_i)
        seg_l = segmentation_loss(seg_out, s_i, aux_weight=0.1)
        return 0.14 * det_total + seg_l

    @jax.jit
    def chain(xs, segs):
        def body(c, inp):
            x, t_i, m_i, s_i = inp
            l, g = jax.value_and_grad(loss_fn)(params0, x, t_i, m_i, s_i)
            return c + l + sum(jax.tree.leaves(jax.tree.map(
                lambda a: a.sum().astype(jnp.float32), g))), None
        return jax.lax.scan(body, 0.0, (xs, tgt, msk, segs))[0]

    def mk(key):
        xs = jax.random.uniform(key, (ITERS, batch, SIZE, SIZE, 3),
                                jnp.float32)
        segs = jnp.repeat(jnp.repeat(seg_small, 8, axis=-2), 8, axis=-1)
        return jax.block_until_ready((xs, segs))

    warm = mk(jax.random.PRNGKey(3))
    float(chain(*warm))
    args = mk(jax.random.PRNGKey(7))
    t0 = time.perf_counter()
    float(chain(*args))
    dt = (time.perf_counter() - t0) / ITERS
    return {"ms": round(dt * 1e3, 2), "img_s": round(batch / dt, 1)}


def main():
    out = {}
    for batch, remat in ((128, False), (64, True), (128, True)):
        key = f"b{batch}{'_remat' if remat else ''}"
        try:
            out[key] = run_variant(batch, remat)
        except Exception as e:  # OOM etc.
            out[key] = {"error": str(e)[-200:]}
        print(key, out[key], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
