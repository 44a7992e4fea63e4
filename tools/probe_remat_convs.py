"""Selective remat probe: save ONLY conv outputs, recompute BN/SiLU chains.

The round-1 remat experiment used `dots_saveable`, which does NOT match
conv_general_dilated — every conv was recomputed in the backward and the
step regressed 139 -> 206 ms (PERF.md). The correct policy for a conv net is
the inverse: save each conv's output (the expensive MXU results) and
recompute the cheap elementwise BN-normalize/SiLU chains from them, so the
train forward stops materializing 2-3 tensors per block. Conv outputs are
tagged via jax.ad_checkpoint.checkpoint_name (layers.py `_name_conv_out`,
gated by DESENET_CONV_CKPT_NAME=1).

Measures grad-of-(model fwd + losses) b64/b128, baseline vs policy, on the
unfused (production train) layout.
"""

import os
import sys
import time

os.environ["DESENET_CONV_CKPT_NAME"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

SIZE = 640
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

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16,
                              fused_csp=False)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    params0, bs0 = variables["params"], variables["batch_stats"]

    policy = jax.checkpoint_policies.save_only_these_names("conv_out")

    def run(B, use_ckpt):
        def mk(key):
            xs = jax.random.randint(key, (ITERS, B, SIZE, SIZE, 3), 0, 256,
                                    jnp.uint8)
            seg = jax.random.randint(key, (ITERS, B, SIZE, SIZE), 0,
                                     spec.se_nc, jnp.int32)
            return xs, seg

        tgt = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.4, 0.3]], jnp.float32),
                       (B, 8, 1))
        msk = jnp.tile(jnp.asarray([[True] * 4 + [False] * 4]), (B, 1))

        def fwd(params, xb):
            out, mut = model.apply(
                {"params": params, "batch_stats": bs0}, xb, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            det_feats, seg_out = out
            return det_feats, seg_out, mut["batch_stats"]

        if use_ckpt:
            fwd = jax.checkpoint(fwd, policy=policy)

        def loss_fn(params, x, seg):
            xb = x.astype(jnp.bfloat16) / 255.0
            det_feats, seg_out, _ = fwd(params, xb)
            det_total, _ = det_loss(det_feats, tgt, msk)
            seg_l = segmentation_loss(seg_out, seg)
            return 0.14 * det_total + 1.0 * seg_l

        def g(x, seg):
            loss, grads = jax.value_and_grad(loss_fn)(params0, x, seg)
            return loss + sum(
                jnp.sum(v).astype(jnp.float32)
                for v in jax.tree.leaves(grads)) * 0.0

        return timed(g, mk)

    for B in (64, 128):
        for use_ckpt, name in ((False, "grad_base"), (True, "grad_convsave")):
            try:
                t = run(B, use_ckpt)
                print(f"b{B:<4d}{name:16s} {t*1e3:8.2f} ms  {B/t:8.1f} img/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"b{B:<4d}{name:16s} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
