"""Component ablation profile on the real TPU: where do the ms and HBM GB go?

Variants timed (scan-chained, one host sync, distinct inputs per iter — see
bench.py methodology):

  infer  b128: full eval forward | forward w/o seg 8x-upsample tail |
               segtail (8x bilinear + argmax) alone | NMS alone
  train  b64:  fwd+loss full | fwd with low-res CE (no 8x tail) |
               fwd det-loss only | grads of each | optimizer/EMA alone

Prints a JSON report; PERF.md derives from it.
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
B_INFER = 128
B_TRAIN = 64
ITERS = 6


def timed(fn, make_args, iters=ITERS):
    """Median-free steady-state: warm on one arg set, time another."""
    warm = jax.block_until_ready(make_args(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda args: jax.lax.scan(
        lambda c, a: (c + fn(*a), None), 0.0,
        args)[0])
    float(jitted(warm))
    args = jax.block_until_ready(make_args(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"gflops": round(c.get("flops", 0.0) / 1e9, 1),
            "hbm_gb": round(c.get("bytes accessed", 0.0) / 1e9, 2)}


def main():
    from desenet_tpu.losses import DetectionLoss, segmentation_loss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.ops import non_max_suppression, PRE_TOPK_PRODUCTION
    from desenet_tpu.ops.resize import resize_bilinear

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    nseg = spec.se_nc
    print(f"de_nc={spec.de_nc} se_nc={nseg}", flush=True)

    report = {}

    def put(name, t, batch, extra=None):
        report[name] = {"ms": round(t * 1e3, 2),
                        "img_s": round(batch / t, 1)}
        if extra:
            report[name].update(extra)
        print(name, report[name], flush=True)

    # ---------------- inference side ----------------
    def mk_infer(key):
        return (jax.random.uniform(
            key, (ITERS, B_INFER, SIZE, SIZE, 3), jnp.bfloat16),)

    def full_infer(x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        return (dec.sum().astype(jnp.float32) + seg.sum(dtype=jnp.float32))

    put("infer/full_fwd", timed(full_infer, mk_infer), B_INFER,
        cost(full_infer, jnp.zeros((B_INFER, SIZE, SIZE, 3), jnp.bfloat16)))

    # seg tail alone: logits (B,80,80,C) -> 8x bilinear -> argmax -> u8
    def segtail(xlow):
        up = resize_bilinear(xlow, (SIZE, SIZE), align_corners=True)
        return jnp.argmax(up, -1).astype(jnp.uint8).sum(
            dtype=jnp.int32).astype(jnp.float32)

    def mk_low(key):
        return (jax.random.normal(
            key, (ITERS, B_INFER, SIZE // 8, SIZE // 8, nseg),
            jnp.bfloat16),)

    put("infer/segtail_up_argmax", timed(segtail, mk_low), B_INFER,
        cost(segtail,
             jnp.zeros((B_INFER, SIZE // 8, SIZE // 8, nseg), jnp.bfloat16)))

    # NMS alone on decode-shaped input
    n_anchors = 25200
    no = 5 + spec.de_nc

    def nms_only(dec):
        r = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                max_det=300, pre_topk=PRE_TOPK_PRODUCTION)
        return (r.boxes.sum() + r.scores.sum()
                + r.num.sum().astype(jnp.float32))

    def mk_dec(key):
        d = jax.random.uniform(key, (ITERS, B_INFER, n_anchors, no),
                               jnp.float32)
        # box-ish coords so NMS does real work
        return (d.at[..., :2].mul(SIZE).at[..., 2:4].mul(64.0),)

    put("infer/nms_only", timed(nms_only, mk_dec), B_INFER,
        cost(nms_only, jnp.zeros((B_INFER, n_anchors, no), jnp.float32)))

    # ---------------- training side ----------------
    params0, bs0 = variables["params"], variables["batch_stats"]
    tgt = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.4, 0.3]], jnp.float32),
                   (B_TRAIN, 8, 1))
    msk = jnp.tile(jnp.asarray([[True] * 4 + [False] * 4]), (B_TRAIN, 1))

    def mk_train(key, iters=ITERS):
        # uint8 images (the loader's wire format) — f32 at 6 iters is 7.5 GB
        # of resident input and OOMs the grad variants
        xs = jax.random.randint(key, (iters, B_TRAIN, SIZE, SIZE, 3), 0, 256,
                                jnp.uint8)
        seg = jax.random.randint(
            key, (iters, B_TRAIN, SIZE, SIZE), 0, nseg, jnp.int32)
        return xs, seg

    def apply_train(params, x):
        x = x.astype(jnp.bfloat16) / 255.0
        out, mut = model.apply(
            {"params": params, "batch_stats": bs0}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        return out, mut

    def loss_full(params, x, seg_i):
        (det_feats, seg_out), mut = apply_train(params, x)
        dt, _ = det_loss(det_feats, tgt, msk)
        return 0.14 * dt + segmentation_loss(seg_out, seg_i), mut

    def loss_det_only(params, x, seg_i):
        (det_feats, seg_out), mut = apply_train(params, x)
        dt, _ = det_loss(det_feats, tgt, msk)
        s = seg_out[0] if isinstance(seg_out, (list, tuple)) else seg_out
        return 0.14 * dt + s.sum(dtype=jnp.float32) * 0.0, mut

    def loss_seg_only(params, x, seg_i):
        (det_feats, seg_out), mut = apply_train(params, x)
        d = sum(f.sum(dtype=jnp.float32) for f in det_feats) * 0.0
        return segmentation_loss(seg_out, seg_i) + d, mut

    def fwd_only(params, x, seg_i):
        (det_feats, seg_out), mut = apply_train(params, x)
        s = seg_out[0] if isinstance(seg_out, (list, tuple)) else seg_out
        return (s.sum(dtype=jnp.float32)
                + sum(f.sum(dtype=jnp.float32) for f in det_feats)), mut

    z_x = jnp.zeros((B_TRAIN, SIZE, SIZE, 3), jnp.uint8)
    z_s = jnp.zeros((B_TRAIN, SIZE, SIZE), jnp.int32)

    for name, lf in [("fwd_full", loss_full), ("fwd_det_only", loss_det_only),
                     ("fwd_seg_only", loss_seg_only),
                     ("fwd_sum_only", fwd_only)]:
        f = lambda x, s_i, lf=lf: lf(params0, x, s_i)[0]
        put(f"train/{name}", timed(f, mk_train), B_TRAIN, cost(f, z_x, z_s))

    for name, lf in [("grad_full", loss_full), ("grad_det_only",
                                                loss_det_only),
                     ("grad_seg_only", loss_seg_only),
                     ("grad_sum_only", fwd_only)]:
        def g(x, s_i, lf=lf):
            gr = jax.grad(lambda p: lf(p, x, s_i)[0])(params0)
            return sum(l.sum().astype(jnp.float32)
                       for l in jax.tree.leaves(gr))
        put(f"train/{name}",
            timed(g, lambda k: mk_train(k, 4), iters=4), B_TRAIN,
            cost(g, z_x, z_s))

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
