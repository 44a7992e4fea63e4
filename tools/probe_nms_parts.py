"""Split NMS cost: candidate prep (top_k prefilter) vs greedy loop, and test
cheaper prefilters (approx_max_k at recall 1.0 / 0.99).

b128, 25200 anchors, nc=6 single-label (the production detect path).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, A, NC = 128, 25200, 6
K = 1024
ITERS = 8


def timed(fn, mk):
    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda a: jax.lax.scan(
        lambda c, x: (c + fn(x), None), 0.0, a)[0])
    float(jitted(warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / ITERS


def mk(key):
    d = jax.random.uniform(key, (ITERS, B, A, 5 + NC), jnp.float32)
    return d.at[..., :2].mul(640.0).at[..., 2:4].mul(64.0)


def main():
    from desenet_tpu.ops.boxes import xywh2xyxy
    from desenet_tpu.ops.nms import _prep_candidates, non_max_suppression
    from desenet_tpu.ops.nms_pallas import greedy_nms_pallas
    import functools

    prep = functools.partial(_prep_candidates, conf_thres=0.25, pre_topk=K,
                             multi_label=False, nc=NC)

    def prep_only(pred):
        tb, ts, ci = jax.vmap(prep)(pred)
        return tb.sum() + ts.sum() + ci.sum()

    def full(pred):
        r = non_max_suppression(pred, 0.25, 0.45, 300, K)
        return r.boxes.sum() + r.scores.sum() + r.num.sum().astype(jnp.float32)

    def prep_approx(pred):
        obj = pred[..., 4]
        cls_conf = pred[..., 5:] * obj[..., None]
        best = jnp.max(cls_conf, -1)
        sc = jnp.where((obj > 0.25) & (best > 0.25), best, -1.0)
        ts, idx = jax.lax.approx_max_k(sc, K, recall_target=0.99)
        box = xywh2xyxy(pred[..., :4])
        tb = jnp.take_along_axis(box, idx[..., None], axis=1)
        return tb.sum() + ts.sum()

    def prep_approx_exact(pred):
        obj = pred[..., 4]
        cls_conf = pred[..., 5:] * obj[..., None]
        best = jnp.max(cls_conf, -1)
        sc = jnp.where((obj > 0.25) & (best > 0.25), best, -1.0)
        ts, idx = jax.lax.approx_max_k(sc, K, recall_target=1.0)
        box = xywh2xyxy(pred[..., :4])
        tb = jnp.take_along_axis(box, idx[..., None], axis=1)
        return tb.sum() + ts.sum()

    for name, f in (("prep_topk", prep_only), ("prep_approx99", prep_approx),
                    ("prep_approx100", prep_approx_exact), ("full_nms", full)):
        t = timed(f, mk)
        print(f"{name:16s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
