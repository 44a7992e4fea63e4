"""Bound the BN-stat and C3-layout costs in the b64 train grad.

Variants (grad of sum-digest of train-mode forward, no losses):
  base         fused C3, BN batch stats (what profile_ablate measured)
  bn_frozen    BN running-average mode inside train forward (NOT a semantics
               we can ship — SyncBN parity requires batch stats — but it
               bounds what a cheaper stat implementation could buy)
  unfused      unfused C3 layout (what the engine ships for training)
  remat        fused C3 with jax.checkpoint over the whole model apply
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 640
B = 64
ITERS = 4


def timed(fn, mk, iters=ITERS):
    warm = jax.block_until_ready(mk(jax.random.PRNGKey(3)))
    jitted = jax.jit(lambda a: jax.lax.scan(
        lambda c, x: (c + fn(x), None), 0.0, a)[0])
    float(jitted(warm))
    args = jax.block_until_ready(mk(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(jitted(args))
    return (time.perf_counter() - t0) / iters


def main():
    from desenet_tpu.models import build_model, config_path, init_model

    def mk(key):
        return jax.random.randint(key, (ITERS, B, SIZE, SIZE, 3), 0, 256,
                                  jnp.uint8)

    results = {}
    for name in ("base", "bn_frozen", "unfused", "remat"):
        fused = name != "unfused"
        model, spec = build_model(config_path("yolov5s_seg"),
                                  dtype=jnp.bfloat16, fused_csp=fused)
        variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                               batch=1)
        params0, bs0 = variables["params"], variables["batch_stats"]

        def fwd(params, x, name=name, model=model, bs0=bs0):
            x = x.astype(jnp.bfloat16) / 255.0
            train = name != "bn_frozen"
            kw = dict(train=train)
            if train:
                kw.update(mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(0)})
            out = model.apply({"params": params, "batch_stats": bs0}, x, **kw)
            out = out[0] if train else out
            (det_feats, seg_out) = out
            if not train:
                det_feats = det_feats[1]  # eval returns (decoded, feats)
            s = seg_out[0] if isinstance(seg_out, (list, tuple)) else seg_out
            return (s.sum(dtype=jnp.float32)
                    + sum(f.sum(dtype=jnp.float32) for f in det_feats))

        if name == "remat":
            fwd_inner = fwd
            fwd = jax.checkpoint(
                lambda p, x: fwd_inner(p, x),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

        def g(x, fwd=fwd, params0=params0):
            gr = jax.grad(lambda p: fwd(p, x))(params0)
            return sum(l.sum().astype(jnp.float32)
                       for l in jax.tree.leaves(gr))

        t = timed(g, mk)
        results[name] = t
        print(f"{name:12s} {t*1e3:8.2f} ms  {B/t:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
