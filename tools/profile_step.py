"""Profile the train step's fwd/bwd/optimizer split on the real TPU.

`jax.profiler` traces do not survive the axon tunnel, so this uses the two
tools that do (ROADMAP.md "Performance"):
  - AOT `compiled.cost_analysis()` for FLOPs + HBM bytes accessed, and
  - ablation timing: compile nested prefixes of the step program
      fwd_infer  (b128, eval-mode forward only)
      fwd_train  (b64, train-mode forward + loss, no grad)
      grad       (b64, value_and_grad, no optimizer/EMA)
      full_step  (b64, the production make_train_step program)
    and difference their steady-state times (bwd = grad - fwd_train, etc.).

Timing methodology follows bench.py: per-iteration distinct on-device inputs
(the tunnel replays identical (executable, args) pairs) and an in-jit
lax.scan chain with one host sync (per-call dispatch pays ~30-70 ms RTT).

Writes a JSON report to stdout; PERF.md is derived from it.

Reference analog of the measured loop: /root/reference/scripts/train.py:322-376.
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
ITERS_INFER = 8
ITERS_TRAIN = 4


def steady_time(chain_fn, make_args, iters):
    """Compile+warm on one arg set, time a distinct one (replay cache)."""
    warm = jax.block_until_ready(make_args(jax.random.PRNGKey(3)))
    float(chain_fn(*warm))  # compile + warm (float() = the one host sync)
    args = jax.block_until_ready(make_args(jax.random.PRNGKey(7)))
    t0 = time.perf_counter()
    float(chain_fn(*args))
    return (time.perf_counter() - t0) / iters


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {
        "gflops": round(c.get("flops", 0.0) / 1e9, 1),
        "hbm_gb": round(c.get("bytes accessed", 0.0) / 1e9, 2),
    }


def main():
    from desenet_tpu.losses import DetectionLoss, segmentation_loss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.train import create_train_state, make_train_step, one_cycle
    from desenet_tpu.train.optim import OptimConfig

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE, batch=1)

    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1], strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)

    report = {}

    # ---- eval-mode forward (inference workload, no NMS) ----
    def fwd_infer(variables, x):
        (dec, feats), seg = model.apply(variables, x, train=False)
        return dec.sum().astype(jnp.float32) + seg.sum(dtype=jnp.float32)

    def mk_infer(key):
        return (variables, jax.random.uniform(
            key, (ITERS_INFER, B_INFER, SIZE, SIZE, 3), jnp.bfloat16))

    @jax.jit
    def chain_infer(variables, xs):
        def body(c, x):
            return c + fwd_infer(variables, x), None
        return jax.lax.scan(body, 0.0, xs)[0]

    report["fwd_infer_b128"] = cost(fwd_infer, variables,
                                    jnp.zeros((B_INFER, SIZE, SIZE, 3),
                                              jnp.bfloat16))
    t = steady_time(chain_infer, mk_infer, ITERS_INFER)
    report["fwd_infer_b128"].update(ms=round(t * 1e3, 2),
                                    img_s=round(B_INFER / t, 1))
    print("fwd_infer done", report["fwd_infer_b128"], flush=True)

    # ---- train-mode forward + loss (no grad) ----
    def make_batch_host(seed, iters):
        rng = np.random.default_rng(seed)
        tgt = np.tile(np.asarray([[0, 0.5, 0.5, 0.4, 0.3]], np.float32),
                      (iters, B_TRAIN, 8, 1))
        msk = np.tile(np.asarray([[True] * 4 + [False] * 4]),
                      (iters, B_TRAIN, 1))
        seg = rng.integers(0, spec.se_nc, (iters, B_TRAIN, SIZE // 8, SIZE // 8
                                           )).astype(np.int32)
        # seg labels at full res: upsample on device to avoid a 400 MB
        # host->device transfer through the tunnel
        return tgt, msk, seg

    tgt_np, msk_np, seg_np = make_batch_host(0, ITERS_TRAIN)
    tgt, msk, seg_small = map(jnp.asarray, (tgt_np, msk_np, seg_np))

    def mk_train(key):
        xs = jax.random.uniform(
            key, (ITERS_TRAIN, B_TRAIN, SIZE, SIZE, 3), jnp.float32)
        segs = jnp.repeat(jnp.repeat(seg_small, 8, axis=-2), 8, axis=-1)
        return jax.block_until_ready((xs, jax.block_until_ready(segs)))

    def loss_only(params, batch_stats, x, tgt_i, msk_i, seg_i):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        det_feats, seg_out = out
        det_total, comps = det_loss(det_feats, tgt_i, msk_i)
        seg_l = segmentation_loss(seg_out, seg_i, aux_weight=0.1)
        return 0.14 * det_total + seg_l, mut["batch_stats"]

    params0, bs0 = variables["params"], variables["batch_stats"]

    @jax.jit
    def chain_fwd_train(xs, segs):
        def body(c, inp):
            x, t_i, m_i, s_i = inp
            l, _ = loss_only(params0, bs0, x, t_i, m_i, s_i)
            return c + l, None
        return jax.lax.scan(body, 0.0, (xs, tgt, msk, segs))[0]

    report["fwd_train_b64"] = cost(
        lambda x, t_i, m_i, s_i: loss_only(params0, bs0, x, t_i, m_i, s_i)[0],
        jnp.zeros((B_TRAIN, SIZE, SIZE, 3), jnp.float32), tgt[0], msk[0],
        jnp.zeros((B_TRAIN, SIZE, SIZE), jnp.int32))
    t = steady_time(chain_fwd_train, mk_train, ITERS_TRAIN)
    report["fwd_train_b64"].update(ms=round(t * 1e3, 2),
                                   img_s=round(B_TRAIN / t, 1))
    print("fwd_train done", report["fwd_train_b64"], flush=True)

    # ---- value_and_grad (no optimizer) ----
    def vg(params, x, t_i, m_i, s_i):
        (l, _), g = jax.value_and_grad(
            lambda p: loss_only(p, bs0, x, t_i, m_i, s_i), has_aux=True
        )(params)
        return l, g

    @jax.jit
    def chain_grad(xs, segs):
        def body(c, inp):
            x, t_i, m_i, s_i = inp
            l, g = vg(params0, x, t_i, m_i, s_i)
            leaves = jax.tree.leaves(jax.tree.map(
                lambda a: a.sum().astype(jnp.float32), g))
            return c + l + sum(leaves), None
        return jax.lax.scan(body, 0.0, (xs, tgt, msk, segs))[0]

    def vg_digest(x, t_i, m_i, s_i):
        l, g = vg(params0, x, t_i, m_i, s_i)
        return l + sum(jax.tree.leaves(jax.tree.map(
            lambda a: a.sum().astype(jnp.float32), g)))

    report["grad_b64"] = cost(
        vg_digest,
        jnp.zeros((B_TRAIN, SIZE, SIZE, 3), jnp.float32), tgt[0], msk[0],
        jnp.zeros((B_TRAIN, SIZE, SIZE), jnp.int32))
    t = steady_time(chain_grad, mk_train, ITERS_TRAIN)
    report["grad_b64"].update(ms=round(t * 1e3, 2),
                              img_s=round(B_TRAIN / t, 1))
    print("grad done", report["grad_b64"], flush=True)

    # ---- full production train step ----
    opt_cfg = OptimConfig(lr0=0.01)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(model, det_loss, opt_cfg, one_cycle(1, 0.2, 10),
                           nb=100, warmup_iters=0, nominal_bs=B_TRAIN,
                           batch_size=B_TRAIN, donate=False, compiler_options=None)

    @jax.jit
    def chain_step(state, xs, segs):
        def body(st, inp):
            x, t_i, m_i, s_i = inp
            batch = {"image": x, "det_targets": t_i, "det_mask": m_i,
                     "seg_labels": s_i}
            st, metrics = step(st, batch, jax.random.PRNGKey(0))
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, (xs, tgt, msk, segs))
        return losses.sum()

    def mk_step(key):
        xs, segs = mk_train(key)
        return (state, xs, segs)

    batch1 = {"image": jnp.zeros((B_TRAIN, SIZE, SIZE, 3), jnp.float32),
              "det_targets": tgt[0], "det_mask": msk[0],
              "seg_labels": jnp.zeros((B_TRAIN, SIZE, SIZE), jnp.int32)}
    report["full_step_b64"] = cost(
        lambda st, b: step(st, b, jax.random.PRNGKey(0))[1]["loss"],
        state, batch1)
    t = steady_time(chain_step, mk_step, ITERS_TRAIN)
    report["full_step_b64"].update(ms=round(t * 1e3, 2),
                                   img_s=round(B_TRAIN / t, 1))
    print("full_step done", report["full_step_b64"], flush=True)

    # ---- derived split ----
    report["split_ms"] = {
        "forward+loss": report["fwd_train_b64"]["ms"],
        "backward": round(report["grad_b64"]["ms"]
                          - report["fwd_train_b64"]["ms"], 2),
        "optimizer+ema+accum": round(report["full_step_b64"]["ms"]
                                     - report["grad_b64"]["ms"], 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
