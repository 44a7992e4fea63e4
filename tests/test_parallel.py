"""Data-parallel correctness: the jitted train step over an 8-device mesh
must produce the same loss/params as a single device on the same global
batch (XLA collectives + global-batch BN vs local compute)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.losses import DetectionLoss
from desenet_tpu.models import build_model, init_model
from desenet_tpu.models.heads import Detect
from desenet_tpu.parallel import make_mesh, shard_batch
from desenet_tpu.parallel.mesh import replicate_tree
from desenet_tpu.train import create_train_state, make_train_step, one_cycle
from desenet_tpu.train.optim import OptimConfig

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host; excluded from the smoke tier

HERE = os.path.dirname(os.path.abspath(__file__))
CFG = os.path.join(HERE, "configs", "tiny_psp2.yaml")


def make_setup():
    model, spec = build_model(CFG)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    det_ls = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det_ls.args[1],
                  strides=spec.det_strides)
    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in s)
        for s in head.anchors_grid_units()
    )
    loss_fn = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    opt = OptimConfig(lr0=0.01)
    step = make_train_step(model, loss_fn, opt, one_cycle(1, 0.2, 10),
                           nb=4, warmup_iters=2, nominal_bs=8, batch_size=8,
                           donate=False)
    return model, variables, opt, step


def make_batch(rng, b=8, s=64):
    img = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
    tg = np.zeros((b, 8, 5), np.float32)
    mask = np.zeros((b, 8), bool)
    tg[:, 0] = [0, 0.5, 0.5, 0.4, 0.3]
    mask[:, 0] = True
    seg = rng.integers(0, 2, (b, s, s)).astype(np.int32)
    return {"image": img, "det_targets": tg, "det_mask": mask,
            "seg_labels": seg}


def _assert_tree_close(t1, t2, atol):
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    model, variables, opt, step = make_setup()
    batch_np = make_batch(np.random.default_rng(0))
    rng = jax.random.PRNGKey(3)

    # single device
    state1 = create_train_state(variables, opt)
    state1, m1 = step(state1, jax.tree.map(jnp.asarray, batch_np), rng)

    # 8-device data-parallel
    mesh = make_mesh(8)
    state8 = create_train_state(variables, opt)
    state8 = replicate_tree(state8, mesh)
    state8, m8 = step(state8, shard_batch(batch_np, mesh), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    # sharded collectives reduce in a different order than the single-device
    # fusion — fp32 noise of ~1e-5 on post-step params is expected
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # batch_stats must also agree: global-batch BN == SyncBN semantics
    for a, b in zip(jax.tree.leaves(state1.batch_stats),
                    jax.tree.leaves(state8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_sharded_step_matches_single_device():
    """4x2 (data x spatial) mesh: images/labels split over batch AND height;
    GSPMD inserts the conv halo exchanges and cross-shard BN reductions. The
    train step must match the single-device result — spatial partitioning is
    a layout choice, not a semantic one. 128px: the deepest feature map
    (stride 32 -> 4 rows) keeps 2 rows per spatial shard, the validity floor
    (parallel/mesh.py check_spatial)."""
    from desenet_tpu.parallel.mesh import SPATIAL_AXIS, check_spatial

    model, variables, opt, step = make_setup()
    batch_np = make_batch(np.random.default_rng(0), b=8, s=128)
    rng = jax.random.PRNGKey(3)

    state1 = create_train_state(variables, opt)
    state1, m1 = step(state1, jax.tree.map(jnp.asarray, batch_np), rng)

    mesh = make_mesh(8, spatial=2)
    assert mesh.shape == {"data": 4, SPATIAL_AXIS: 2}
    check_spatial(mesh, 128)
    state_s = create_train_state(variables, opt)
    state_s = replicate_tree(state_s, mesh)
    sharded = shard_batch(batch_np, mesh)
    # the image really is split over height: each device holds (2, 64, 128, 3)
    shard_shapes = {s.data.shape for s in sharded["image"].addressable_shards}
    assert shard_shapes == {(2, 64, 128, 3)}
    state_s, ms = step(state_s, sharded, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(ms["loss"]),
                               rtol=1e-5)
    _assert_tree_close(state1.params, state_s.params, 2e-4)
    _assert_tree_close(state1.batch_stats, state_s.batch_stats, 2e-4)

    # below the validity floor the mesh is rejected up front
    with pytest.raises(ValueError, match="below"):
        check_spatial(make_mesh(8, spatial=2), 64)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_sharded_eval_forward_matches():
    """Eval forward (decode + seg logits) under a 4x2 data x spatial mesh
    equals the single-device forward — the inference-side SP path (batch too
    small to fill a slice with pure DP)."""
    from desenet_tpu.parallel.mesh import spatial_sharding

    model, variables, opt, _ = make_setup()
    imgs = np.random.default_rng(5).uniform(0, 1, (4, 128, 128, 3)).astype(
        np.float32)
    mesh = make_mesh(8, spatial=2)

    @jax.jit
    def fwd(v, img):
        (dec, feats), seg = model.apply(v, img, train=False)
        return dec, seg

    d1, s1 = fwd(variables, jnp.asarray(imgs))
    sharded = jax.device_put(jnp.asarray(imgs), spatial_sharding(mesh))
    ds, ss = fwd(replicate_tree(variables, mesh), sharded)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(d1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(s1),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_grad_accumulation_under_sharding():
    """Multi-step run with accumulate=2 (nominal_bs=2*batch): the stepped
    cadence, accumulated grads, params, EMA and opt state must all match
    between the 8-device mesh and a single device (reference accumulation
    loop: train.py:332-340, 370-376)."""
    model, variables, opt, _ = make_setup()
    det_ls_step = make_train_step
    # warmup 0 so accumulate is exactly nominal_bs/batch_size == 2 from ni=0
    from desenet_tpu.losses import DetectionLoss
    from desenet_tpu.models import build_model
    from desenet_tpu.models.heads import Detect

    _, spec = build_model(CFG)
    det_ls = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det_ls.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in s)
                    for s in head.anchors_grid_units())
    loss_fn = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    step = det_ls_step(model, loss_fn, opt, one_cycle(1, 0.2, 10),
                       nb=8, warmup_iters=0, nominal_bs=16, batch_size=8,
                       donate=False)

    rngs = [jax.random.PRNGKey(i) for i in range(4)]
    batches = [make_batch(np.random.default_rng(i)) for i in range(4)]

    state1 = create_train_state(variables, opt)
    stepped1 = []
    for b, r in zip(batches, rngs):
        state1, m = step(state1, jax.tree.map(jnp.asarray, b), r)
        stepped1.append(int(m["stepped"]))

    mesh = make_mesh(8)
    state8 = replicate_tree(create_train_state(variables, opt), mesh)
    stepped8 = []
    for b, r in zip(batches, rngs):
        state8, m = step(state8, shard_batch(b, mesh), r)
        stepped8.append(int(m["stepped"]))

    # accumulate==2: optimizer applies on every second micro-batch (the
    # first fires at ni=0 because last_opt_step starts one interval behind)
    assert stepped1 == stepped8
    assert stepped1 == [1, 0, 1, 0]
    _assert_tree_close(state1.params, state8.params, 5e-4)
    # raw (unnormalized) grad sums carry the largest reduction-order noise
    _assert_tree_close(state1.accum_grads, state8.accum_grads, 3e-3)
    _assert_tree_close(state1.ema_params, state8.ema_params, 5e-4)
    _assert_tree_close(state1.batch_stats, state8.batch_stats, 5e-4)
    assert int(state1.ema_updates) == int(state8.ema_updates)
    assert int(state1.last_opt_step) == int(state8.last_opt_step)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ema_eval_forward_matches_under_sharding():
    """EMA-params eval forward (the val-during-train path) over a sharded
    batch equals the single-device result — including on an uneven final
    batch where only 3 of 8 rows are real images (fixed-shape collate pads;
    padding rows must not change real rows' outputs)."""
    model, variables, opt, step = make_setup()
    batch = make_batch(np.random.default_rng(1))
    # train one step so EMA differs from init
    state1 = create_train_state(variables, opt)
    state1, _ = step(state1, jax.tree.map(jnp.asarray, batch),
                     jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    state8 = replicate_tree(create_train_state(variables, opt), mesh)
    state8, _ = step(state8, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    # uneven final batch: 3 real rows, 5 zero-pad rows
    imgs = np.zeros((8, 64, 64, 3), np.float32)
    imgs[:3] = np.random.default_rng(2).uniform(0, 1, (3, 64, 64, 3))

    def ema_fwd(state, x):
        (dec, _), seg = model.apply(
            {"params": state.ema_params,
             "batch_stats": state.ema_batch_stats},
            x, train=False)
        return dec, seg

    fwd = jax.jit(ema_fwd)
    d1, s1 = fwd(state1, jnp.asarray(imgs))
    sharded = jax.device_put(
        jnp.asarray(imgs), jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))
    d8, s8 = fwd(state8, sharded)
    np.testing.assert_allclose(np.asarray(d1)[:3], np.asarray(d8)[:3],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s1)[:3], np.asarray(s8)[:3],
                               atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_uneven_final_batch_pad_and_eval():
    """An uneven final batch (n=5 on an 8-device mesh) pads to the mesh size
    and a sharded eval forward runs; the valid rows match the unsharded
    forward exactly (pad rows are repeats, reductions masked by n_valid)."""
    from desenet_tpu.parallel.mesh import pad_batch_for_mesh

    model, variables, opt, step = make_setup()
    rng = np.random.default_rng(3)
    batch = make_batch(rng, b=5)
    mesh = make_mesh(8)
    padded, n_valid = pad_batch_for_mesh(batch, mesh)
    assert n_valid == 5
    assert all(v.shape[0] == 8 for v in jax.tree.leaves(padded))
    # pad rows are copies of the last valid row
    np.testing.assert_array_equal(padded["image"][5], batch["image"][4])

    sharded = shard_batch(padded, mesh)
    var_r = replicate_tree(variables, mesh)

    @jax.jit
    def fwd(v, img):
        (dec, feats), seg = model.apply(v, img, train=False)
        return dec, seg

    dec_s, seg_s = fwd(var_r, sharded["image"])
    dec_1, seg_1 = fwd(variables, jnp.asarray(batch["image"]))
    np.testing.assert_allclose(np.asarray(dec_s)[:n_valid],
                               np.asarray(dec_1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(seg_s)[:n_valid],
                               np.asarray(seg_1), rtol=2e-5, atol=2e-5)

    # already-even batches pass through untouched
    same, n = pad_batch_for_mesh(make_batch(rng, b=8), mesh)
    assert n == 8 and same["image"].shape[0] == 8
