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
