"""Fused tiled upsample+CE (ops/seg_ce.py) must reproduce the literal
reference objective — CE against the 8x align_corners=True bilinear
upsample of the seg logits (/root/reference/core/models/yolo.py:170-183,
core/utils/loss.py:242-243) — in both value and gradient, without
materializing the full-resolution map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desenet_tpu.losses.segmentation import _ce
from desenet_tpu.ops.resize import resize_bilinear
from desenet_tpu.ops.seg_ce import _row_blocks, upsampled_ce


def _composition(z, y, out_hw, ignore_index=-1, class_weight=None):
    return _ce(resize_bilinear(z, out_hw, align_corners=True), y,
               ignore_index=ignore_index, class_weight=class_weight)


# grad tolerance: f32 is summation-order-only (~1e-7 rel); bf16 allows ~2
# ulp of the grad scale — the unfused path rounds dz to bf16 between its
# two chained VJP contractions while the fused path accumulates partial dz
# blocks in f32 (strictly MORE precise), so bitwise equality is impossible
@pytest.mark.parametrize("dtype,tol,gtol", [(jnp.float32, 5e-7, 5e-7),
                                            (jnp.bfloat16, 5e-7, 2.0**-6)])
def test_loss_and_grad_match_composition(rng, dtype, tol, gtol):
    B, h, w, C, S = 2, 10, 12, 3, 8
    z = jnp.asarray(rng.normal(0, 2, (B, h, w, C)), dtype)
    y = jnp.asarray(rng.integers(0, C, (B, h * S, w * S)), jnp.int32)
    out_hw = (h * S, w * S)

    l_ref, g_ref = jax.value_and_grad(
        lambda z: _composition(z, y, out_hw))(z)
    l_fus, g_fus = jax.value_and_grad(
        lambda z: upsampled_ce(z, y, out_hw, True, -1, None, 16))(z)

    assert np.isclose(float(l_ref), float(l_fus), rtol=tol)
    d = np.abs(np.asarray(g_ref, np.float32) - np.asarray(g_fus, np.float32))
    ref_scale = np.abs(np.asarray(g_ref, np.float32)).max()
    assert d.max() <= max(gtol * ref_scale, 1e-9), (d.max(), ref_scale)


def test_ignore_index_and_class_weight(rng):
    B, h, w, C, S = 2, 8, 8, 4, 8
    z = jnp.asarray(rng.normal(0, 1, (B, h, w, C)), jnp.float32)
    y = np.asarray(rng.integers(0, C, (B, h * S, w * S)), np.int32)
    y[0, :17] = -1  # ignored band
    y = jnp.asarray(y)
    cw = jnp.asarray([1.0, 2.0, 0.5, 1.5])
    out_hw = (h * S, w * S)

    l_ref, g_ref = jax.value_and_grad(
        lambda z: _composition(z, y, out_hw, class_weight=cw))(z)
    l_fus, g_fus = jax.value_and_grad(
        lambda z: upsampled_ce(z, y, out_hw, True, -1, cw, 16))(z)
    assert np.isclose(float(l_ref), float(l_fus), rtol=1e-6)
    assert np.allclose(np.asarray(g_ref), np.asarray(g_fus), atol=1e-9)


def test_non_divisible_rows_pick_valid_blocking(rng):
    # h_out=88 with row_target 64 -> nblk must divide 88 (2 blocks of 44)
    assert 88 % _row_blocks(88, 64) == 0
    assert 640 % _row_blocks(640, 64) == 0 and _row_blocks(640, 64) == 10
    B, h, w, C, S = 1, 11, 11, 3, 8
    z = jnp.asarray(rng.normal(0, 1, (B, h, w, C)), jnp.float32)
    y = jnp.asarray(rng.integers(0, C, (B, h * S, w * S)), jnp.int32)
    out_hw = (h * S, w * S)
    l_ref = _composition(z, y, out_hw)
    l_fus = upsampled_ce(z, y, out_hw, True, -1, None, 64)
    assert np.isclose(float(l_ref), float(l_fus), rtol=1e-6)


def test_train_step_fused_vs_materialized(rng):
    """End-to-end: a train step on the seg_upsample=False model with the
    fused loss must match the full-res model + literal CE (same params,
    same batch) in loss components and updated parameters."""
    import jax.numpy as jnp

    from desenet_tpu.losses import DetectionLoss
    from desenet_tpu.models import build_model, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.train import create_train_state, make_train_step, \
        one_cycle
    from desenet_tpu.train.optim import OptimConfig
    from tests.test_parallel import CFG, make_batch

    def setup(seg_upsample):
        model, spec = build_model(CFG, seg_upsample=seg_upsample)
        variables = init_model(model, jax.random.PRNGKey(0), img_size=64,
                               batch=1)
        det_ls = spec.layers[spec.det_layer]
        head = Detect(nc=spec.de_nc, anchors=det_ls.args[1],
                      strides=spec.det_strides)
        anchors = tuple(tuple(tuple(float(v) for v in a) for a in s)
                        for s in head.anchors_grid_units())
        loss_fn = DetectionLoss(anchors=anchors, nc=spec.de_nc)
        opt = OptimConfig(lr0=0.01)
        step = make_train_step(model, loss_fn, opt, one_cycle(1, 0.2, 10),
                               nb=4, warmup_iters=2, nominal_bs=8,
                               batch_size=8, donate=False)
        return variables, opt, step

    batch = {k: jnp.asarray(v)
             for k, v in make_batch(np.random.default_rng(3), b=4).items()}
    results = []
    for seg_upsample in (True, False):
        variables, opt, step = setup(seg_upsample)
        state = create_train_state(variables, opt)
        state, metrics = step(state, dict(batch), jax.random.PRNGKey(1))
        results.append((state, metrics))

    (s_full, m_full), (s_fused, m_fused) = results
    assert np.isclose(float(m_full["lseg"]), float(m_fused["lseg"]),
                      rtol=1e-5)
    assert np.isclose(float(m_full["loss"]), float(m_fused["loss"]),
                      rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(s_full.params),
                      jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(pa, np.float32),
                                   np.asarray(pb, np.float32),
                                   rtol=2e-5, atol=2e-6)
