"""Phase-layout (space-to-depth-4) stem: exact-equivalence vs the standard
stem, same parameter tree (models/layers.py PhaseStemA/B, PERF.md stem
finding; derivation tools/probe_stem_s2d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desenet_tpu.models import build_model, init_model, config_path
from desenet_tpu.ops.s2d import space_to_depth4, space_to_depth4_np


def _models(dtype=jnp.float32, **kw):
    cfg = config_path("yolov5s_seg")
    base, _ = build_model(cfg, dtype=dtype, **kw)
    phase, _ = build_model(cfg, dtype=dtype, stem_s2d=True, **kw)
    return base, phase


def test_param_tree_identical():
    base, phase = _models()
    vb = init_model(base, jax.random.PRNGKey(0), img_size=64, batch=1)
    vp = init_model(phase, jax.random.PRNGKey(0), img_size=64, batch=1)
    sb = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype.name), vb)
    sp = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype.name), vp)
    assert sb == sp


def test_np_jnp_s2d_agree():
    x = np.random.default_rng(0).random((2, 8, 12, 3)).astype(np.float32)
    np.testing.assert_array_equal(space_to_depth4_np(x),
                                  np.asarray(space_to_depth4(jnp.asarray(x))))
    # single image (no batch dim)
    np.testing.assert_array_equal(
        space_to_depth4_np(x[0]),
        np.asarray(space_to_depth4(jnp.asarray(x[:1])))[0])


def test_eval_forward_equivalent():
    base, phase = _models()
    v = init_model(base, jax.random.PRNGKey(1), img_size=64, batch=1)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    (dec_b, _), seg_b = base.apply(v, x, train=False)
    (dec_p, _), seg_p = phase.apply(v, space_to_depth4(x), train=False)
    np.testing.assert_allclose(np.asarray(dec_p), np.asarray(dec_b),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(seg_p), np.asarray(seg_b),
                               rtol=2e-4, atol=2e-5)


def test_train_forward_and_bn_stats_equivalent():
    base, phase = _models()
    v = init_model(base, jax.random.PRNGKey(1), img_size=64, batch=1)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    (det_b, seg_b), mut_b = base.apply(v, x, train=True,
                                       mutable=["batch_stats"])
    (det_p, seg_p), mut_p = phase.apply(v, space_to_depth4(x), train=True,
                                        mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves((det_b, seg_b)),
                    jax.tree_util.tree_leaves((det_p, seg_p))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-4)
    # running stats sit near zero after one step: fp32 reassociation of the
    # stem conv (same sums, different order) leaves ~1e-4 abs noise there,
    # so gate them on abs error, not rel
    for a, b in zip(jax.tree_util.tree_leaves(mut_b),
                    jax.tree_util.tree_leaves(mut_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_grads_equivalent_stem_local():
    """Stem-local grad exactness. A full-graph comparison is meaningless
    here: at init with batch-1 train-mode BN the graph is chaotic (a 1e-6
    input perturbation moves downstream BN-scale grads by ~10 on the
    UNMODIFIED model), so any fp32 reassociation noise scatters grads.
    The rewrite is exact as a function — verified to 1e-12 in f64 — so
    exactness of the stem chain (params + BN, train mode) is the real
    contract."""
    import flax.linen as nn
    import desenet_tpu.models.layers as L

    class BaseStem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = L.ConvBnAct(32, 6, 2, 2, name="l0")(x, train)
            return L.ConvBnAct(64, 3, 2, name="l1")(x, train)

    class PhaseStem(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = L.PhaseStemA(c2=32, ci=3, name="l0")(x, train)
            return L.PhaseStemB(c2=64, ci=32, name="l1")(x, train)

    b, p = BaseStem(), PhaseStem()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = b.init(jax.random.PRNGKey(1), x)

    def loss(params, model, inp):
        y, _ = model.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           inp, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(y))

    gb = jax.grad(loss)(v["params"], b, x)
    gp = jax.grad(loss)(v["params"], p, space_to_depth4(x))
    keystr = jax.tree_util.keystr
    for (kb, a), (kp, g) in zip(
            jax.tree_util.tree_leaves_with_path(gb),
            jax.tree_util.tree_leaves_with_path(gp)):
        assert keystr(kb) == keystr(kp)
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-4, err_msg=keystr(kb))


def test_rejects_non_matching_config():
    cfg = {
        "de_nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[-1], 1, "Detect", [2, "anchors"]]],
    }
    model, _ = build_model(cfg, stem_s2d=True)
    with pytest.raises(ValueError, match="stem_s2d"):
        init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
