"""Numeric parity of the compiled flax model vs reference-PyTorch goldens.

Goldens were produced by tools/gen_goldens.py (tiny width-0.125 models, every
seg-head variant, eval mode, 64px input). These exercise every module in the
shipped graphs: Focus/Conv/C3/SPP/PANet neck/Detect decode + the seg heads
(ACSP/RFB2/ASPP/PyramidPooling/FFM/C3SPP and the bilinear/nearest resamples).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from desenet_tpu.models import build_model, init_model
from desenet_tpu.models.build import LayerSpec, ModelSpec
from desenet_tpu.models.heads import SegMaskBiSe
from desenet_tpu.utils.torch_convert import convert_state_dict

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "goldens")
CFG = os.path.join(HERE, "configs")


def load_golden(name):
    with np.load(os.path.join(GOLD, name)) as z:
        sd = {k[4:]: z[k] for k in z.files if k.startswith("sd__")}
        rest = {k: z[k] for k in z.files if not k.startswith("sd__")}
    return sd, rest


@pytest.mark.parametrize("head", ["psp2", "psp", "lab", "base"])
def test_full_model_parity(head):
    sd, ref = load_golden(f"tiny_{head}.npz")
    model, spec = build_model(os.path.join(CFG, f"tiny_{head}.yaml"))
    template = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    variables, report = convert_state_dict(sd, template, spec)
    assert not report["missing"], report["missing"][:5]

    x = np.transpose(ref["x"], (0, 2, 3, 1))  # NCHW -> NHWC
    (dec, feats), seg = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(dec), ref["dec"], atol=2e-5)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(feats[i]), ref[f"feat{i}"], atol=2e-5
        )
    seg_nchw = np.transpose(np.asarray(seg), (0, 3, 1, 2))
    np.testing.assert_allclose(seg_nchw, ref["seg"], atol=2e-5)


def test_bise_head_parity():
    """SegMaskBiSe standalone (the reference can't build it from yaml —
    parse_model omits it, yolo.py:477 — a documented quirk)."""
    sd, ref = load_golden("head_bise.npz")

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, xs, train=False):
            return SegMaskBiSe(n_segcls=2, n=1, c_hid=32, name="l0")(xs, train)

    xs = [np.transpose(ref[f"x{i}"], (0, 2, 3, 1)) for i in range(3)]
    wrap = Wrap()
    template = wrap.init(jax.random.PRNGKey(0), [jnp.asarray(v) for v in xs])

    spec = ModelSpec(
        layers=(LayerSpec(0, (-1,), "SegMaskBiSe", (2, 1, 32, False), 2, 8),),
        save=(), de_nc=0, se_nc=2, anchors=((),), det_strides=(),
        det_layer=-1, seg_layer=0,
    )
    tsd = {f"model.0.{k}": v for k, v in sd.items()}
    variables, report = convert_state_dict(tsd, template, spec)
    assert not report["missing"], report["missing"][:5]

    seg = wrap.apply(variables, [jnp.asarray(v) for v in xs])
    seg_nchw = np.transpose(np.asarray(seg), (0, 3, 1, 2))
    np.testing.assert_allclose(seg_nchw, ref["seg"], atol=2e-5)


def test_unused_keys_are_only_quirk_bns():
    """Conversion must account for every torch tensor except the documented
    never-executed BN layers (Conv 1x1-map BN skip, common.py:53)."""
    sd, _ = load_golden("tiny_psp2.npz")
    model, spec = build_model(os.path.join(CFG, "tiny_psp2.yaml"))
    template = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    _, report = convert_state_dict(sd, template, spec)
    for k in report["unused_torch_keys"]:
        assert "branch_global" in k or "conv1.bn" in k or "branch4" in k, k


def test_fused_unfused_c3_equivalence():
    """Fused (cv12) and unfused (cv1/cv2) C3 layouts are exactly equivalent
    through the checkpoint migrations in both directions."""
    import jax.numpy as jnp
    from desenet_tpu.utils.checkpoint import defuse_c3, migrate_unfused_c3

    cfg = os.path.join(CFG, "tiny_psp2.yaml")
    m_f, _ = build_model(cfg, fused_csp=True)
    m_u, _ = build_model(cfg, fused_csp=False)
    v_f = init_model(m_f, jax.random.PRNGKey(3), img_size=64, batch=1)
    v_u = defuse_c3({"params": v_f["params"],
                     "batch_stats": v_f["batch_stats"]})

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3))
                    .astype(np.float32))
    (dec_f, _), seg_f = m_f.apply(v_f, x, train=False)
    (dec_u, _), seg_u = m_u.apply(v_u, x, train=False)
    np.testing.assert_allclose(np.asarray(dec_f), np.asarray(dec_u),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_f), np.asarray(seg_u),
                               atol=1e-5)

    # roundtrip back to fused
    v_rt = migrate_unfused_c3(v_u)
    for a, b in zip(jax.tree.leaves(v_f["params"]),
                    jax.tree.leaves(v_rt["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_conv_grad_bf16():
    """The split-conv (implicit concat) path must be differentiable at bf16:
    a preferred_element_type=f32 partial-conv output would make AD's
    transpose convs mixed-dtype (regression: engine train failed on
    yolov5s_seg bf16 while all f32/tiny-config tests passed)."""
    import jax
    import jax.numpy as jnp

    from desenet_tpu.models.layers import ConvBnAct

    mod = ConvBnAct(32, 3, dtype=jnp.bfloat16)
    xs = [jnp.ones((2, 8, 8, 128), jnp.bfloat16),
          jnp.ones((2, 8, 8, 128), jnp.bfloat16) * 0.5]
    v = mod.init(jax.random.PRNGKey(0), xs, True)

    def loss(params):
        y, _ = mod.apply({"params": params, "batch_stats": v["batch_stats"]},
                         xs, True, mutable=["batch_stats"])
        return y.astype(jnp.float32).mean()

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # kernel param covers the full 256-channel implicit concat
    assert v["params"]["conv"]["conv2d"]["kernel"].shape == (3, 3, 256, 32)


@pytest.mark.slow
@pytest.mark.parametrize("cfg", ["yolov5m_seg", "yolov5l_seg"])
def test_m_l_scale_build_and_forward(cfg):
    """m/l width multipliers change which concat sites pass the split-conv
    MXU-width gate — build, eval forward, and train grad must all work."""
    import jax
    import jax.numpy as jnp

    from desenet_tpu.models import build_model, config_path, init_model

    model, spec = build_model(config_path(cfg), dtype=jnp.float32)
    v = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    (dec, feats), seg = model.apply(v, x, train=False)
    assert np.isfinite(np.asarray(dec)).all()
    assert seg.shape[1:3] == (64, 64)

    def loss(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        det_feats, seg_out = out
        s = seg_out[0] if isinstance(seg_out, (list, tuple)) else seg_out
        return s.mean() + sum(f.mean() for f in det_feats)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
