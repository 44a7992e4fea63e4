"""TTA forward + ensemble: shape/inverse-transform correctness."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.eval.tta import descale_pred, forward_augment, scale_img
from desenet_tpu.models import build_model, init_model

HERE = os.path.dirname(os.path.abspath(__file__))
CFG = os.path.join(HERE, "configs", "tiny_psp2.yaml")


@pytest.fixture(scope="module")
def model_vars():
    model, spec = build_model(CFG)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    return model, variables


def test_scale_img_pads_to_stride(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y = scale_img(x, 0.83, gs=32)
    assert y.shape[1] % 32 == 0 and y.shape[2] % 32 == 0
    assert y.shape[1] == 64  # ceil(53/32)*32
    # padded region carries the 0.447 fill
    assert abs(float(y[0, -1, -1, 0]) - 0.447) < 1e-6


def test_descale_lr_flip_roundtrip(rng):
    p = jnp.asarray(rng.uniform(10, 50, (1, 7, 8)).astype(np.float32))
    img_hw = (64, 64)
    # simulate flip: x' = W - x on decoded coords, then descale should invert
    flipped = p.at[..., 0].set(img_hw[1] - p[..., 0])
    out = descale_pred(flipped, "lr", 1.0, img_hw)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(p[..., 0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 1:]), np.asarray(p[..., 1:]),
                               rtol=1e-6)


def test_forward_augment_shapes(model_vars):
    model, variables = model_vars
    x = jnp.zeros((2, 64, 64, 3))
    dec = forward_augment(model, variables, x)
    # base 64px: A = 3*(8*8+4*4+2*2) = 252; plus 0.83 (padded to 64) -> 252;
    # plus 0.67 (padded to 64... ceil(42/32)*32=64) -> 252
    assert dec.shape[0] == 2 and dec.shape[2] == model.spec.de_nc + 5
    assert dec.shape[1] == 3 * 252
    assert np.isfinite(np.asarray(dec)).all()


def test_ensemble_forward(model_vars):
    from desenet_tpu.eval.ensemble import ensemble_forward

    model, variables = model_vars
    members = [
        (model, variables, {"de_nc": model.spec.de_nc}),
        (model, variables, {"de_nc": model.spec.de_nc}),
    ]
    x = jnp.zeros((1, 64, 64, 3))
    dec, seg = ensemble_forward(members, x)
    assert dec.shape[1] == 2 * 252
    assert seg.shape == (1, 64, 64, model.spec.se_nc)


def test_ensemble_model_through_validator(model_vars, rng):
    """EnsembleModel duck-types the single model: a 2-member ensemble of the
    SAME checkpoint must reproduce the single-model keep set exactly (the
    duplicate candidates are IoU-1.0 suppressed) and the same seg argmax."""
    from desenet_tpu.eval.ensemble import EnsembleModel
    from desenet_tpu.eval.validator import Validator

    model, variables = model_vars
    ens = EnsembleModel([model, model])
    img = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    tg = jnp.zeros((2, 8, 5), jnp.float32)
    msk = jnp.zeros((2, 8), bool)

    kw = dict(nc=model.spec.de_nc, se_nc=model.spec.se_nc, conf_thres=0.25)
    nms1, seg1 = Validator(model, **kw)._eval_step((2, 64, 64, 3))(
        variables, img, tg, msk)
    nms2, seg2 = Validator(ens, **kw)._eval_step((2, 64, 64, 3))(
        (variables, variables), img, tg, msk)

    np.testing.assert_array_equal(np.asarray(nms1.num), np.asarray(nms2.num))
    for si in range(2):
        n = int(nms1.num[si])
        np.testing.assert_allclose(np.asarray(nms1.boxes[si, :n]),
                                   np.asarray(nms2.boxes[si, :n]),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nms1.scores[si, :n]),
                                   np.asarray(nms2.scores[si, :n]),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg2))


def test_ensemble_model_tta(model_vars):
    """TTA composes with the ensemble wrapper (model.spec / model.apply
    duck-typing): shapes double along the anchor axis per member."""
    from desenet_tpu.eval.ensemble import EnsembleModel

    model, variables = model_vars
    ens = EnsembleModel([model, model])
    x = jnp.zeros((1, 64, 64, 3))
    dec = forward_augment(ens, (variables, variables), x)
    assert dec.shape[1] == 3 * 2 * 252
    assert np.isfinite(np.asarray(dec)).all()


def test_forward_augment_joint_seg(model_vars, rng):
    """Seg TTA: averaged logits come back on the input grid; with an
    lr-symmetric input the lr-flip variant contributes the same logits as
    the identity variant, so the mean equals the plain forward on the
    symmetric variants' subset."""
    from desenet_tpu.eval import tta

    model, variables = model_vars
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    dec, seg = tta.forward_augment_joint(model, variables, x)
    assert dec.shape[1] == 3 * 252
    assert seg.shape == (2, 64, 64, model.spec.se_nc)
    assert np.isfinite(np.asarray(seg)).all()

    # identity-only variant set must reduce to the plain forward exactly
    orig = tta.TTA_VARIANTS
    try:
        tta.TTA_VARIANTS = ((1.0, ""),)
        dec1, seg1 = tta.forward_augment_joint(model, variables, x)
        (dec_p, _), seg_p = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(seg1), np.asarray(seg_p),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec_p),
                                   rtol=1e-6, atol=1e-6)
        # lr-flip variant inverse-transforms back onto the input grid:
        # manual composition oracle
        tta.TTA_VARIANTS = ((1.0, "lr"),)
        _, seg_lr = tta.forward_augment_joint(model, variables, x)
        (_, _), seg_m = model.apply(variables, x[:, :, ::-1, :], train=False)
        np.testing.assert_allclose(np.asarray(seg_lr),
                                   np.asarray(seg_m[:, :, ::-1, :]),
                                   rtol=1e-6, atol=1e-6)
    finally:
        tta.TTA_VARIANTS = orig


def test_validator_augment_uses_joint_tta(model_vars):
    """The validator's augment step runs the joint TTA program (det + seg)
    without error and returns the same shapes as the plain step."""
    from desenet_tpu.eval.validator import Validator

    model, variables = model_vars
    v = Validator(model, nc=model.spec.de_nc, se_nc=model.spec.se_nc,
                  augment=True)
    step = v._eval_step((2, 64, 64, 3))
    img = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    tg = jnp.zeros((2, 8, 5), jnp.float32)
    msk = jnp.zeros((2, 8), bool)
    nms, seg_cls = step(variables, img, tg, msk)
    assert seg_cls.shape == (2, 64, 64)
    assert nms.boxes.shape[0] == 2


def test_validator_save_hybrid_injects_labels(model_vars):
    """save_hybrid injects GT boxes as conf-1.0 candidates pre-NMS
    (reference val.py:226-230 lb -> nms labels path): every GT box must
    appear in the NMS keep set at score ~1.0."""
    from desenet_tpu.eval.validator import Validator

    model, variables = model_vars
    v = Validator(model, nc=model.spec.de_nc, se_nc=model.spec.se_nc,
                  conf_thres=0.25, save_hybrid=True)
    step = v._eval_step((2, 64, 64, 3))
    img = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    tg = np.zeros((2, 8, 5), np.float32)
    msk = np.zeros((2, 8), bool)
    tg[0, 0] = [1, 0.5, 0.5, 0.4, 0.3]
    tg[0, 1] = [0, 0.2, 0.2, 0.1, 0.1]
    msk[0, :2] = True
    nms, _ = step(variables, img, jnp.asarray(tg), jnp.asarray(msk))
    boxes = np.asarray(nms.boxes[0])
    scores = np.asarray(nms.scores[0])
    classes = np.asarray(nms.classes[0])
    n = int(nms.num[0])
    assert n >= 2
    kept = boxes[:n][scores[:n] > 0.99]
    kcls = classes[:n][scores[:n] > 0.99]
    # GT (xywhn on 64px) -> xyxy pixels
    for cls, cx, cy, w, h in tg[0][msk[0]]:
        want = np.asarray([(cx - w / 2) * 64, (cy - h / 2) * 64,
                           (cx + w / 2) * 64, (cy + h / 2) * 64])
        d = np.abs(kept - want).max(axis=1) if len(kept) else np.asarray([9e9])
        i = int(np.argmin(d))
        assert d[i] < 0.6, (want, kept)
        assert int(kcls[i]) == int(cls)
    # image 1 had no labels: nothing at conf ~1
    n1 = int(nms.num[1])
    assert not (np.asarray(nms.scores[1][:n1]) > 0.99).any()
