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
