"""Fused seg-tail kernel (ops/seg_pallas.py): bilinear 8x + argmax.

Exactness vs the XLA composition (f32 resize_bilinear + jnp.argmax) in
interpret mode — the TPU path differs only in MXU f32 pass count (~0.07%
near-tie flips on random logits, none observed on real class margins).
Production semantics: reference yolo.py:227-230 upsample + val/detect argmax.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.ops.resize import resize_bilinear
from desenet_tpu.ops.seg_pallas import upsample_argmax


@pytest.mark.parametrize("b,c", [(8, 3), (4, 19), (6, 5), (1, 2)])
def test_matches_xla_composition(b, c, rng):
    x = jnp.asarray(rng.normal(0, 1, (b, 10, 12, c)), jnp.float32)
    got = np.asarray(upsample_argmax(x, scale=8, interpret=True))
    ref = np.asarray(jnp.argmax(
        resize_bilinear(x, (80, 96), align_corners=True), -1))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, ref)


def test_tie_breaks_to_first_channel():
    # all channels identical -> argmax must return 0 everywhere (jnp.argmax
    # first-max semantics)
    x = jnp.ones((2, 8, 8, 4), jnp.float32)
    got = np.asarray(upsample_argmax(x, scale=8, interpret=True))
    assert (got == 0).all()


def test_bf16_input(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3)), jnp.bfloat16)
    got = np.asarray(upsample_argmax(x, scale=8, interpret=True))
    ref = np.asarray(jnp.argmax(resize_bilinear(
        x.astype(jnp.float32), (64, 64), align_corners=True), -1))
    np.testing.assert_array_equal(got, ref)


def test_mxu_dtype_bf16_opt_in(rng):
    # bf16 MXU operands (opt-in, measured ~neutral on v5e): picks may flip
    # only where the interpolated top-2 margin is below bf16 resolution.
    # On strongly-separated one-hot logits agreement must be near-total,
    # and the kernel must run end to end.
    cls = rng.integers(0, 4, (2, 8, 8))
    x = jnp.asarray(10.0 * np.eye(4, dtype=np.float32)[cls], jnp.bfloat16)
    got = np.asarray(upsample_argmax(x, scale=8, interpret=True,
                                     mxu_dtype=jnp.bfloat16))
    ref = np.asarray(jnp.argmax(resize_bilinear(
        x.astype(jnp.float32), (64, 64), align_corners=True), -1))
    assert got.shape == ref.shape and got.dtype == np.uint8
    assert (got == ref).mean() > 0.99


def test_seg_upsample_flag_returns_lowres():
    from desenet_tpu.models import build_model, config_path, init_model

    model, spec = build_model(config_path("yolov5s_seg"), seg_upsample=False)
    v = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    (_, _), seg = model.apply(v, x, train=False)
    assert seg.shape[1:3] == (8, 8)  # 1/8 res
    # params identical to the default build (the upsample has no params)
    model2, _ = build_model(config_path("yolov5s_seg"))
    v2 = init_model(model2, jax.random.PRNGKey(0), img_size=64, batch=1)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(v2["params"])
