"""Resize / pooling parity vs torch (the exact semantics the seg head needs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from desenet_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
    adaptive_avg_pool,
    max_pool_same,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def nhwc(rng, n=2, h=20, w=24, c=5):
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


def to_torch(x):  # NHWC -> NCHW
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def to_np(t):  # NCHW -> NHWC
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("out_hw", [(40, 48), (160, 192), (7, 13), (20, 24)])
def test_bilinear_matches_torch(rng, align, out_hw):
    x = nhwc(rng)
    exp = to_np(
        F.interpolate(to_torch(x), size=out_hw, mode="bilinear", align_corners=align)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(got, exp, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(40, 48), (10, 11), (60, 72)])
def test_nearest_matches_torch(rng, out_hw):
    x = nhwc(rng)
    exp = to_np(F.interpolate(to_torch(x), size=out_hw, mode="nearest"))
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, exp)


def test_upsample_nearest_2x(rng):
    x = nhwc(rng)
    exp = to_np(F.interpolate(to_torch(x), scale_factor=2, mode="nearest"))
    got = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, exp)


@pytest.mark.parametrize("k", [1, 2, 3, 6])
def test_adaptive_avg_pool_matches_torch(rng, k):
    # 20x24 is NOT divisible by 3 or 6 — exercises torch's floor/ceil windows
    x = nhwc(rng)
    exp = to_np(F.adaptive_avg_pool2d(to_torch(x), k))
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), k))
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize("k", [5, 9, 13])
def test_max_pool_same_matches_torch(rng, k):
    x = nhwc(rng)
    exp = to_np(F.max_pool2d(to_torch(x), kernel_size=k, stride=1, padding=k // 2))
    got = np.asarray(max_pool_same(jnp.asarray(x), k))
    np.testing.assert_allclose(got, exp)
