"""Resize / pooling parity vs torch (the exact semantics the seg head needs)."""

import numpy as np
import jax
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


def test_resize_nearest_unequal_integer_factors():
    """Per-axis integer upsample factors (regression: the fast path assumed
    square scaling and returned (h_out, h_out) — crashed every non-square
    rect-val forward through the seg heads' GlobalBranch)."""
    import numpy as np

    from desenet_tpu.ops.resize import resize_nearest

    x = jnp.arange(2 * 3, dtype=jnp.float32).reshape(1, 2, 3, 1)
    y = resize_nearest(x, (4, 6))   # 2x, 2x
    assert y.shape == (1, 4, 6, 1)
    y2 = resize_nearest(x, (4, 12))  # 2x, 4x — unequal
    assert y2.shape == (1, 4, 12, 1)
    np.testing.assert_array_equal(np.asarray(y2[0, :, :, 0]),
                                  np.repeat(np.repeat(
                                      np.asarray(x[0, :, :, 0]), 2, 0), 4, 1))
    # (1,1) -> non-square (the GlobalBranch case)
    g = jnp.ones((2, 1, 1, 4))
    yg = resize_nearest(g, (5, 3))
    assert yg.shape == (2, 5, 3, 4)


def test_max_pool_same_vjp_matches_torch():
    """The custom shifted-compare max-pool VJP (ops/resize.py _mp1_bwd —
    replaces select_and_scatter, which GSPMD miscompiles under spatial
    sharding) must match torch's maxpool backward on tie-free inputs."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 13, 13, 5)).astype(np.float32)
    for k in (3, 5, 13):
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
        y = F.max_pool2d(xt, kernel_size=k, stride=1, padding=k // 2)
        (y ** 2).sum().backward()
        exp = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

        f = lambda a: (max_pool_same(a, k) ** 2).sum()
        got = np.asarray(jax.grad(f)(jnp.asarray(x)))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_max_pool_same_vjp_tie_splitting():
    """On exact ties the custom VJP routes gradient to every tied max (torch
    picks one) — documented delta. All-ones input: every element ties, so
    dx_i = g * (#windows containing i along H) * (#windows along W)."""
    import numpy as np

    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    g = np.asarray(jax.grad(lambda a: (max_pool_same(a, 3) * 2.0).sum())(x))
    # k=3 stride-1 SAME on length 4: windows containing position i:
    # i=0 -> 2, i=1 -> 3, i=2 -> 3, i=3 -> 2
    per_axis = np.array([2, 3, 3, 2], np.float32)
    np.testing.assert_allclose(g[0, :, :, 0], 2.0 * np.outer(per_axis,
                                                             per_axis))
