"""Every reference block that no shipped config uses still builds, runs,
and differentiates — the reference keeps them importable in common.py /
experimental.py (SURVEY §2.1), so capability parity requires the same.

Two layers of coverage: a DSL config routing through every compiler-
buildable exotic block end-to-end, and direct module calls for blocks the
yaml DSL cannot name (ARM, RFB1, DAPPM, Sum, Classify, ConvBNReLU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import desenet_tpu.models.layers as L
from desenet_tpu.models import build_model, init_model

EXOTIC_CFG = {
    "de_nc": 2,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23]],
    "backbone": [
        [-1, 1, "Focus", [16, 3]],            # /2
        [-1, 1, "Conv", [32, 3, 2]],          # /4
        [-1, 1, "BottleneckCSP", [32]],
        [-1, 1, "GhostConv", [32, 1, 1]],
        [-1, 1, "GhostBottleneck", [32, 3, 2]],  # /8
        [-1, 2, "C3Ghost", [32]],
        [-1, 1, "CrossConv", [32, 3, 1]],
        [-1, 1, "MixConv2d", [32]],
        [-1, 1, "DWConv", [48, 3, 1]],        # 32ch -> 48ch: groups=gcd=16
        [-1, 1, "SPPF", [32, 5]],
        [-1, 1, "C3TR", [32]],                # transformer inner stack
        [-1, 1, "C3SPP", [32]],
        [-1, 1, "Contract", [2]],             # /16, 128ch
        [-1, 1, "Bottleneck", [128]],
        [-1, 1, "Expand", [2]],               # /8, 32ch
        [-1, 1, "nn.BatchNorm2d", []],
    ],
    "head": [
        [[-1], 1, "Detect", ["de_nc", "anchors"]],
    ],
}


@pytest.mark.slow
def test_exotic_dsl_blocks_build_forward_grad():
    model, spec = build_model(dict(EXOTIC_CFG))
    assert spec.det_strides == (8,)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    x = jnp.linspace(0, 1, 64 * 64 * 3, dtype=jnp.float32).reshape(1, 64, 64, 3)

    # eval forward: decoded preds (B, A, no) over one 8x8 grid, 3 anchors
    (dec, feats), seg = model.apply(variables, x, train=False)
    assert dec.shape == (1, 3 * 8 * 8, 2 + 5)
    assert seg is None
    assert np.all(np.isfinite(np.asarray(dec, np.float32)))

    # train forward + grad: every block differentiates
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])[0]
        return sum(jnp.mean(jnp.square(o.astype(jnp.float32))) for o in out)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_dwconv_gcd_groups_nonmultiple():
    """48ch -> 32ch DWConv must use groups=gcd(48,32)=16 like the reference
    (common.py:59-62), not groups=c2 (which 48 cannot satisfy)."""
    m = L.DWConv(0, 32, 3, 1)
    x = jnp.ones((1, 8, 8, 48), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    k = v["params"]["conv"]["conv"]["conv2d"]["kernel"]
    assert k.shape == (3, 3, 3, 32)  # in_ch/groups = 48/16 = 3
    y = m.apply(v, x)
    assert y.shape == (1, 8, 8, 32)


@pytest.mark.parametrize("mod,cin,expect_c", [
    (lambda: L.ARM(32), 32, 32),
    (lambda: L.RFB1(48, map_reduce=4), 32, 48),
    (lambda: L.RFB1(48, map_reduce=4, has_global=True), 32, 48),
    (lambda: L.DAPPM(16, 32), 32, 32),
    (lambda: L.ConvBNReLU(24, 3), 16, 24),
])
def test_direct_block_forward(mod, cin, expect_c):
    m = mod()
    x = jnp.linspace(-1, 1, 2 * 16 * 16 * cin,
                     dtype=jnp.float32).reshape(2, 16, 16, cin)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 16, 16, expect_c)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("weighted", [False, True])
def test_sum_block(weighted):
    m = L.Sum(3, weight=weighted)
    xs = [jnp.full((1, 4, 4, 8), float(i + 1)) for i in range(3)]
    v = m.init(jax.random.PRNGKey(0), xs)
    y = m.apply(v, xs)
    assert y.shape == (1, 4, 4, 8)
    if not weighted:
        np.testing.assert_allclose(np.asarray(y), 6.0)
    else:
        # sigmoid(w)*2 weights on inputs 2 and 3, like experimental.py:25-36
        w = jax.nn.sigmoid(np.asarray(v["params"]["w"])) * 2.0
        np.testing.assert_allclose(
            np.asarray(y)[0, 0, 0, 0], 1 + 2 * w[0] + 3 * w[1], rtol=1e-6)


def test_classify_head():
    m = L.Classify(10)
    x = jnp.ones((2, 16, 16, 32), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 10)


def test_nonsquare_forward_all_heads():
    """Non-square (rect val) input shapes through seg heads with global
    branches (regression: resize_nearest's square-factor fast path broke
    every non-square forward through GlobalBranch)."""
    import os

    from desenet_tpu.models import build_model, init_model

    cfgdir = os.path.join(os.path.dirname(__file__), "configs")
    for cfg in ("tiny_psp2.yaml", "tiny_psp.yaml"):
        path = os.path.join(cfgdir, cfg)
        if not os.path.exists(path):
            continue
        m, s = build_model(path)
        v = init_model(m, jax.random.PRNGKey(0), img_size=64)
        (dec, _), seg = m.apply(v, jnp.ones((1, 96, 64, 3)), train=False)
        assert seg.shape[1:3] == (96, 64)
        assert np.all(np.isfinite(np.asarray(dec, np.float32)))
