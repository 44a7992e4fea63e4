"""fp8 activation-storage mode (build_model(act_store="fp8")).

Contract (models/layers.py act_store_scope, models/build.py Walker):
- eval-only: train-mode outputs are bit-identical to the bf16 build;
- intermediate layer outputs are stored float8_e4m3fn, EXCEPT layers
  feeding Detect (bf16 — same exclusion policy as the int8 path);
- head outputs (decode, seg logits) keep their normal dtypes;
- outputs stay within fp8 rounding distance of the bf16 build;
- mutually exclusive with the int8 quant mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desenet_tpu.models import build_model, init_model

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host; excluded from the smoke tier

CFG = "tests/configs/tiny_psp2.yaml"


@pytest.fixture(scope="module")
def models():
    m0, spec = build_model(CFG, dtype=jnp.bfloat16)
    m8, _ = build_model(CFG, dtype=jnp.bfloat16, act_store="fp8")
    variables = init_model(m0, jax.random.PRNGKey(0), img_size=64, batch=1)
    # init-weight activations decay to ~0 through the depth (BN eval stats
    # are mean 0 / var 1), which makes fp8 rounding invisible in bf16 —
    # perturb the BN offsets so every layer carries O(1) signal like a
    # trained network does
    variables = jax.tree_util.tree_map_with_path(
        lambda path, v: (v + 0.05 * np.cos(np.arange(v.size)).reshape(v.shape)
                         .astype(np.float32)
                         if any(getattr(k, "key", None) == "bias" for k in path)
                         else v),
        variables,
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                           jnp.bfloat16)
    return m0, m8, spec, variables, x


def test_eval_close_but_not_identical(models):
    m0, m8, spec, variables, x = models
    (dec0, _), seg0 = m0.apply(variables, x, train=False)
    (dec8, _), seg8 = m8.apply(variables, x, train=False)
    dec0 = np.asarray(dec0, np.float32)
    dec8 = np.asarray(dec8, np.float32)
    seg0 = np.asarray(seg0, np.float32)
    seg8 = np.asarray(seg8, np.float32)
    # rounding must actually happen somewhere...
    assert (dec0 != dec8).any() or (seg0 != seg8).any()
    # ...but stay at fp8-rounding scale (boxes are in pixels; obj/cls in
    # [0,1] — compare decoded tensors with a scale-aware tolerance)
    np.testing.assert_allclose(dec8, dec0, rtol=0.35,
                               atol=0.05 * np.abs(dec0).max())
    # seg logits at init are tiny (~1e-2 absmax): near-zero entries make
    # rtol meaningless — gate on absolute error vs the logit scale instead
    np.testing.assert_allclose(seg8, seg0, rtol=0,
                               atol=0.1 * np.abs(seg0).max())


def test_storage_dtypes_and_det_src_exclusion(models):
    m0, m8, spec, variables, x = models
    det_srcs = set(spec.layers[spec.det_layer].f)
    assert det_srcs  # tiny_psp2 has a Detect layer
    probe_scoped = 2  # early C3, inside the scope
    out = m8.apply(variables, x, train=False, up_to=probe_scoped)
    assert out.dtype == jnp.float8_e4m3fn
    for i in det_srcs:
        out = m8.apply(variables, x, train=False, up_to=i)
        assert out.dtype == jnp.bfloat16, f"det-src l{i} must stay bf16"
    # head outputs keep their production dtypes
    (dec8, _), seg8 = m8.apply(variables, x, train=False)
    assert dec8.dtype == jnp.float32
    assert seg8.dtype == jnp.bfloat16


def test_train_mode_bit_identical(models):
    m0, m8, spec, variables, x = models
    (det0, seg0), _ = m0.apply(variables, x, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(7)})
    (det8, seg8), _ = m8.apply(variables, x, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(7)})
    for a, b in zip(jax.tree_util.tree_leaves((det0, seg0)),
                    jax.tree_util.tree_leaves((det8, seg8))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_act_store_quant_mutually_exclusive():
    from desenet_tpu.quant import QuantCfg

    with pytest.raises(ValueError):
        build_model(CFG, act_store="fp8", quant=QuantCfg(mode="int8"))


def test_exotic_blocks_under_act_store():
    """Blocks with raw residual adds / token mixing (C3TR, CrossConv,
    GhostBottleneck, standalone BN, Sum-style paths) must trace and stay
    finite with fp8-stored inputs — fp8+bf16 has no implicit promotion, so
    any missed to_compute guard raises at trace time."""
    from test_exotic_blocks import EXOTIC_CFG

    model, spec = build_model(dict(EXOTIC_CFG), dtype=jnp.bfloat16,
                              act_store="fp8")
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    x = jnp.linspace(0, 1, 64 * 64 * 3,
                     dtype=jnp.float32).reshape(1, 64, 64, 3)
    (dec, feats), seg = model.apply(variables, x.astype(jnp.bfloat16),
                                    train=False)
    assert np.all(np.isfinite(np.asarray(dec, np.float32)))


def test_det_src_exclusion_propagates_through_passthrough_rows():
    """A Detect fed by a Concat/Upsample row must still receive bf16: the
    exclusion expands through pass-through rows to the producing layers."""
    cfg = {
        "de_nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "Focus", [16, 3]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C3", [32]],
        ],
        "head": [
            [[1, 2], 1, "Concat", [-1]],
            [[-1], 1, "Detect", ["de_nc", "anchors"]],
        ],
    }
    model, spec = build_model(cfg, dtype=jnp.bfloat16, act_store="fp8")
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3),
                           jnp.bfloat16)
    # layers 1/2 produce the Concat that feeds Detect: they must stay bf16
    for i in (1, 2):
        out = model.apply(variables, x, train=False, up_to=i)
        assert out.dtype == jnp.bfloat16, f"l{i} feeds Detect via Concat"
    concat_out = model.apply(variables, x, train=False, up_to=3)
    parts = concat_out if isinstance(concat_out, list) else [concat_out]
    assert all(p.dtype == jnp.bfloat16 for p in parts)
