"""Pallas stem kernel parity (interpret mode on CPU).

The kernel is bit-exact vs the XLA conv on TPU (tools/probe_stem_pallas.py)
but NOT on the production path — its XLA prepass costs more than the conv
it replaces (PERF.md "Pallas stem kernel", a documented negative result).
This test keeps the kernel's tap bookkeeping honest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.ops.stem_pallas import (
    HAVE_PALLAS, stem_conv, stem_conv_reference, stem_weight_matrix)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("hw,block_rows", [((64, 64), 16), ((96, 64), 16)])
def test_stem_conv_matches_xla(hw, block_rows):
    h, w = hw
    k = jax.random.PRNGKey(0)
    W = jax.random.normal(k, (6, 6, 3, 24), jnp.float32) * 0.3
    bias = jax.random.normal(jax.random.PRNGKey(1), (24,), jnp.float32) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, h, w, 3), jnp.float32)
    ref = stem_conv_reference(x, W, bias)
    got = stem_conv(x, stem_weight_matrix(W, jnp.float32), bias,
                    block_rows=block_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_stem_conv_no_silu():
    W = jax.random.normal(jax.random.PRNGKey(3), (6, 6, 3, 8),
                          jnp.float32) * 0.3
    bias = jnp.zeros((8,), jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3),
                           jnp.float32)
    ref = stem_conv_reference(x, W, bias, silu=False)
    got = stem_conv(x, stem_weight_matrix(W, jnp.float32), bias,
                    silu=False, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
