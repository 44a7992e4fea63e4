"""Fused SegMaskPSP2 Pallas head (ops/seg_head_pallas.py) vs the XLA module
path — interpret mode on CPU; the compiled kernel is exercised on TPU by
bench.py. f32 keeps the comparison tight; the only intended reassociations
are f32-accum matmuls and upsample/1x1-conv commutation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desenet_tpu.models import heads as H
from desenet_tpu.ops.seg_head_pallas import fused_psp2_eval


def make_inputs(rng, b=2, h8=16, w8=16, c16=128):
    # neck tap widths scale together across s/m/l (c16 = 256*gw = c_hid)
    return [
        jnp.asarray(rng.normal(size=(b, h8, w8, c16)).astype(np.float32)),
        jnp.asarray(rng.normal(
            size=(b, h8 // 2, w8 // 2, 2 * c16)).astype(np.float32)),
        jnp.asarray(rng.normal(
            size=(b, h8 // 4, w8 // 4, 4 * c16)).astype(np.float32)),
    ]


def init_head(xs, n_segcls=3, c_hid=128):
    head = H.SegMaskPSP2(n_segcls=n_segcls, c_hid=c_hid, dtype=jnp.float32,
                         upsample=False)
    v = head.init(jax.random.PRNGKey(0), xs, train=False)
    return head, v


def randomize_stats(v, rng):
    """Non-trivial BN stats so the fold is actually exercised."""
    def rnd(leaf):
        a = rng.normal(size=leaf.shape).astype(np.float32)
        return jnp.asarray(np.abs(a) + 0.5)
    bs = jax.tree_util.tree_map(rnd, v["batch_stats"])
    return {"params": v["params"], "batch_stats": bs}


@pytest.mark.parametrize("hw", [(16, 16), (16, 24)])
def test_fused_head_matches_xla(hw):
    rng = np.random.default_rng(0)
    xs = make_inputs(rng, h8=hw[0], w8=hw[1])
    head, v = init_head(xs)
    v = randomize_stats(v, rng)
    ref = head.apply(v, xs, train=False)
    out = fused_psp2_eval(xs, v["params"], v["batch_stats"], 3,
                          interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c_hid", [192, 256])  # m / l widths
def test_fused_head_matches_xla_family(c_hid):
    """The kernel's channel parameterization (stem width, ACSP inner,
    pyramid/ctx widths all derived from the weight shapes) must hold at the
    m/l family scales, not just the s shapes it was written against."""
    rng = np.random.default_rng(2)
    xs = make_inputs(rng, b=1, h8=8, w8=16, c16=c_hid)
    head, v = init_head(xs, c_hid=c_hid)
    v = randomize_stats(v, rng)
    ref = head.apply(v, xs, train=False)
    out = fused_psp2_eval(xs, v["params"], v["batch_stats"], 3,
                          interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_head_bf16_tolerance():
    rng = np.random.default_rng(1)
    xs = [x.astype(jnp.bfloat16) for x in make_inputs(rng)]
    head = H.SegMaskPSP2(n_segcls=3, c_hid=128, dtype=jnp.bfloat16,
                         upsample=False)
    v = head.init(jax.random.PRNGKey(0),
                  [x.astype(jnp.float32) for x in xs], train=False)
    ref = np.asarray(head.apply(v, xs, train=False), np.float32)
    out = np.asarray(
        fused_psp2_eval(xs, v["params"], v["batch_stats"], 3,
                        interpret=True), np.float32)
    # bf16 path: logits agree within bf16 noise
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.15)
    # class decisions agree almost everywhere
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.99, agree
