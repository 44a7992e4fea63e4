"""int8 W8A8 post-training quantization (desenet_tpu/quant.py).

The reference has no quantized path (fp16 eval only, scripts/val.py:178-179);
this is a TPU-first capability. Tests: numeric accuracy of the quantized
conv block at realistic magnitudes, graph plumbing through the compiled
model (QTensors across concat/upsample/pool/residual glue), calibration
coverage, and that the fp path is untouched when quant=None.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desenet_tpu import quant as Q
from desenet_tpu.models import build_model, init_model
from desenet_tpu.models.layers import ConvBnAct
from desenet_tpu.quant import QTensor, QuantCfg

CFG = "tests/configs/tiny_psp2.yaml"


def _realistic_convbnact_vars(rng, c1, c2, k):
    """Variables with O(1) activations: unit-ish BN stats, kaiming kernel."""
    kern = rng.normal(0, 1.0 / np.sqrt(k * k * c1), (k, k, c1, c2))
    return {
        "params": {
            "conv": {"conv2d": {"kernel": jnp.asarray(kern, jnp.float32)}},
            "bn": {"bn": {
                "scale": jnp.asarray(rng.uniform(0.5, 1.5, c2), jnp.float32),
                "bias": jnp.asarray(rng.normal(0, 0.1, c2), jnp.float32),
            }},
        },
        "batch_stats": {"bn": {"bn": {
            "mean": jnp.asarray(rng.normal(0, 0.05, c2), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 1.5, c2), jnp.float32),
        }}},
    }


def test_int8_convbnact_accuracy(rng):
    """int8 conv+BN+SiLU tracks the fp block to ~1% at O(1) magnitudes."""
    c1, c2, k = 32, 48, 3
    variables = _realistic_convbnact_vars(rng, c1, c2, k)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, c1)), jnp.float32)

    fp = ConvBnAct(c2, k)
    y_fp = fp.apply(variables, x, train=False)

    # calibrate this single block
    calib = ConvBnAct(c2, k, quant=QuantCfg(mode="calib"))
    _, mut = calib.apply(variables, x, train=False, mutable=["qcal"])
    scales = tuple(sorted(Q.flatten_qcal(mut["qcal"]).items()))

    qx = Q.quantize(x, float(jnp.max(jnp.abs(x))) / 127.0)
    q = ConvBnAct(c2, k, quant=QuantCfg(mode="int8", scales=scales))
    y_q = Q.dequantize(q.apply(variables, qx, train=False))

    rel = float(jnp.abs(y_q - y_fp).mean() / (jnp.abs(y_fp).mean() + 1e-9))
    assert rel < 0.05, rel
    # and the output really is int8
    out = q.apply(variables, qx, train=False)
    assert isinstance(out, QTensor) and out.data.dtype == jnp.int8


def test_bn_skip_quirk_in_int8(rng):
    """1x1-spatial input skips the BN fold, matching the fp quirk
    (reference common.py:53)."""
    c1, c2 = 16, 16
    variables = _realistic_convbnact_vars(rng, c1, c2, 1)
    x = jnp.asarray(rng.normal(0, 1, (2, 1, 1, c1)), jnp.float32)

    y_fp = ConvBnAct(c2, 1).apply(variables, x, train=False)
    calib = ConvBnAct(c2, 1, quant=QuantCfg(mode="calib"))
    _, mut = calib.apply(variables, x, train=False, mutable=["qcal"])
    scales = tuple(sorted(Q.flatten_qcal(mut["qcal"]).items()))
    qx = Q.quantize(x, float(jnp.max(jnp.abs(x))) / 127.0)
    q = ConvBnAct(c2, 1, quant=QuantCfg(mode="int8", scales=scales))
    y_q = Q.dequantize(q.apply(variables, qx, train=False))
    rel = float(jnp.abs(y_q - y_fp).mean() / (jnp.abs(y_fp).mean() + 1e-9))
    assert rel < 0.05, rel


@pytest.fixture(scope="module")
def tiny_fp():
    model, spec = build_model(CFG)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=2)
    return model, spec, variables


def _boost_variables(variables, rng):
    """Scale conv kernels so activations are O(1) instead of vanishing
    (random tiny-config init saturates sigmoids and would hide quant error)."""
    def boost(path, v):
        if path[-1] == "kernel":
            fan = np.prod(v.shape[:-1])
            return jnp.asarray(
                rng.normal(0, 1.3 / np.sqrt(fan), v.shape), jnp.float32)
        return v
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: boost([k.key for k in p], v), variables["params"])
    return {**variables, "params": params}


@pytest.mark.slow
def test_int8_model_end_to_end(tiny_fp, rng):
    """Full compiled-graph int8 apply: QTensors thread through Focus/C3/SPP/
    concat/upsample; heads see fp; outputs track the fp model."""
    model, spec, variables = tiny_fp
    variables = _boost_variables(variables, rng)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)

    (dec_fp, _), seg_fp = model.apply(variables, x, train=False)

    int8_model, _, scales = Q.quantize_for_inference(CFG, variables, [x])
    assert len(scales) >= 40  # every conv site calibrated
    (dec_q, _), seg_q = int8_model.apply(variables, x, train=False)

    dec_fp = np.asarray(dec_fp, np.float32)
    dec_q = np.asarray(dec_q, np.float32)
    seg_fp = np.asarray(seg_fp, np.float32)
    seg_q = np.asarray(seg_q, np.float32)

    def cos(a, b):
        a, b = a.ravel(), b.ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    assert cos(dec_fp, dec_q) > 0.98
    assert cos(seg_fp, seg_q) > 0.98
    # objectness/cls probabilities stay close for the bulk of anchors
    # (near-saturated logits in this stress model may flip individually)
    assert float(np.percentile(np.abs(dec_fp[..., 4:] - dec_q[..., 4:]), 99.5)) < 0.1
    # decoded box centers move by well under a stride
    assert float(np.abs(dec_fp[..., :2] - dec_q[..., :2]).mean()) < 1.0


def test_int8_init_matches_fp_param_tree(tiny_fp):
    """Initializing an int8-mode model creates the identical param tree, so
    fp checkpoints load into the quantized model unchanged."""
    model, spec, variables = tiny_fp
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    calib_model, _ = build_model(CFG, quant=QuantCfg(mode="calib"))
    scales = Q.calibrate_scales(calib_model, variables, [x])
    int8_model, _ = build_model(CFG, quant=QuantCfg(mode="int8", scales=scales))
    v2 = init_model(int8_model, jax.random.PRNGKey(0), img_size=64, batch=1)
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    assert (jax.tree_util.tree_structure(variables["batch_stats"])
            == jax.tree_util.tree_structure(v2["batch_stats"]))


def test_fp_path_unchanged_with_quant_none(tiny_fp, rng):
    """quant=None is bit-identical to a model built before quant existed
    (guard: the quant branches must be dead when disabled)."""
    model, spec, variables = tiny_fp
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    (dec1, _), seg1 = model.apply(variables, x, train=False)
    model2, _ = build_model(CFG, quant=None)
    (dec2, _), seg2 = model2.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(dec1), np.asarray(dec2))
    np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg2))


def test_qt_helpers(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 8)), jnp.float32)
    qt = Q.quantize(x, float(jnp.max(jnp.abs(x))) / 127.0)
    back = Q.dequantize(qt)
    assert float(jnp.abs(back - x).max()) <= qt.scale * 0.5 + 1e-7

    # concat requantizes to the max scale without clipping
    sa = float(jnp.max(jnp.abs(x))) / 127.0
    a = Q.quantize(x, sa)
    b = Q.quantize(2 * x, 2 * sa)
    cat = Q.qt_concat([a, b])
    assert cat.scale == 2 * sa and cat.data.shape[-1] == 16

    # add at a calibrated scale
    s = float(jnp.max(jnp.abs(2 * x))) / 127.0
    added = Q.qt_add(a, a, s)
    assert float(jnp.abs(Q.dequantize(added) - 2 * x).mean()) < 3 * s


def test_int8_bias_correction_reduces_error(rng):
    """Weight-quantization bias correction (QuantCfg.bias_correct): with a
    biased input distribution, folding E[conv(x, dq(q(W)) - W)] out of the
    epilogue must shrink the mean (systematic) output error vs no
    correction, and stay within the same overall accuracy envelope."""
    c1, c2, k = 32, 48, 3
    variables = _realistic_convbnact_vars(rng, c1, c2, k)
    # nonzero-mean input: systematic weight-rounding error becomes visible
    x = jnp.asarray(rng.normal(0.7, 0.5, (2, 16, 16, c1)), jnp.float32)

    fp = ConvBnAct(c2, k)
    y_fp = fp.apply(variables, x, train=False)

    calib = ConvBnAct(c2, k, quant=QuantCfg(mode="calib"))
    _, mut = calib.apply(variables, x, train=False,
                         mutable=["qcal", "qmean"])
    scales = tuple(sorted(Q.flatten_qcal(mut["qcal"]).items()))
    means = tuple(sorted(
        (kk, tuple(float(v) for v in vv))
        for kk, vv in Q.flatten_qmean(mut["qmean"]).items()))

    qx = Q.quantize(x, float(jnp.max(jnp.abs(x))) / 127.0)

    def mean_bias(cfg):
        q = ConvBnAct(c2, k, quant=cfg)
        y_q = Q.dequantize(q.apply(variables, qx, train=False))
        # per-channel mean error = the systematic component correction targets
        return float(jnp.abs((y_q - y_fp).mean(axis=(0, 1, 2))).mean())

    bias_nc = mean_bias(QuantCfg(mode="int8", scales=scales))
    bias_c = mean_bias(QuantCfg(mode="int8", scales=scales,
                                in_means=means, bias_correct=True))
    assert bias_c < bias_nc, (bias_c, bias_nc)

    q = ConvBnAct(c2, k, quant=QuantCfg(mode="int8", scales=scales,
                                        in_means=means, bias_correct=True))
    y_c = Q.dequantize(q.apply(variables, qx, train=False))
    rel = float(jnp.abs(y_c - y_fp).mean() / (jnp.abs(y_fp).mean() + 1e-9))
    assert rel < 0.05, rel


def test_quantize_for_inference_carries_means(tiny_fp, rng):
    """quantize_for_inference default: bias correction on, means calibrated
    for every conv site that has an inmean sow."""
    _, _, variables = tiny_fp
    variables = _boost_variables(variables, rng)
    x = jnp.asarray(rng.normal(0.3, 0.4, (1, 64, 64, 3)), jnp.float32)
    int8_model, _, scales = Q.quantize_for_inference(CFG, variables, [x])
    assert int8_model.quant.bias_correct
    assert len(int8_model.quant.in_means) > 0
    # still runs end to end
    (dec_q, _), seg_q = int8_model.apply(variables, x, train=False)
    assert jnp.isfinite(dec_q).all()


def test_mse_clip_never_worse_than_absmax(rng):
    """quantize_kernel(mse_clip=True) can only improve reconstruction MSE
    (absmax sits in the candidate grid at r=1.0). Measured finding
    (PERF.md round 4): at int8 with per-channel scales and ~300-weight
    channels, absmax is already MSE-optimal for realistic weight
    distributions — the search ties it, so mse_clip is a no-op lever here
    (it matters at 4-bit granularity); kept for the record."""
    for w in (
        rng.normal(0, 0.05, (3, 3, 32, 16)).astype(np.float32),
        rng.laplace(0, 0.03, (3, 3, 32, 16)).astype(np.float32),
        (rng.standard_t(3, (3, 3, 32, 16)) * 0.02).astype(np.float32),
    ):
        kern = jnp.asarray(w)
        qa, sa = Q.quantize_kernel(kern)
        qm, sm = Q.quantize_kernel(kern, mse_clip=True)
        err_a = float(jnp.sum((qa * sa - kern) ** 2))
        err_m = float(jnp.sum((qm * sm - kern) ** 2))
        assert err_m <= err_a * (1 + 1e-6), (err_m, err_a)


@pytest.mark.slow
def test_int8_weights_only_and_mse_clip_model(tiny_fp, rng):
    """Ablation modes run end to end: weights-only (fp activations) tracks
    the fp model at least as closely as full W8A8, and mse_clip full-int8
    stays in the same accuracy band."""
    model, spec, variables = tiny_fp
    variables = _boost_variables(variables, rng)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)

    (dec_fp, _), _ = model.apply(variables, x, train=False)
    dec_fp = np.asarray(dec_fp, np.float32)

    def cos(a, b):
        a, b = a.ravel(), b.ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    m_full, _, _ = Q.quantize_for_inference(CFG, variables, [x])
    (dec_full, _), _ = m_full.apply(variables, x, train=False)

    m_w8, _, _ = Q.quantize_for_inference(CFG, variables, [x],
                                          weights_only=True)
    assert m_w8.quant.is_w8 and not m_w8.quant.is_int8
    (dec_w8, _), _ = m_w8.apply(variables, x, train=False)

    m_clip, _, _ = Q.quantize_for_inference(CFG, variables, [x],
                                            mse_clip=True)
    (dec_clip, _), _ = m_clip.apply(variables, x, train=False)

    c_full = cos(dec_fp, np.asarray(dec_full, np.float32))
    c_w8 = cos(dec_fp, np.asarray(dec_w8, np.float32))
    c_clip = cos(dec_fp, np.asarray(dec_clip, np.float32))
    assert c_w8 > 0.99, c_w8
    assert c_w8 >= c_full - 1e-3, (c_w8, c_full)  # strictly fewer error sources
    assert c_clip > 0.98, c_clip


@pytest.mark.slow
def test_int8_per_channel_activations(tiny_fp, rng):
    """per_channel_act: vector activation scales thread the whole graph
    (concat = scale-vector concat, C3 split = scale slice, Focus = 4x tile)
    and track the fp model at least as well as per-tensor scales."""
    model, spec, variables = tiny_fp
    variables = _boost_variables(variables, rng)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)

    (dec_fp, _), seg_fp = model.apply(variables, x, train=False)
    dec_fp = np.asarray(dec_fp, np.float32)

    def cos(a, b):
        a, b = a.ravel(), b.ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    # explicit per-tensor baseline (per_channel_act now DEFAULTS to True,
    # so the default build would compare the per-channel model to itself)
    m_pt, _, _ = Q.quantize_for_inference(CFG, variables, [x],
                                          per_channel_act=False)
    (dec_pt, _), _ = m_pt.apply(variables, x, train=False)

    m_pc, _, scales = Q.quantize_for_inference(CFG, variables, [x],
                                               per_channel_act=True)
    assert any(isinstance(s, tuple) for _, s in scales)  # vectors calibrated
    (dec_pc, _), seg_pc = m_pc.apply(variables, x, train=False)

    c_pt = cos(dec_fp, np.asarray(dec_pt, np.float32))
    c_pc = cos(dec_fp, np.asarray(dec_pc, np.float32))
    assert np.isfinite(np.asarray(dec_pc)).all()
    assert c_pc > 0.98, c_pc
    assert c_pc >= c_pt - 5e-3, (c_pc, c_pt)
    # per-element error must not blow up anywhere
    assert float(np.abs(dec_fp[..., :2]
                        - np.asarray(dec_pc)[..., :2]).mean()) < 1.0


@pytest.mark.slow
def test_int8_det_fp_hops(tiny_fp, rng):
    """det_fp_hops=2 keeps one more ring of compute layers fp: the int8
    detection output must track the fp model at least as closely as the
    default one-hop exclusion (more fp coverage can only reduce
    quantization error on the det path)."""
    model, spec, variables = tiny_fp
    variables = _boost_variables(variables, rng)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    (dec_fp, _), _ = model.apply(variables, x, train=False)
    dec_fp = np.asarray(dec_fp, np.float32)

    def cos(a):
        a = np.asarray(a, np.float32).ravel()
        b = dec_fp.ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    m1, _, _ = Q.quantize_for_inference(CFG, variables, [x])
    (dec_1, _), _ = m1.apply(variables, x, train=False)
    m2, _, _ = Q.quantize_for_inference(CFG, variables, [x], det_fp_hops=2)
    (dec_2, _), _ = m2.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(dec_2)).all()
    assert cos(dec_2) >= cos(dec_1) - 1e-3, (cos(dec_2), cos(dec_1))
    # the two exclusion sets genuinely differ
    assert not np.allclose(np.asarray(dec_2), np.asarray(dec_1))
