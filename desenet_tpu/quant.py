"""Post-training int8 (W8A8) inference quantization, TPU-native.

The v5e MXU runs int8 x int8 -> int32 contractions at 2x the bf16 rate, and
— the bigger lever here — int8 activations halve HBM traffic on a forward
pass that is bandwidth-bound (PERF.md: 23.3 GB accessed per b128 eval
forward at ~0.8 TB/s peak). Measured on-chip: a representative backbone conv
(b128, 80x80x128, 3x3) runs 1.35x faster with int8 operands end-to-end.

Design (static, compile-time scales — no dynamic quantization ops):

- ``QTensor`` = (int8 data, *Python float* scale). Scales are trace-time
  constants, so every requantization factor folds into the conv epilogue and
  XLA fuses dequant -> BN-affine -> SiLU -> requant into the conv itself;
  nothing but int8 tensors crosses HBM between conv sites.
- Weights: per-output-channel symmetric int8, quantized at trace time from
  the fp32 params (weight tensors are ~7.5M values — re-quantizing per call
  is noise next to activation traffic, and the checkpoint stays a single
  fp32 source of truth; no second serialized format).
- Activations: per-tensor symmetric scales calibrated offline by running a
  few batches with each conv site ``sow``-ing the absmax of its output into
  a ``qcal`` collection (max-reduced across calls); see
  :func:`calibrate_scales`.
- BatchNorm (inference = running stats) folds into the epilogue affine:
  y = silu((conv_i32 * (s_in * s_w[c] * g[c])) + b[c]), then
  q = round(y / s_out) clipped to [-127, 127].
- Graph glue stays int8: maxpool / nearest-upsample / space-to-depth slices
  are order- or scale-preserving; channel concat requantizes parts to the
  max part scale; residual adds requantize to a calibrated add-site scale.
- Heads (Detect, SegMask*) dequantize at entry and run bf16: they are a
  small fraction of traffic and the decode/argmax numerics gate parity.

The reference has no quantized path (fp16 eval only, scripts/val.py:178);
this is a TPU-first capability addition measured against the bf16 path's
accuracy on the val stack (see tests/test_quant.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

QMAX = 127.0

# A scale is either a Python float (per-tensor) or a tuple of floats
# (per-LAST-DIM-channel). Both are hashable pytree aux data — trace-time
# constants that fold into conv epilogues / kernels.
Scale = Union[float, Tuple[float, ...]]


def scale_arr(s: Scale) -> jax.Array:
    """Scale as a jnp constant broadcastable over a channels-last tensor."""
    if isinstance(s, tuple):
        return jnp.asarray(s, jnp.float32)
    return jnp.float32(s)


def scale_vec(s: Scale, c: int) -> np.ndarray:
    """Scale as an explicit length-c numpy vector."""
    if isinstance(s, tuple):
        v = np.asarray(s, np.float32)
        assert v.shape == (c,), (v.shape, c)
        return v
    return np.full(c, s, np.float32)


def scale_max(s: Scale) -> float:
    return float(np.max(s)) if isinstance(s, tuple) else float(s)


@jax.tree_util.register_pytree_node_class
class QTensor:
    """int8 activation tensor with a static (trace-time) symmetric scale.

    real value = data * scale (scale per-tensor, or per-channel over the
    last dim — see ``Scale``). Deliberately NOT a tuple subclass: layer code
    distinguishes "list of inputs" from "one quantized input" with
    isinstance checks. The scale is pytree aux data, so it stays a Python
    constant (compile-time) across jit boundaries.
    """

    __slots__ = ("data", "scale")

    def __init__(self, data: jax.Array, scale: Scale):
        self.data = data
        self.scale = scale

    def tree_flatten(self):
        return (self.data,), self.scale

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    def __repr__(self):
        return f"QTensor({self.data.shape}, scale={self.scale})"


QArray = Union[jax.Array, QTensor]


@dataclasses.dataclass(frozen=True)
class QuantCfg:
    """Static quantization config threaded through the module tree.

    mode:
      - "calib": fp path, every conv site sows output absmax into ``qcal``.
      - "int8":  quantized inference path using ``scales``.
    scales: ((site_key, scale), ...) — site_key is the flax scope path of the
      sow site joined with '/', e.g. "l4/cv1/out"; scale is absmax/127.
    """

    mode: str = "calib"
    scales: Tuple[Tuple[str, float], ...] = ()
    # calibration range statistic: 100.0 = absmax; else |y| percentile
    # (99.9 clips rare outliers => finer steps for the bulk — standard PTQ)
    calib_pct: float = 99.9
    # weight-quantization bias correction (Nagel et al. 2019): subtract
    # E[conv(x, W_q) - conv(x, W)] = sum_hwi (deq(q(W)) - W)[...,o] * E_x[i]
    # from each conv epilogue, using calibrated per-channel input means.
    # Trace-time constants — folds into the existing requant epilogue.
    in_means: Tuple[Tuple[str, Tuple[float, ...]], ...] = ()
    bias_correct: bool = False
    # per-channel MSE-optimal weight clip search (quantize_kernel mse_clip)
    mse_clip: bool = False
    # per-channel activation scales: calibration sows per-channel range
    # vectors and every activation site carries a tuple scale; consumers
    # fold the vector into their kernels (int8_conv_block), so the int8
    # program shape is unchanged. Targets the activation share of the int8
    # accuracy gap (per-tensor scales waste range on the widest channel).
    per_channel_act: bool = False
    # diagnostic/ablation mode: quantize WEIGHTS only (activations stay in
    # the compute dtype) — isolates the weight-rounding share of the int8
    # accuracy gap. ConvBnAct runs its fp graph with the kernel
    # round-tripped through per-channel int8.
    weights_only: bool = False

    def scale_for(self, key: str) -> float:
        d = _scales_dict(self.scales)
        if key not in d:
            raise KeyError(
                f"no calibrated scale for site {key!r}; re-run calibration "
                f"({len(d)} sites known)")
        return d[key]

    def mean_for(self, key: str):
        """Calibrated per-channel input mean for a conv site (np.ndarray),
        or None when absent / bias correction is off."""
        if not self.bias_correct:
            return None
        d = _scales_dict(self.in_means)
        v = d.get(key)
        return None if v is None else np.asarray(v, np.float32)

    @property
    def is_calib(self) -> bool:
        return self.mode == "calib"

    @property
    def is_int8(self) -> bool:
        return self.mode == "int8" and not self.weights_only

    @property
    def is_w8(self) -> bool:
        """Weights-only quantization (fp activations)."""
        return self.mode == "int8" and self.weights_only


_SCALES_CACHE: Dict[Tuple, Dict[str, float]] = {}


def _scales_dict(scales: Tuple[Tuple[str, float], ...]) -> Dict[str, float]:
    d = _SCALES_CACHE.get(scales)
    if d is None:
        d = dict(scales)
        _SCALES_CACHE[scales] = d
    return d


def quantize(x: jax.Array, scale: Scale) -> QTensor:
    """fp tensor -> QTensor at the given static scale (round, saturate)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale_arr(scale)),
                 -QMAX, QMAX)
    return QTensor(q.astype(jnp.int8), scale)


def dequantize(x: QArray, dtype=jnp.float32) -> jax.Array:
    if isinstance(x, QTensor):
        return (x.data.astype(jnp.float32) * scale_arr(x.scale)).astype(dtype)
    return x


def requantize(x: QTensor, scale: Scale) -> QTensor:
    """Change a QTensor's scale (exact when scale >= x.scale)."""
    if scale == x.scale:
        return x
    r = x.data.astype(jnp.float32) * (scale_arr(x.scale) / scale_arr(scale))
    return QTensor(jnp.clip(jnp.round(r), -QMAX, QMAX).astype(jnp.int8), scale)


def qt_slice(x: QTensor, lo: int, hi: int) -> QTensor:
    """Channel slice [..., lo:hi] with the matching scale slice."""
    s = x.scale[lo:hi] if isinstance(x.scale, tuple) else x.scale
    return QTensor(x.data[..., lo:hi], s)


def qt_concat(xs: Sequence[QArray], axis: int = -1) -> QArray:
    """Channel concat of QTensors. Per-tensor scales: requantize every part
    to the max part scale (no clipping possible) and concat int8.
    Per-channel scales anywhere: concat the scale VECTORS instead — no data
    touch at all (consumers fold per-channel scales into their kernels)."""
    if not any(isinstance(x, QTensor) for x in xs):
        return jnp.concatenate(list(xs), axis=axis)
    assert all(isinstance(x, QTensor) for x in xs), "mixed QT/fp concat"
    if any(isinstance(x.scale, tuple) for x in xs):
        assert axis in (-1, xs[0].data.ndim - 1), "per-channel concat on C"
        s = tuple(float(v) for x in xs
                  for v in scale_vec(x.scale, x.data.shape[-1]))
        return QTensor(jnp.concatenate([x.data for x in xs], axis=axis), s)
    s = max(x.scale for x in xs)
    return QTensor(
        jnp.concatenate([requantize(x, s).data for x in xs], axis=axis), s)


def qt_add(a: QTensor, b: QTensor, out_scale: Scale) -> QTensor:
    """Residual add: dequant both in-register, requant at the calibrated
    add-site scale. Fuses into the producer conv's epilogue."""
    y = (a.data.astype(jnp.float32) * scale_arr(a.scale)
         + b.data.astype(jnp.float32) * scale_arr(b.scale))
    return QTensor(
        jnp.clip(jnp.round(y / scale_arr(out_scale)),
                 -QMAX, QMAX).astype(jnp.int8),
        out_scale)


def quantize_kernel(w: jax.Array,
                    mse_clip: bool = False) -> Tuple[jax.Array, jax.Array]:
    """HWIO fp32 kernel -> (int8 kernel, per-output-channel scale [O]).

    Symmetric per-channel: s_w[o] = absmax(w[..., o]) / 127.

    ``mse_clip``: instead of the absmax scale, grid-search a per-channel
    clip ratio r in [0.55, 1.0] minimizing the weight reconstruction MSE
    (saturating rare outlier taps buys finer steps for the bulk — the cheap
    core of AdaRound-family PTQ). Runs as a lax.scan over 10 candidates so
    only one kernel-sized temporary is live; with baked weights the whole
    search constant-folds at compile time.
    """
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    s_abs = jnp.maximum(absmax, 1e-12) / QMAX
    if not mse_clip:
        qw = jnp.clip(jnp.round(w / s_abs), -QMAX, QMAX).astype(jnp.int8)
        return qw, s_abs

    ratios = jnp.linspace(0.55, 1.0, 10)

    def try_ratio(best, r):
        best_err, best_s = best
        s = s_abs * r
        q = jnp.clip(jnp.round(w / s), -QMAX, QMAX)
        err = jnp.sum((q * s - w) ** 2, axis=(0, 1, 2))
        take = err < best_err
        return (jnp.where(take, err, best_err),
                jnp.where(take, s, best_s)), None

    init = (jnp.full(absmax.shape, jnp.inf, jnp.float32), s_abs)
    (_, s_w), _ = jax.lax.scan(try_ratio, init, ratios)
    qw = jnp.clip(jnp.round(w / s_w), -QMAX, QMAX).astype(jnp.int8)
    return qw, s_w


def int8_conv_block(
    x: Union[QTensor, Sequence[QTensor]],
    kernel_f32: jax.Array,
    *,
    stride: int = 1,
    padding=((0, 0), (0, 0)),
    dilation: int = 1,
    groups: int = 1,
    bn: Optional[Tuple[jax.Array, jax.Array]] = None,  # (scale[c], bias[c])
    bias: Optional[jax.Array] = None,
    act=None,  # callable on fp32, or None
    residual: Optional[QTensor] = None,
    out_scale: Optional[float],  # None: return fp (out_dtype) instead of int8
    out_dtype=jnp.float32,
    in_mean=None,  # (C_in,) calibrated input channel means -> bias correction
    mse_clip: bool = False,  # per-channel MSE clip search (quantize_kernel)
) -> Union[QTensor, jax.Array]:
    """Fused int8 conv + dequant -> (BN affine | bias) -> act (-> +residual)
    -> requant.

    ``x`` may be a LIST of QTensors: an implicit channel-concat, convolved
    by slicing the quantized kernel per part and accumulating the dequantized
    partials in fp32 (the int8 analog of layers._SplitConv). This skips both
    the concat materialization AND the per-part requant a real int8 concat
    would need — each part is read once, as int8.

    ``residual`` folds a shortcut add (reference Bottleneck, common.py:111)
    into the same epilogue, so the residual is read as int8 and no separate
    add+requant pass exists.

    All per-channel constants are fp32 vectors; XLA fuses the epilogue chain
    into the conv output so only int8 reaches HBM.
    """
    parts = list(x) if isinstance(x, (list, tuple)) else [x]
    # Per-channel activation scales fold into the kernel BEFORE weight
    # quantization: conv(x, K) = conv(x_q, K * s_in[i]) — the per-output-
    # channel weight scale absorbs the fold exactly, so the int8 program is
    # unchanged, only its constants differ. Grouped convs fall back to a
    # per-tensor input scale (requant to the channel max).
    per_channel_in = any(isinstance(p.scale, tuple) for p in parts)
    if per_channel_in and groups != 1:
        parts = [requantize(p, scale_max(p.scale)) for p in parts]
        per_channel_in = False
    if per_channel_in:
        s_in = np.concatenate([scale_vec(p.scale, p.data.shape[-1])
                               for p in parts])
        kernel_src = (kernel_f32.astype(jnp.float32)
                      * jnp.asarray(s_in)[None, None, :, None])
    else:
        s_in = None
        kernel_src = kernel_f32
    qw, s_w = quantize_kernel(kernel_src, mse_clip=mse_clip)
    g = s_w * bn[0] if bn is not None else s_w
    corr = None
    if in_mean is not None and groups == 1:
        # expected weight-quantization output shift per channel; the kernel
        # taps each input channel once per spatial offset, so the conv's
        # expected error is the tap-summed weight error against E_x (valid
        # away from borders; padding rows contribute ~0 either way).
        # With folded per-channel scales the error acts on x_q, whose
        # expectation is E_x / s_in.
        w_err = (qw.astype(jnp.float32) * s_w
                 - kernel_src.astype(jnp.float32))
        e_x = np.asarray(in_mean, np.float32)
        if s_in is not None:
            e_x = e_x / s_in
        corr = jnp.einsum("hwio,i->o", w_err, jnp.asarray(e_x, jnp.float32))
        if bn is not None:
            corr = corr * bn[0]  # error passes through the BN scale
    acc = None
    off = 0
    for p in parts:
        c = p.data.shape[-1]
        w = qw if len(parts) == 1 else jax.lax.slice_in_dim(
            qw, off, off + c, axis=2)
        off += c
        y = jax.lax.conv_general_dilated(
            p.data, w,
            (stride, stride), padding,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (g if per_channel_in else g * p.scale)
        acc = y if acc is None else acc + y
    if bn is not None:
        acc = acc + bn[1]
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    if corr is not None:
        acc = acc - corr
    if act is not None:
        acc = act(acc)
    if residual is not None:
        acc = acc + (residual.data.astype(jnp.float32)
                     * scale_arr(residual.scale))
    if out_scale is None:
        return acc.astype(out_dtype)
    q = jnp.clip(jnp.round(acc / scale_arr(out_scale)), -QMAX, QMAX)
    return QTensor(q.astype(jnp.int8), out_scale)


def bn_fold_constants(bn_params, bn_stats, eps: float = 1e-3):
    """flax BatchNorm params/stats -> (scale[c], bias[c]) running-stats fold."""
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mu = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    s = gamma * jax.lax.rsqrt(var + eps)
    return s, beta - mu * s


def flatten_qcal(tree) -> Dict[str, Scale]:
    """Flatten a mutated ``qcal`` collection into {site_key: scale}.

    sow values are stored as tuples (flax appends); we max-reduce at sow
    time so each leaf is a 1-tuple of a scalar absmax (per-tensor mode) or
    a per-channel absmax vector (per_channel_act mode) — the latter flattens
    to a tuple-of-floats scale.
    """
    out: Dict[str, Scale] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            v = node[0] if isinstance(node, (tuple, list)) else node
            a = np.asarray(jax.device_get(v), np.float64)
            if a.ndim == 0:
                out["/".join(path)] = max(float(a), 1e-8) / QMAX
            else:
                out["/".join(path)] = tuple(
                    float(x) for x in np.maximum(a, 1e-8) / QMAX)

    walk(tree, ())
    return out


def flatten_qmean(tree) -> Dict[str, np.ndarray]:
    """Flatten a mutated ``qmean`` collection into {site_key: channel sums}
    (divide by the batch count for means)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            v = node[0] if isinstance(node, (tuple, list)) else node
            out["/".join(path)] = np.asarray(jax.device_get(v), np.float64)

    walk(tree, ())
    return out


def calibrate_stats(model, variables, batches):
    """Run calibration batches through a mode="calib" model; return
    (scales, in_means) static tuples for QuantCfg(mode="int8").

    ``model`` must be built with quant=QuantCfg(mode="calib")
    (see build_model). Scales are max-reduced across batches; per-channel
    input means (for bias correction) are averaged across batches.
    """
    @jax.jit
    def run(variables, x):
        _, mut = model.apply(variables, x, train=False,
                             mutable=["qcal", "qmean"])
        return mut["qcal"], mut.get("qmean", {})

    acc: Dict[str, Scale] = {}
    mean_acc: Dict[str, np.ndarray] = {}
    n = 0
    for x in batches:
        qcal, qmean = run(variables, x)
        for k, v in flatten_qcal(jax.device_get(qcal)).items():
            prev = acc.get(k)
            if prev is None:
                acc[k] = v
            elif isinstance(v, tuple):  # element-wise max for vectors
                acc[k] = tuple(float(x) for x in
                               np.maximum(np.asarray(prev), np.asarray(v)))
            else:
                acc[k] = max(prev, v)
        for k, v in flatten_qmean(jax.device_get(qmean)).items():
            mean_acc[k] = mean_acc.get(k, 0.0) + v
        n += 1
    scales = tuple(sorted(acc.items()))
    in_means = tuple(sorted(
        (k, tuple(float(x) for x in v / max(n, 1)))
        for k, v in mean_acc.items()))
    return scales, in_means


def calibrate_scales(model, variables, batches) -> Tuple[Tuple[str, float], ...]:
    """Back-compat wrapper around :func:`calibrate_stats` (scales only)."""
    return calibrate_stats(model, variables, batches)[0]


def qt_resize_bilinear(x: QTensor, out_hw, align_corners: bool) -> QTensor:
    """Bilinear resize of a QTensor at the SAME scale (interpolation is a
    convex combination, so |out| <= max|in| — no clipping possible beyond
    rounding). Reads int8, computes the separable contraction in fp32,
    writes int8."""
    from desenet_tpu.ops.resize import resize_bilinear

    y = resize_bilinear(x.data.astype(jnp.float32), out_hw,
                        align_corners=align_corners)
    return QTensor(
        jnp.clip(jnp.round(y), -QMAX, QMAX).astype(jnp.int8), x.scale)


def qt_global_avg_pool(x: QTensor, out_k=1) -> QTensor:
    """Adaptive average pool of a QTensor at the SAME scale (averaging is
    convex). Reads int8, reduces in fp32, writes a tiny int8 map."""
    from desenet_tpu.ops.resize import adaptive_avg_pool

    y = adaptive_avg_pool(x.data.astype(jnp.float32), out_k)
    return QTensor(
        jnp.clip(jnp.round(y), -QMAX, QMAX).astype(jnp.int8), x.scale)


def quantize_for_inference(cfg, variables, calib_batches, bias_correct=True,
                           mse_clip=False, weights_only=False,
                           per_channel_act=True, **build_kw):
    """One-call PTQ: calibrate activation scales on a few batches, return
    (int8_model, spec, scales). ``build_kw`` are forwarded to build_model
    (dtype, seg_upsample, ...); variables are the trained fp variables and
    remain the single source of truth (weights re-quantize at trace time).
    ``bias_correct`` folds the expected weight-quantization output shift
    into each conv epilogue (calibrated input means; Nagel et al. 2019).
    ``mse_clip`` searches per-channel MSE-optimal weight clips instead of
    absmax scales (measured a no-op at int8 — see PERF.md round 4).
    ``weights_only`` quantizes only the weights (fp activations) — the
    ablation mode separating weight-rounding error from
    activation-quantization error. ``per_channel_act`` (default True)
    uses per-channel activation scales (channel absmax clipped at the
    global percentile): measured det mAP50 0.373 == bf16 on the s640
    ckpt vs 0.366 per-tensor (PERF.md round 4).
    """
    from desenet_tpu.models import build_model

    calib_model, _ = build_model(
        cfg, quant=QuantCfg(mode="calib", per_channel_act=per_channel_act),
        **build_kw)
    scales, in_means = calibrate_stats(calib_model, variables, calib_batches)
    model, spec = build_model(
        cfg, quant=QuantCfg(mode="int8", scales=scales, in_means=in_means,
                            bias_correct=bias_correct, mse_clip=mse_clip,
                            weights_only=weights_only,
                            per_channel_act=per_channel_act), **build_kw)
    return model, spec, scales


# ---------------------------------------------------------------------------
# module-side helpers (called from layers.py block code)


def sow_absmax(mdl, site: str, y: jax.Array) -> None:
    """Record the running range statistic of |y| at this module's ``site``
    (calib mode): absmax, or the configured percentile (QuantCfg.calib_pct);
    per-channel vectors when QuantCfg.per_channel_act."""
    a = jnp.abs(y.astype(jnp.float32))
    q = mdl.quant
    pct = q.calib_pct if q is not None else 100.0
    if q is not None and q.per_channel_act:
        # Per-channel absmax, CLIPPED at the global percentile: the result
        # is <= the per-tensor percentile scale in every channel (strictly
        # finer steps for narrow channels, identical outlier clipping for
        # wide ones). Plain per-channel absmax measured WORSE than
        # per-tensor-99.9pct (0.363 vs 0.366 mAP50, round 4): two calib
        # batches of channel maxima admit the outliers percentile removed.
        # A true per-COLUMN percentile is off the table: its 3.2M-row
        # column sorts stalled the tunnel compile >10 min per site.
        stat = jnp.max(a, axis=tuple(range(a.ndim - 1)))
        if pct < 100.0:
            stat = jnp.minimum(stat, jnp.percentile(a, pct))
        init = lambda: jnp.zeros((y.shape[-1],), jnp.float32)  # noqa: E731
    else:
        stat = jnp.max(a) if pct >= 100.0 else jnp.percentile(a, pct)
        init = lambda: jnp.asarray(0.0, jnp.float32)  # noqa: E731
    mdl.sow("qcal", site, stat, init_fn=init, reduce_fn=jnp.maximum)


def sow_in_range(mdl, site: str, parts) -> None:
    """Record the range of a conv INPUT (concat of ``parts`` along
    channels): scalar absmax, or the per-channel concat vector when
    QuantCfg.per_channel_act."""
    q = mdl.quant
    if q is not None and q.per_channel_act:
        pct = q.calib_pct
        vecs = []
        for v in parts:
            a = jnp.abs(v.astype(jnp.float32))
            m = jnp.max(a, axis=tuple(range(a.ndim - 1)))
            if pct < 100.0:  # same clip policy as sow_absmax per-channel
                m = jnp.minimum(m, jnp.percentile(a, pct))
            vecs.append(m)
        stat = jnp.concatenate(vecs)
        c = sum(v.shape[-1] for v in parts)
        init = lambda: jnp.zeros((c,), jnp.float32)  # noqa: E731
    else:
        stat = jnp.stack([jnp.max(jnp.abs(v.astype(jnp.float32)))
                          for v in parts]).max()
        init = lambda: jnp.asarray(0.0, jnp.float32)  # noqa: E731
    mdl.sow("qcal", site, stat, init_fn=init, reduce_fn=jnp.maximum)


def sow_channel_mean(mdl, site: str, parts) -> None:
    """Record the per-channel mean of a conv INPUT (concat of ``parts``
    along channels) for bias correction; summed across calls (divide by the
    batch count in calibrate_stats)."""
    m = jnp.concatenate(
        [p.astype(jnp.float32).mean(axis=(0, 1, 2)) for p in parts])
    mdl.sow("qmean", site, m,
            init_fn=lambda: jnp.zeros_like(m),
            reduce_fn=lambda a, b: a + b)


def site_key(mdl, site: str) -> str:
    return "/".join(tuple(mdl.scope.path) + (site,))
