"""NN building blocks (flax.linen, NHWC) — capability parity with the
reference module library (core/models/common.py), re-designed for TPU.

Layout and numerics decisions:

- NHWC activations, HWIO kernels (TPU native). The torch reference is
  NCHW/OIHW; the checkpoint converter transposes.
- Explicit symmetric padding ((k//2, k//2)) like torch's Conv2d(padding=k//2),
  NOT XLA 'SAME' — for stride-2 convs the two differ in window alignment and
  would break weight-conversion parity (reference common.py:32-39).
- BatchNorm: eps=1e-3, torch-momentum 0.03 => flax momentum 0.97
  (reference torch_utils.py:160-168); stats/params in fp32, compute dtype
  configurable (bf16 on TPU).
- torch-style default init (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(fan_in)))
  so from-scratch training matches the reference's initialization statistics.
- The reference's Conv quirk — BN is *skipped* when the spatial map is 1x1
  (common.py:53, fires on every channel-attention/global-pool branch) — is a
  static shape condition here, replicated exactly.

Each class cites the reference lines it mirrors behaviorally.
"""

from __future__ import annotations

import contextlib
import contextvars
import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from desenet_tpu.ops.resize import (
    adaptive_avg_pool,
    max_pool_same,
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
)
from desenet_tpu import quant as Q
from desenet_tpu.quant import QTensor, QuantCfg

Dtype = Any


def _name_conv_out(y):
    """Tag a conv output with checkpoint_name("conv_out") so a remat policy
    can save ONLY conv outputs and recompute the cheap BN/SiLU elementwise
    chains in the backward (train.step `remat_convs`). Identity outside
    jax.checkpoint. Measured on v5e (tools/probe_remat_convs.py): the policy
    LOSES ~12% step time vs no remat — XLA's default residual choice already
    beats the recompute's extra reads — so remat_convs is a memory option
    (milder than full nn.remat), not a perf one; see PERF.md."""
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(y, "conv_out")


def autopad(k, p=None):
    """'same' padding = k//2 (reference common.py:32-39)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def make_divisible(x, divisor=8):
    """Round channel count up to a multiple of divisor (general.py:250-253)."""
    return int(math.ceil(x / divisor) * divisor)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    shape is HWIO; fan_in = H * W * I (I is already per-group in flax).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default on an (in, out) flax kernel."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _SplitConv(nn.Module):
    """Conv over an implicit channel-concat of several inputs, without
    materializing the concat.

    conv(concat(xs), W) == sum_i conv(x_i, W[:, :, off_i:off_i+c_i, :]) —
    exact up to f32 reassociation. This libtpu decomposes channel concats
    into pad+maximum chains that write full-size zero-padded tensors per
    operand (see PERF.md "HLO-level findings"); feeding the parts directly
    keeps HBM traffic at the parts themselves. Parameter name/shape/init are
    IDENTICAL to the nn.Conv("conv2d") the dense path uses, so checkpoints
    and the torch converter are unaffected.
    """

    features: int
    kernel: int
    stride: int
    pad: tuple
    dilation: int
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        c_in = sum(x.shape[-1] for x in xs)
        kshape = (self.kernel, self.kernel, c_in, self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kshape,
                            jnp.float32)
        kernel = kernel.astype(self.dtype)
        acc = None
        off = 0
        for x in xs:
            c = x.shape[-1]
            w = jax.lax.slice_in_dim(kernel, off, off + c, axis=2)
            off += c
            # operands and output in self.dtype, exactly like the dense
            # nn.Conv path (the MXU still accumulates each partial in f32;
            # a preferred_element_type=f32 output here would make AD's
            # transpose convs mixed-dtype, which lax rejects)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w,
                (self.stride, self.stride), self.pad,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            acc = y if acc is None else acc + y
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_conv_bias_init(c_in * self.kernel * self.kernel),
                (self.features,), jnp.float32)
            acc = acc + bias.astype(self.dtype)
        return _name_conv_out(acc.astype(self.dtype))


class Conv2d(nn.Module):
    """Bare conv with torch-compatible explicit padding and init.

    The workhorse under every block; named `conv` inside ConvBnAct so torch
    checkpoints map as model.N.conv.weight -> .../conv/kernel.

    Accepts either one array or a LIST of arrays; a list means "conv over
    the channel-concat of these" and routes through _SplitConv (same params,
    no concat materialization — see PERF.md).
    """

    features: int
    kernel: int = 1
    stride: int = 1
    padding: Optional[int] = None  # None => autopad (k//2)
    groups: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = autopad(self.kernel, self.padding)
        pad = ((p, p), (p, p)) if isinstance(p, int) else tuple((v, v) for v in p)
        if isinstance(x, (list, tuple)):
            if self.groups != 1:
                raise ValueError("split-conv input requires groups=1")
            return _SplitConv(self.features, self.kernel, self.stride, pad,
                              self.dilation, self.use_bias, self.dtype,
                              name="conv2d")(list(x))
        conv = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(
                (x.shape[-1] // self.groups) * self.kernel * self.kernel
            ),
            name="conv2d",
        )
        return _name_conv_out(conv(x))


class BatchNorm(nn.Module):
    """BN with reference hyperparams (eps 1e-3, torch momentum 0.03)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = to_compute(x, self.dtype)  # fp8-stored input (standalone BN row)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=None,
            name="bn",
        )(x)


def silu(x):
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# fp8 activation STORAGE (inference-only HBM traffic reduction).
#
# The eval forward is HBM-bound (PERF.md): activations dominate the bytes.
# When a storage dtype is scoped here, every ConvBnAct/DilatedConvBnSiLU
# casts its OUTPUT to it (fp8_e4m3: half the bytes of bf16) while all
# compute stays in the block's compute dtype — XLA fuses the down-convert
# into the producing fusion's write and the up-convert into each consumer's
# read, so the fp8 tensor is what lives in HBM. int8 W8A8 failed to pay off
# on this libtpu because of requant epilogues and s32 conv outputs
# (PERF.md "int8"); fp8 storage has neither problem: no calibration, no
# epilogue, dynamic per-value exponent.
#
# Scoped per-layer by the model walker (models/build.py `act_store=`):
# layers feeding Detect are excluded — same policy and reasoning as the
# int8 path (the val conf=0.001 tail is precision-sensitive there).
# ---------------------------------------------------------------------------

_F8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)

_ACT_STORE: contextvars.ContextVar = contextvars.ContextVar(
    "desenet_act_store", default=None)


@contextlib.contextmanager
def act_store_scope(dtype):
    """Scope a storage dtype for block outputs (None = no-op scope)."""
    token = _ACT_STORE.set(dtype)
    try:
        yield
    finally:
        _ACT_STORE.reset(token)


def _store_act(y, train: bool):
    """Cast a block output to the scoped storage dtype (eval only).

    Tensors with a 1x1 spatial map (channel-attention gates, global-pool
    branches) are left in the compute dtype: they are a few KB of HBM, and
    quantizing the statistics that gate entire feature maps buys nothing."""
    st = _ACT_STORE.get()
    if (st is None or train or not isinstance(y, jax.Array)
            or y.dtype == st or not jnp.issubdtype(y.dtype, jnp.floating)):
        return y
    if y.ndim >= 3 and math.prod(y.shape[1:-1]) <= 1:
        return y
    return y.astype(st)


def to_compute(x, dtype):
    """Upcast a storage-dtype (fp8) activation for raw elementwise ops —
    adds/multiplies/pools that cannot take fp8 operands (e4m3 has no inf,
    and mixed fp8/bf16 ops are rejected by JAX's promotion rules). The
    convert fuses into the consumer's read; no-op for compute dtypes."""
    if isinstance(x, jax.Array) and x.dtype in _F8_DTYPES:
        return x.astype(dtype)
    return x


def _sum_channels(x) -> int:
    """Channel count of a tensor, QTensor, or implicit-concat list."""
    if isinstance(x, (list, tuple)):
        return sum(_sum_channels(v) for v in x)
    if isinstance(x, QTensor):
        return x.data.shape[-1]
    return x.shape[-1]


# Minimum per-part channel width for the implicit-concat (split-conv) path.
# Narrow parts starve the MXU's 128-deep contraction and lose more than the
# concat materialization costs (measured: full split-everything regressed
# b128 inference 2684 -> 2295 img/s; see PERF.md). Parts at >=128 channels
# keep the MXU full and skip this libtpu's pad+maximum concat rewrite.
SPLIT_CONV_MIN_PART = int(os.environ.get("DESENET_SPLIT_MIN_PART", "128"))


def dus_concat(xs, axis=-1):
    """Channel concat via dynamic_update_slice composition. NOT used on the
    production path: an isolated scan-loop probe showed concat 27.3 ms vs DUS
    1.58 ms at an early-C3 shape, but substituting DUS model-wide REGRESSED
    the b128 bench 47.7 -> 54.9 ms (the probe's concat was an un-hoisted loop
    invariant; in the real graph concats fuse). Kept for targeted use."""
    assert axis in (-1, xs[0].ndim - 1), "channel concat only"
    c = sum(v.shape[-1] for v in xs)
    buf = jnp.empty((*xs[0].shape[:-1], c), xs[0].dtype)
    off = 0
    for v in xs:
        idx = (0,) * (v.ndim - 1) + (off,)
        buf = jax.lax.dynamic_update_slice(buf, v.astype(buf.dtype), idx)
        off += v.shape[-1]
    return buf


def widen_mixed(xs):
    """Unify a part list with mixed storage/compute dtypes (an fp8-stored
    part next to a bf16 one, e.g. at a det-src exclusion boundary or a
    1x1-spatial no-store branch) to the widest compute dtype, for a
    materialized concat. No-op when dtypes already agree."""
    if len({v.dtype for v in xs}) > 1:
        wide = jnp.result_type(*[jnp.bfloat16 if v.dtype in _F8_DTYPES
                                 else v.dtype for v in xs])
        xs = [v.astype(wide) for v in xs]
    return list(xs)


def maybe_cat(xs, axis=-1):
    """Return the list (implicit concat) when every part is MXU-wide enough,
    else materialize the concat."""
    if all(v.shape[-1] >= SPLIT_CONV_MIN_PART for v in xs):
        return list(xs)
    return jnp.concatenate(widen_mixed(xs), axis=axis)


def qt_maybe_cat(xs):
    """int8 analog of maybe_cat: keep the implicit concat (consumer runs the
    int8 split-conv) when every part is MXU-wide, else materialize via
    qt_concat (requant to a common scale). Same width gate as bf16 — narrow
    int8 parts starve the MXU contraction just the same.

    Parts may be fp at a quant boundary (e.g. det_fp_hops keeps a Concat
    input's producer full-precision): wide mixed lists stay implicit (the
    int8 consumer quantizes fp parts at its per-part input-scale slice,
    ConvBnAct._int8_call); narrow mixed lists materialize in fp and the
    consumer re-quantizes the whole concat at its calibrated 'in' site."""
    if all((v.data if isinstance(v, QTensor) else v).shape[-1]
           >= SPLIT_CONV_MIN_PART for v in xs):
        return list(xs)
    if all(isinstance(v, QTensor) for v in xs):
        return Q.qt_concat(xs)
    fp_dt = next((v.dtype for v in xs if not isinstance(v, QTensor)),
                 jnp.float32)
    parts = [Q.dequantize(v, fp_dt) if isinstance(v, QTensor) else v
             for v in xs]
    return jnp.concatenate(widen_mixed(parts), axis=-1)


def _spatial(x):
    if isinstance(x, (list, tuple)):
        x = x[0]
    if isinstance(x, QTensor):
        x = x.data
    return x.shape[1:3]


def quantize_at_boundary(mdl, x, site: str):
    """Quantize any fp entries of ``x`` (tensor or implicit-concat list) at
    the module's calibrated input ``site`` scale — the quant-boundary entry
    used by int8 conv blocks whose producer stayed fp (det_fp_hops, det-src
    exclusions). With per_channel_act the calibrated 'in' scale is a vector
    over the CONCAT of all list parts, so each fp part takes its own slice
    at its running channel offset (sow_in_range sows in the same order)."""
    if isinstance(x, (list, tuple)):
        if all(isinstance(v, QTensor) for v in x):
            return list(x)
        s_in = mdl.quant.scale_for(Q.site_key(mdl, site))
        parts, off = [], 0
        for v in x:
            c = (v.data if isinstance(v, QTensor) else v).shape[-1]
            if not isinstance(v, QTensor):
                sv = s_in if np.ndim(s_in) == 0 else s_in[off:off + c]
                v = Q.quantize(v, sv)
            parts.append(v)
            off += c
        return parts
    if not isinstance(x, QTensor):
        return Q.quantize(x, mdl.quant.scale_for(Q.site_key(mdl, site)))
    return x



class ConvBnAct(nn.Module):
    """Conv2d(bias=False) + BN + SiLU — the reference `Conv`/CBL block
    (common.py:42-56), including the 1x1-spatial BN-skip quirk (:53).

    `act`: True => SiLU, False => identity, or a callable.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, Callable] = True
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    def setup(self):
        self.conv = Conv2d(
            self.c2, self.k, self.s, self.p, self.g, self.d, False, self.dtype,
            name="conv",
        )
        self.bn = BatchNorm(self.dtype, name="bn")

    def _act(self, x):
        if self.act is True:
            return silu(x)
        if callable(self.act):
            return self.act(x)
        return x

    def _act_fn(self):
        if self.act is True:
            return silu
        return self.act if callable(self.act) else None

    def _int8_call(self, x, residual=None):
        """W8A8 inference path (quant.py): int8 conv + fused
        dequant->BN-fold->act(->+residual)->requant epilogue; int8-only HBM
        traffic. A list input is an implicit channel-concat convolved
        part-by-part (int8 split-conv) — no concat materialization, no
        requant."""
        if isinstance(x, (list, tuple)) and self.g != 1:
            x = Q.qt_concat(x)  # grouped conv can't slice the kernel freely
        # fp input at a quant boundary (e.g. after an fp-kept det-src layer):
        # quantize at the calibrated input-site scale, slicing per-channel
        # vectors by part offsets (quantize_at_boundary)
        x = quantize_at_boundary(self, x, "in")
        p = autopad(self.k, self.p)
        pad = ((p, p), (p, p)) if isinstance(p, int) else tuple(
            (v, v) for v in p)
        params = self.variables["params"]
        kernel = params["conv"]["conv2d"]["kernel"]
        x0 = x[0] if isinstance(x, (list, tuple)) else x
        bn = None
        # BN-skip quirk: reference checks the conv INPUT map (common.py:53)
        if x0.data.shape[1] * x0.data.shape[2] > 1:
            bn = Q.bn_fold_constants(params["bn"]["bn"],
                                     self.variables["batch_stats"]["bn"]["bn"])
        return Q.int8_conv_block(
            x, kernel, stride=self.s, padding=pad, dilation=self.d,
            groups=self.g, bn=bn, act=self._act_fn(), residual=residual,
            out_scale=self.quant.scale_for(Q.site_key(self, "out")),
            in_mean=self.quant.mean_for(Q.site_key(self, "inmean")),
            mse_clip=self.quant.mse_clip)

    def _w8_call(self, x, train: bool, residual=None):
        """Weights-only mode (QuantCfg.weights_only): the ordinary fp graph
        with the kernel round-tripped through per-channel int8. Isolates the
        weight-rounding share of the full W8A8 accuracy gap (activations
        stay in the compute dtype)."""
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(
                [to_compute(v, self.dtype) for v in x], axis=-1)
        p = autopad(self.k, self.p)
        pad = ((p, p), (p, p)) if isinstance(p, int) else tuple(
            (v, v) for v in p)
        kernel = self.variables["params"]["conv"]["conv2d"]["kernel"]
        qw, s_w = Q.quantize_kernel(kernel, mse_clip=self.quant.mse_clip)
        wdq = (qw.astype(jnp.float32) * s_w)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wdq.astype(self.dtype),
            (self.s, self.s), pad, rhs_dilation=(self.d, self.d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g)
        if x.shape[1] * x.shape[2] > 1:  # BN-skip quirk (common.py:53)
            y = self.bn(y, train)
        if self.quant.bias_correct and self.g == 1:
            im = self.quant.mean_for(Q.site_key(self, "inmean"))
            if im is not None:
                corr = jnp.einsum(
                    "hwio,i->o",
                    wdq - kernel.astype(jnp.float32),
                    jnp.asarray(im, jnp.float32))
                if x.shape[1] * x.shape[2] > 1:
                    bs = self.variables["batch_stats"]["bn"]["bn"]
                    pbn = self.variables["params"]["bn"]["bn"]
                    s_bn, _ = Q.bn_fold_constants(pbn, bs)
                    corr = corr * s_bn
                y = y - corr.astype(y.dtype)
        y = self._act(y)
        if residual is not None:
            y = y + residual
        return y

    def __call__(self, x, train: bool = False, residual=None):
        """``residual`` (optional): shortcut tensor added AFTER the
        activation (reference Bottleneck, common.py:111) so the quantized
        path can fold the add into the conv epilogue; the calibrated 'out'
        site then covers the summed tensor."""
        q = self.quant
        if (q is not None and q.is_int8 and not train
                and not self.is_initializing()):
            return self._int8_call(x, residual=residual)
        if (q is not None and q.is_w8 and not train
                and not self.is_initializing()):
            return self._w8_call(x, train, residual=residual)
        if q is not None and q.is_int8:
            # initializing an int8-mode model: run the fp path to create
            # params, keep the QTensor typing contract for consumers
            if isinstance(x, (list, tuple)):
                x = [Q.dequantize(v, self.dtype) if isinstance(v, QTensor)
                     else v for v in x]
            elif isinstance(x, QTensor):
                x = Q.dequantize(x, self.dtype)
        y = self.conv(x)
        # Reference skips BN when the conv INPUT map is 1x1 (common.py:53
        # checks x[0][0].numel() > 1), not the output — a stride>1 conv from
        # a >1 map down to 1x1 still applies BN there.
        x0 = x[0] if isinstance(x, (list, tuple)) else x
        if x0.shape[1] * x0.shape[2] > 1:
            y = self.bn(y, train)
        y = self._act(y)
        if residual is not None:
            y = y + (Q.dequantize(residual, self.dtype)
                     if isinstance(residual, QTensor) else residual)
        if q is not None:
            if q.is_calib:
                xs = x if isinstance(x, (list, tuple)) else [x]
                # input-site range: used only when this conv sits at a
                # quant boundary and must quantize an fp input itself
                Q.sow_in_range(self, "in", xs)
                Q.sow_channel_mean(self, "inmean", xs)
                Q.sow_absmax(self, "out", y)
            elif q.is_int8:  # initializing
                return Q.quantize(y, q.scale_for(Q.site_key(self, "out")))
        return _store_act(y, train)


class DWConv(nn.Module):
    """Depthwise-ish conv via groups=gcd(c1,c2) (common.py:59-62)."""

    c1: int
    c2: int
    k: int = 1
    s: int = 1
    act: Union[bool, Callable] = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # c1=0 (the compiler's default) derives the group count from the
        # actual input like the reference's gcd(c1, c2) (common.py:59-62);
        # gcd(0, c2) would demand c1 % c2 == 0 and reject e.g. 48ch -> 32ch
        c1 = self.c1 or _sum_channels(x)
        return ConvBnAct(
            self.c2, self.k, self.s, g=math.gcd(c1, self.c2),
            act=self.act, dtype=self.dtype, name="conv",
        )(x, train)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual (common.py:101-111)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        c_in = _sum_channels(x)
        use_res = self.shortcut and c_in == self.c2
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, quant=self.quant,
                      name="cv1")(x, train)
        if use_res:
            # fold the shortcut add into cv2's epilogue: the int8 path reads
            # the residual in-register (calibrated cv2/out covers the sum),
            # the fp path adds in the compute dtype and stores ONCE (no
            # intermediate fp8 round-trip of cv2's output under act_store)
            res = x if self.quant is not None else to_compute(x, self.dtype)
            return ConvBnAct(self.c2, 3, 1, g=self.g, dtype=self.dtype,
                             quant=self.quant, name="cv2")(
                y, train, residual=res)
        return ConvBnAct(self.c2, 3, 1, g=self.g, dtype=self.dtype,
                         quant=self.quant, name="cv2")(y, train)


class BottleneckCSP(nn.Module):
    """Legacy CSP bottleneck with LeakyReLU fusion (common.py:114-130)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, 1.0, self.dtype, name=f"m_{i}")(
                y1, train
            )
        y1 = Conv2d(c_, 1, 1, use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = Conv2d(c_, 1, 1, use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNorm(self.dtype, name="bn")(y, train)
        y = nn.leaky_relu(y, negative_slope=0.1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (common.py:133-145).

    TPU optimization (default): the parallel cv1/cv2 1x1 convs both read x —
    they run as ONE conv to 2*c_ channels (cv12 + joint BN; BN is per-channel
    so joint == separate), halving the block's input HBM traffic and widening
    the MXU N dim. +7% end-to-end forward on v5e. Exactly equivalent; the
    torch converter concatenates/splits cv1/cv2 weights. `fused=False`
    restores the reference layout.
    """

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32
    fused: bool = True
    quant: Optional[QuantCfg] = None

    def _int8_fused_stem(self, x):
        """int8 cv12 (+bn12+silu folded into the requant epilogue); list
        input = implicit concat via the int8 split-conv. fp inputs at a
        quant boundary (det_fp_hops exclusions) quantize at the calibrated
        cv12_in site first."""
        x = quantize_at_boundary(self, x, "cv12_in")
        params = self.variables["params"]
        bn = Q.bn_fold_constants(params["bn12"]["bn"],
                                 self.variables["batch_stats"]["bn12"]["bn"])
        return Q.int8_conv_block(
            x, params["cv12"]["conv2d"]["kernel"], bn=bn, act=silu,
            out_scale=self.quant.scale_for(Q.site_key(self, "cv12_out")),
            in_mean=self.quant.mean_for(Q.site_key(self, "cv12_inmean")))

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        q = self.quant
        q_live = (q is not None and q.is_int8 and not train
                  and not self.is_initializing())
        w8_live = (q is not None and q.is_w8 and not train
                   and not self.is_initializing())
        if self.fused:
            if q_live:
                yq = self._int8_fused_stem(x)
                y1 = Q.qt_slice(yq, 0, c_)
                y2 = Q.qt_slice(yq, c_, yq.data.shape[-1])
            elif w8_live:
                # weights-only mode: fp cv12 with the kernel round-tripped
                # through per-channel int8 (see ConvBnAct._w8_call)
                kernel = self.variables["params"]["cv12"]["conv2d"]["kernel"]
                qw, s_w = Q.quantize_kernel(kernel, mse_clip=q.mse_clip)
                wdq = qw.astype(jnp.float32) * s_w
                xs = x if isinstance(x, (list, tuple)) else [x]
                xc = jnp.concatenate(
                    [to_compute(v, self.dtype) for v in xs], axis=-1)
                y = jax.lax.conv_general_dilated(
                    xc, wdq.astype(self.dtype), (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = BatchNorm(self.dtype, name="bn12")(y, train)
                if q.bias_correct:
                    im = q.mean_for(Q.site_key(self, "cv12_inmean"))
                    if im is not None:
                        corr = jnp.einsum(
                            "hwio,i->o", wdq - kernel.astype(jnp.float32),
                            jnp.asarray(im, jnp.float32))
                        s_bn, _ = Q.bn_fold_constants(
                            self.variables["params"]["bn12"]["bn"],
                            self.variables["batch_stats"]["bn12"]["bn"])
                        y = y - (corr * s_bn).astype(y.dtype)
                y = silu(y)
                y1, y2 = y[..., :c_], y[..., c_:]
            else:
                if q is not None and q.is_int8:  # initializing
                    if isinstance(x, (list, tuple)):
                        x = [Q.dequantize(v, self.dtype)
                             if isinstance(v, QTensor) else v for v in x]
                    elif isinstance(x, QTensor):
                        x = Q.dequantize(x, self.dtype)
                y = Conv2d(2 * c_, 1, 1, dtype=self.dtype, name="cv12")(x)
                y = BatchNorm(self.dtype, name="bn12")(y, train)
                y = silu(y)
                if q is not None and q.is_calib:
                    xs = x if isinstance(x, (list, tuple)) else [x]
                    Q.sow_absmax(self, "cv12_out", y)
                    # input-site range: consumed only when this fused C3
                    # sits at a quant boundary (det_fp_hops) and must
                    # quantize an fp input itself
                    Q.sow_in_range(self, "cv12_in", xs)
                    Q.sow_channel_mean(self, "cv12_inmean", xs)
                if q is not None and q.is_int8:  # initializing
                    y = Q.quantize(
                        y, q.scale_for(Q.site_key(self, "cv12_out")))
                    y1 = Q.qt_slice(y, 0, c_)
                    y2 = Q.qt_slice(y, c_, y.data.shape[-1])
                else:
                    y = _store_act(y, train)
                    y1, y2 = y[..., :c_], y[..., c_:]
        else:
            y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, quant=q,
                           name="cv1")(x, train)
            y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, quant=q,
                           name="cv2")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, 1.0, self.dtype,
                            quant=q, name=f"m_{i}")(y1, train)
        if isinstance(y1, QTensor):
            y = qt_maybe_cat([y1, y2])  # implicit concat if MXU-wide
        else:
            # cv3 is a 1x1: the concat is implicit (split-conv) when the
            # halves pass the MXU-width gate, else materialized
            y = maybe_cat([y1, y2])
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, quant=q,
                         name="cv3")(y, train)


class SPP(nn.Module):
    """Spatial pyramid pooling: parallel stride-1 maxpools (common.py:172-185)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = _sum_channels(x) // 2
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, quant=self.quant,
                      name="cv1")(x, train)
        if isinstance(y, QTensor):
            # max pooling commutes with the positive scale: pool int8 as-is;
            # cv2 consumes the implicit concat via the int8 split-conv
            pools = [y] + [QTensor(max_pool_same(y.data, k), y.scale)
                           for k in self.k]
            return ConvBnAct(self.c2, 1, 1, dtype=self.dtype,
                             quant=self.quant, name="cv2")(
                qt_maybe_cat(pools), train)
        # fp8-stored input: pool in the compute dtype (e4m3 has no -inf for
        # the reduce_window identity); max commutes with the upcast
        y = to_compute(y, self.dtype)
        pools = [y] + [max_pool_same(y, k) for k in self.k]
        # implicit concat: cv2 is a 1x1 over the channel-concat; feeding the
        # list avoids this libtpu's pad+maximum concat decomposition
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, quant=self.quant,
                         name="cv2")(maybe_cat(pools), train)


class SPPF(nn.Module):
    """Serial-pool SPP equivalent (common.py:188-203)."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = _sum_channels(x) // 2
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, quant=self.quant,
                      name="cv1")(x, train)
        if isinstance(y, QTensor):
            y1 = QTensor(max_pool_same(y.data, self.k), y.scale)
            y2 = QTensor(max_pool_same(y1.data, self.k), y.scale)
            y3 = QTensor(max_pool_same(y2.data, self.k), y.scale)
            return ConvBnAct(self.c2, 1, 1, dtype=self.dtype,
                             quant=self.quant, name="cv2")(
                qt_maybe_cat([y, y1, y2, y3]), train)
        y = to_compute(y, self.dtype)  # see SPP: no -inf identity in fp8
        y1 = max_pool_same(y, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        # implicit concat into cv2 (no pad+max materialization, PERF.md)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, quant=self.quant,
                         name="cv2")(maybe_cat([y, y1, y2, y3]), train)


class Focus(nn.Module):
    """Space-to-depth stem: 4-way pixel slice + conv (common.py:618-627).

    Channel concat order matches the torch slicing
    [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2] so converted weights line
    up. (Slice indices are over (H, W): [..., y, x] in torch NCHW ==
    [:, y, x, :] in NHWC.)
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Union[bool, Callable] = True
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = None
        if isinstance(x, QTensor):  # slice/concat preserve the scale
            x, scale = x.data, x.scale
        parts = [
            x[:, ::2, ::2, :],
            x[:, 1::2, ::2, :],
            x[:, ::2, 1::2, :],
            x[:, 1::2, 1::2, :],
        ]
        y = jnp.concatenate(parts, axis=-1)
        if scale is not None:
            if isinstance(scale, tuple):
                scale = scale * 4  # channel concat of 4 same-scaled slices
            y = QTensor(y, scale)
        return ConvBnAct(
            self.c2, self.k, self.s, self.p, self.g, act=self.act,
            dtype=self.dtype, quant=self.quant, name="conv",
        )(y, train)


class Contract(nn.Module):
    """Pixel-unshuffle: (b,h,w,c) -> (b,h/g,w/g,c*g^2) (common.py:658-668)."""

    gain: int = 2

    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        g = self.gain
        # match torch channel ordering: view(N,C,H/g,g,W/g,g) -> C*g*g fastest
        # over (g_h, g_w) then C.  In NHWC: -> (N,H/g,W/g, g*g*C) with
        # (gh, gw) major like the torch permute (0,3,5,1,2,4).
        x = x.reshape(n, h // g, g, w // g, g, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h/g, w/g, gh, gw, c
        return x.reshape(n, h // g, w // g, g * g * c)


class Expand(nn.Module):
    """Pixel-shuffle inverse of Contract (common.py:671-683)."""

    gain: int = 2

    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        g = self.gain
        x = x.reshape(n, h, w, g, g, c // (g * g))
        x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, gh, w, gw, c/g^2
        return x.reshape(n, h * g, w * g, c // (g * g))


class GhostConv(nn.Module):
    """GhostNet conv: primary 1x1 + cheap depthwise (common.py:630-639)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Union[bool, Callable] = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBnAct(
            c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype,
            name="cv1",
        )(x, train)
        y2 = ConvBnAct(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(
            y, train
        )
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck w/ optional stride-2 DW + shortcut path
    (common.py:642-655)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c_, c_, self.k, self.s, act=False, dtype=self.dtype, name="dw")(
                y, train
            )
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="gc2")(y, train)
        if self.s == 2:
            sc = DWConv(c1, c1, self.k, self.s, act=False, dtype=self.dtype,
                        name="sc_dw")(x, train)
            sc = ConvBnAct(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(
                sc, train
            )
        else:
            sc = x if c1 == self.c2 else None
        if sc is None:
            return y
        return _store_act(
            to_compute(y, self.dtype) + to_compute(sc, self.dtype), train)


class C3SPP(nn.Module):
    """C3 with an SPP inner stack (common.py:156-161); used by SegMaskBase."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = SPP(c_, self.k, dtype=self.dtype, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck inner stack (common.py:164-169)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, dtype=self.dtype, name=f"m_{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)


class TransformerLayer(nn.Module):
    """ViT-style layer without LayerNorm (common.py:65-79). Tokens (L, B, C)
    are expressed here as (B, L, C)."""

    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = lambda name: nn.Dense(
            self.c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=torch_linear_kernel_init, name=name,
        )
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, param_dtype=jnp.float32,
            name="ma",
        )(q, k, v)
        x = attn + x
        y = dense("fc1")(x)
        return dense("fc2")(y) + x


class TransformerBlock(nn.Module):
    """Sequence of TransformerLayers over flattened spatial tokens
    (common.py:82-98)."""

    c2: int
    num_heads: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, dtype=self.dtype, name="conv")(x, train)
        # tokens flow through raw Dense/attention adds — no fp8 operands
        x = to_compute(x, self.dtype)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=torch_linear_kernel_init, name="linear",
        )(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, self.dtype, name=f"tr_{i}")(
                p, train
            )
        return p.reshape(b, h, w, self.c2)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner stack (common.py:148-153)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = TransformerBlock(c_, 4, self.n, self.dtype, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, to_compute(y2, self.dtype)], axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)


class ARM(nn.Module):
    """BiSeNet attention-refinement: 3x3 conv then SE gate (common.py:206-218).
    The SE's 1x1 ConvBnAct runs on a 1x1 map => its BN is statically skipped,
    matching the reference quirk."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBnAct(self.c2, 3, 1, dtype=self.dtype, name="conv")(x, train)
        # pool in the compute dtype: the gate statistics scale the whole
        # feature map and are a few KB — no reason to round them to fp8
        att = adaptive_avg_pool(to_compute(feat, self.dtype), 1)
        att = ConvBnAct(self.c2, 1, 1, act=False, dtype=self.dtype, name="att_conv")(
            att, train
        )
        att = jax.nn.sigmoid(to_compute(att, self.dtype))
        return to_compute(feat, self.dtype) * att


class FFM(nn.Module):
    """Feature-fusion module: conv + channel attention, residual add
    (common.py:222-242)."""

    c2: int
    reduction: int = 1
    is_cat: bool = True
    k: int = 1
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # is_cat means x is a list; maybe_cat keeps it implicit (split-conv)
        # only when every part is MXU-wide (PERF.md)
        q = self.quant
        if isinstance(x, (list, tuple)):
            x = (qt_maybe_cat(list(x)) if isinstance(x[0], QTensor)
                 else maybe_cat(list(x)))
        feat = ConvBnAct(self.c2, self.k, 1, dtype=self.dtype, quant=q,
                         name="convblk")(x, train)
        if isinstance(feat, QTensor) and not self.is_initializing():
            # int8: attention stats read feat as int8; the (B,1,1,C) gate
            # then folds into one fused multiply+requant pass
            att = (jnp.mean(feat.data.astype(jnp.float32), axis=(1, 2),
                            keepdims=True)
                   * Q.scale_arr(feat.scale)).astype(self.dtype)
            att = Conv2d(self.c2 // self.reduction, 1, use_bias=False,
                         dtype=self.dtype, name="att_fc1")(att)
            att = silu(att)
            att = Conv2d(self.c2, 1, use_bias=False, dtype=self.dtype,
                         name="att_fc2")(att)
            gate = (jax.nn.sigmoid(att) + 1.0).astype(jnp.float32)
            y = feat.data.astype(jnp.float32) * (Q.scale_arr(feat.scale)
                                                 * gate)
            s_out = q.scale_for(Q.site_key(self, "gate"))
            return QTensor(
                jnp.clip(jnp.round(y / Q.scale_arr(s_out)), -Q.QMAX,
                         Q.QMAX).astype(jnp.int8), s_out)
        if isinstance(feat, QTensor):  # initializing
            feat = Q.dequantize(feat, self.dtype)
        att = jnp.mean(feat.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(
            self.dtype  # gate statistics stay in the compute dtype (fp8
        )              # storage of a (B,1,1,C) tensor buys nothing)
        att = Conv2d(self.c2 // self.reduction, 1, use_bias=False, dtype=self.dtype,
                     name="att_fc1")(att)
        att = silu(att)
        att = Conv2d(self.c2, 1, use_bias=False, dtype=self.dtype, name="att_fc2")(att)
        att = jax.nn.sigmoid(att)
        featc = to_compute(feat, self.dtype)
        out = featc * att + featc
        if q is not None:
            if q.is_calib:
                Q.sow_absmax(self, "gate", out)
            elif q.is_int8:  # initializing
                return Q.quantize(out, q.scale_for(Q.site_key(self, "gate")))
        return out


class DilatedConvBnSiLU(nn.Module):
    """nn.Conv2d(dilated, bias=False)+BN+SiLU branch used inside ASPP/RFB
    blocks (e.g. common.py:516-519)."""

    c2: int
    d: int
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        if (q is not None and q.is_int8 and not train
                and not self.is_initializing()):
            # same child names ("conv"/"bn") as ConvBnAct => same int8 path
            params = self.variables["params"]
            bn = Q.bn_fold_constants(params["bn"]["bn"],
                                     self.variables["batch_stats"]["bn"]["bn"])
            return Q.int8_conv_block(
                x, params["conv"]["conv2d"]["kernel"],
                padding=((self.d, self.d), (self.d, self.d)),
                dilation=self.d, bn=bn, act=silu,
                out_scale=q.scale_for(Q.site_key(self, "out")))
        if q is not None and q.is_int8 and isinstance(x, QTensor):
            x = Q.dequantize(x, self.dtype)  # initializing
        y = Conv2d(self.c2, 3, 1, padding=self.d, dilation=self.d, dtype=self.dtype,
                   name="conv")(x)
        y = BatchNorm(self.dtype, name="bn")(y, train)
        y = silu(y)
        if q is not None:
            if q.is_calib:
                Q.sow_absmax(self, "out", y)
            elif q.is_int8:  # initializing
                return Q.quantize(y, q.scale_for(Q.site_key(self, "out")))
        return _store_act(y, train)


class GlobalBranch(nn.Module):
    """AdaptiveAvgPool(1) + 1x1 ConvBnAct, broadcast back by nearest resize —
    the has_global branch shared by ASPP/RFB1/RFB2/ACSP (common.py:292-296)."""

    c2: int
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, out_hw, train: bool = False):
        if isinstance(x, QTensor):
            g = Q.qt_global_avg_pool(x, 1)
            g = ConvBnAct(self.c2, 1, dtype=self.dtype, quant=self.quant,
                          name="conv")(g, train)
            # 1x1 source: nearest resize == broadcast, scale-preserving
            n, _, _, c = g.data.shape
            data = jnp.broadcast_to(g.data, (n, out_hw[0], out_hw[1], c))
            return QTensor(data, g.scale)
        g = adaptive_avg_pool(to_compute(x, self.dtype), 1)
        g = ConvBnAct(self.c2, 1, dtype=self.dtype, quant=self.quant,
                      name="conv")(g, train)
        return resize_nearest(g, out_hw)


class ASPP(nn.Module):
    """Parallel dilated branches + optional global (common.py:268-310)."""

    c2: int
    d: Tuple[int, int, int] = (3, 6, 9)
    has_global: bool = True
    map_reduce: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = _sum_channels(x) // self.map_reduce
        b0 = ConvBnAct(hid, 1, 1, dtype=self.dtype, name="branch0")(x, train)
        b1 = DilatedConvBnSiLU(hid, self.d[0], self.dtype, name="branch1")(x, train)
        b2 = DilatedConvBnSiLU(hid, self.d[1], self.dtype, name="branch2")(x, train)
        b3 = DilatedConvBnSiLU(hid, self.d[2], self.dtype, name="branch3")(x, train)
        feats = [b0, b1, b2, b3]
        if self.has_global:
            feats.append(
                GlobalBranch(hid, self.dtype, name="branch4")(x, _spatial(x), train)
            )
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="conv_linear")(
            maybe_cat(feats), train
        )


class ASPPs(nn.Module):
    """ASPP variant with per-branch 1x1 input reduction (common.py:313-359)."""

    c2: int
    d: Tuple[int, int, int] = (3, 6, 9)
    has_global: bool = True
    map_reduce: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = _sum_channels(x) // self.map_reduce
        b0 = ConvBnAct(hid, 1, dtype=self.dtype, name="branch0_a")(x, train)
        b0 = ConvBnAct(hid, 3, dtype=self.dtype, name="branch0_b")(b0, train)
        outs = [b0]
        for i, d in enumerate(self.d):
            y = ConvBnAct(hid, 1, dtype=self.dtype, name=f"branch{i+1}_red")(x, train)
            y = DilatedConvBnSiLU(hid, d, self.dtype, name=f"branch{i+1}")(y, train)
            outs.append(y)
        if self.has_global:
            outs.append(
                GlobalBranch(hid, self.dtype, name="branch4")(x, _spatial(x), train)
            )
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="conv_linear")(
            maybe_cat(outs), train
        )


class RFB2(nn.Module):
    """Cascaded-dilation block used by SegMaskPSP/BiSe (common.py:504-545):
    branch0 = 1x1+3x3; branch1 = dilated(d0) on branch0; branch2 = dilated(d1)
    on branch1; branch3 = independent 1x1; optional global fed from branch2."""

    c2: int
    map_reduce: int = 4
    d: Tuple[int, int] = (2, 3)
    has_global: bool = False
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = _sum_channels(x) // self.map_reduce
        q = self.quant
        x3 = ConvBnAct(inter, 1, 1, dtype=self.dtype, quant=q,
                       name="branch3")(x, train)
        x0 = ConvBnAct(inter, 1, 1, dtype=self.dtype, quant=q,
                       name="branch0_a")(x, train)
        x0 = ConvBnAct(inter, 3, 1, dtype=self.dtype, quant=q,
                       name="branch0_b")(x0, train)
        x1 = DilatedConvBnSiLU(inter, self.d[0], self.dtype, quant=q,
                               name="branch1")(x0, train)
        x2 = DilatedConvBnSiLU(inter, self.d[1], self.dtype, quant=q,
                               name="branch2")(x1, train)
        feats = [x0, x1, x2, x3]
        if self.has_global:
            feats.append(
                GlobalBranch(inter, self.dtype, quant=q, name="branch4")(
                    x2, _spatial(x), train)
            )
        cat = (qt_maybe_cat(feats) if isinstance(feats[0], QTensor)
               else maybe_cat(feats))
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, quant=q,
                         name="conv_linear")(cat, train)


class RFB1(nn.Module):
    """ASPP-like variant with 3x3/5x5 pre-convs (common.py:451-501)."""

    c2: int
    map_reduce: int = 4
    d: Tuple[int, int, int] = (3, 5, 7)
    has_global: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = _sum_channels(x) // self.map_reduce
        b0 = ConvBnAct(inter, 1, dtype=self.dtype, name="branch0_a")(x, train)
        b0 = ConvBnAct(inter, 3, dtype=self.dtype, name="branch0_b")(b0, train)
        outs = [b0]
        pre_k = [3, 3, 5]
        for i, d in enumerate(self.d):
            y = ConvBnAct(inter, 1, dtype=self.dtype, name=f"branch{i+1}_red")(x, train)
            y = ConvBnAct(inter, pre_k[i], dtype=self.dtype, name=f"branch{i+1}_pre")(
                y, train
            )
            y = DilatedConvBnSiLU(inter, d, self.dtype, name=f"branch{i+1}")(y, train)
            outs.append(y)
        if self.has_global:
            outs.append(
                GlobalBranch(inter, self.dtype, name="branch4")(x, _spatial(x), train)
            )
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="fusion")(
            maybe_cat(outs), train
        )


class ACSP(nn.Module):
    """RFB2 minus the independent 1x1 branch, global fed from the cascade tail
    — the SegMaskPSP2 spatial path (common.py:548-585)."""

    c2: int
    map_reduce: int = 4
    d: Tuple[int, int] = (2, 3)
    has_global: bool = False
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = _sum_channels(x) // self.map_reduce
        q = self.quant
        x0 = ConvBnAct(inter, 1, 1, dtype=self.dtype, quant=q,
                       name="branch0_a")(x, train)
        x0 = ConvBnAct(inter, 3, 1, dtype=self.dtype, quant=q,
                       name="branch0_b")(x0, train)
        x1 = DilatedConvBnSiLU(inter, self.d[0], self.dtype, quant=q,
                               name="branch1")(x0, train)
        x2 = DilatedConvBnSiLU(inter, self.d[1], self.dtype, quant=q,
                               name="branch2")(x1, train)
        feats = [x0, x1, x2]
        if self.has_global:
            feats.append(
                GlobalBranch(inter, self.dtype, quant=q, name="branch_global")(
                    x2, _spatial(x), train
                )
            )
        cat = (qt_maybe_cat(feats) if isinstance(feats[0], QTensor)
               else maybe_cat(feats))
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, quant=q,
                         name="conv_linear")(cat, train)


class PyramidPooling(nn.Module):
    """PSPNet pyramid pooling (common.py:588-615): adaptive-avg to k in
    {1,2,3,6}, 1x1 conv to C/4 each, bilinear(align_corners=True) back, concat
    (+input if short_cut). The k=1 conv's BN is statically skipped (quirk)."""

    k: Tuple[int, ...] = (1, 2, 3, 6)
    short_cut: bool = False
    as_list: bool = False  # True: return branch list (implicit concat)
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, QTensor):
            # int8: pool at the input scale (convex), conv the tiny maps in
            # int8, upsample at the conv's output scale — the big upsampled
            # branch tensors are written as int8
            h, w = x.data.shape[1:3]
            c_out = x.data.shape[-1] // 4
            feats = [x] if self.short_cut else []
            for i, k in enumerate(self.k):
                y = Q.qt_global_avg_pool(x, k)
                y = ConvBnAct(c_out, 1, dtype=self.dtype, quant=self.quant,
                              name=f"conv{i+1}")(y, train)
                y = Q.qt_resize_bilinear(y, (h, w), align_corners=True)
                feats.append(y)
            return feats if self.as_list else Q.qt_concat(feats)
        h, w = x.shape[1:3]
        c_out = x.shape[-1] // 4
        feats = [x] if self.short_cut else []
        for i, k in enumerate(self.k):
            y = adaptive_avg_pool(x, k)
            y = ConvBnAct(c_out, 1, dtype=self.dtype, quant=self.quant,
                          name=f"conv{i+1}")(y, train)
            y = resize_bilinear(y, (h, w), align_corners=True)
            feats.append(y)
        if self.as_list:
            return feats
        return jnp.concatenate(widen_mixed(feats), axis=-1)


class DAPPM(nn.Module):
    """DDRNet pyramid with pre-norm (BN-act-conv) blocks (common.py:362-447)."""

    branch_planes: int
    outplanes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = to_compute(x, self.dtype)  # raw pools/adds below (pre-norm style)
        h, w = x.shape[1:3]

        def bn_act_conv(y, c, k, name):
            y = BatchNorm(self.dtype, name=f"{name}_bn")(y, train)
            y = silu(y)
            return Conv2d(c, k, 1, dtype=self.dtype, name=f"{name}_conv")(y)

        def avgpool(y, k, s):
            p = k // 2
            return jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1),
                ((0, 0), (p, p), (p, p), (0, 0)),
            ) / float(k * k)

        bp = self.branch_planes
        scales = [bn_act_conv(x, bp, 1, "scale0")]
        for i, (k, s) in enumerate([(5, 2), (9, 4), (17, 8)], start=1):
            y = avgpool(x, k, s)
            scales.append(bn_act_conv(y, bp, 1, f"scale{i}"))
        g = adaptive_avg_pool(x, 1)
        scales.append(bn_act_conv(g, bp, 1, "scale4"))

        outs = [scales[0]]
        for i in range(1, 5):
            up = resize_bilinear(scales[i], (h, w), align_corners=True)
            outs.append(bn_act_conv(up + outs[i - 1], bp, 3, f"process{i}"))
        cat = jnp.concatenate(outs, axis=-1)
        comp = bn_act_conv(cat, self.outplanes, 1, "compression")
        short = bn_act_conv(x, self.outplanes, 1, "shortcut")
        return comp + short


class ConvBNReLU(nn.Module):
    """Conv+BN+ReLU6 helper (common.py:902-910)."""

    c2: int
    k: int = 3
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.c2, self.k, self.s, self.p, self.g, dtype=self.dtype,
                   name="conv")(x)
        y = BatchNorm(self.dtype, name="bn")(y, train)
        return jnp.minimum(jax.nn.relu(y), 6.0)


class Classify(nn.Module):
    """Classification head: global pool + 1x1 conv + flatten
    (common.py:885-897)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = x if isinstance(x, (list, tuple)) else [x]
        pooled = [adaptive_avg_pool(y, 1) for y in xs]
        y = jnp.concatenate(pooled, axis=-1)
        y = Conv2d(self.c2, self.k, self.s, groups=self.g, use_bias=True,
                   dtype=self.dtype, name="conv")(y)
        return y.reshape(y.shape[0], -1)


class CrossConv(nn.Module):
    """1xk then kx1 cross convolution with optional residual
    (experimental.py:11-22)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        p1 = (0, self.k // 2)
        p2 = (self.k // 2, 0)
        y = nn.Conv(c_, (1, self.k), (1, self.s),
                    padding=((p1[0], p1[0]), (p1[1], p1[1])), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=torch_conv_kernel_init, name="cv1_conv")(x)
        y = BatchNorm(self.dtype, name="cv1_bn")(y, train)
        y = silu(y)
        y = nn.Conv(self.c2, (self.k, 1), (self.s, 1),
                    padding=((p2[0], p2[0]), (p2[1], p2[1])),
                    feature_group_count=self.g, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=torch_conv_kernel_init,
                    name="cv2_conv")(y)
        y = BatchNorm(self.dtype, name="cv2_bn")(y, train)
        y = silu(y)
        if self.shortcut and x.shape[-1] == self.c2 and self.s == 1:
            return _store_act(to_compute(x, self.dtype) + y, train)
        return y


class Sum(nn.Module):
    """(Optionally learnably-weighted) sum of N inputs
    (experimental.py:25-36)."""

    n: int
    weight: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        xs = [to_compute(v, self.dtype) for v in xs]
        y = xs[0]
        if self.weight:
            w = self.param(
                "w",
                lambda key, shape: -jnp.arange(1.0, shape[0] + 1.0) / 2.0,
                (self.n - 1,),
            )
            w = jax.nn.sigmoid(w) * 2.0
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class MixConv2d(nn.Module):
    """Mixed-kernel-size grouped conv (experimental.py:39-55)."""

    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.k)
        # equal channel split (experimental.py equal_ch=True path)
        idx = np.floor(np.linspace(0, n - 1e-6, self.c2)).astype(int)
        ch = [int((idx == g).sum()) for g in range(n)]
        outs = [
            Conv2d(ch[g], self.k[g], self.s, use_bias=False, dtype=self.dtype,
                   name=f"m_{g}")(x)
            for g in range(n)
        ]
        y = jnp.concatenate(outs, axis=-1)
        y = BatchNorm(self.dtype, name="bn")(y, train)
        return silu(y)


# ---------------------------------------------------------------------------
# Phase-layout (space-to-depth-4) stem — exact rewrite of FusedFocus + Conv
# ---------------------------------------------------------------------------
#
# The FusedFocus stem (6x6/s2 conv on 3 input channels) runs at ~6% MXU:
# cin=3 starves the 128-deep contraction and XLA pads ~10x useful work
# (PERF.md "l0:FusedFocus"; every device-side relayout measured worse —
# tools/probe_stem*.py, ops/stem_pallas.py). The fix that works moves the
# relayout OFF the device: the host delivers images in space-to-depth-4
# layout (H/4, W/4, 48) — a fixed per-image byte permutation folded into the
# loader's batch-assembly copy — and the first two layers become MXU-deep
# stride-1 convs at the H/4 grid (measured b128 640px: l0+l1 8.74 -> 6.87 ms,
# tools/probe_stem_s2d.py):
#
#   l0': 3x3/s1 conv  16*ci -> 4*c0, pad 1          [exact rewrite of
#                                                    6x6/s2/p2, ci -> c0]
#   l1': 2x2/s1 conv  4*c0 -> c1, pad ((1,0),(1,0)) [exact rewrite of
#                                                    3x3/s2/p1, c0 -> c1]
#
# Channel orders: s2d input (pr, pc, ci) with pr/pc the 4x4 pixel phase;
# l0' output (qy, qx, c0) with qy/qx the 2x2 output phase (so l1' consumes it
# directly and emits the STANDARD (H/4, W/4, c1) map — everything downstream
# of l1 is unchanged). Kernel maps (derivation: tools/probe_stem_s2d.py):
#
#   W3[dr+1, dc+1, (pr,pc,ci), (qy,qx,co)] = W6[4dr+pr-2qy+2, 4dc+pc-2qx+2,
#                                               ci, co]   (out of range -> 0)
#   W2[er+1, ec+1, (qy,qx,ci), co]         = W1[2er+qy+1, 2ec+qx+1, ci, co]
#
# The modules below declare parameters with the SAME names/shapes as the
# ConvBnAct layers they replace (l{i}/conv/conv2d/kernel, l{i}/bn/bn/*) and
# apply the kernel map in-graph (a trace-time gather over a few thousand
# elements): checkpoints, EMA, optimizer state, and the torch converter are
# untouched, and gradients are exact (the function is identical).


def _phase_stem_gather(W, idx_r, idx_c, valid):
    """W[idx_r, idx_c] with out-of-range -> 0, via a zero pad row/col."""
    pad_i = W.shape[0]
    idx_r = np.where(valid, idx_r, pad_i)
    idx_c = np.where(valid, idx_c, pad_i)
    Wp = jnp.pad(W, ((0, pad_i + 1 - W.shape[0]), (0, pad_i + 1 - W.shape[1]),
                     (0, 0), (0, 0)))
    return Wp[idx_r, idx_c]


def phase_stem_kernel_a(W6):
    """(6,6,ci,co) 6x6/s2/p2 kernel -> (3,3,16*ci,4*co) phase kernel."""
    ci, co = W6.shape[2], W6.shape[3]
    dr = np.arange(-1, 2).reshape(3, 1, 1, 1, 1, 1)
    dc = np.arange(-1, 2).reshape(1, 3, 1, 1, 1, 1)
    pr = np.arange(4).reshape(1, 1, 4, 1, 1, 1)
    pc = np.arange(4).reshape(1, 1, 1, 4, 1, 1)
    qy = np.arange(2).reshape(1, 1, 1, 1, 2, 1)
    qx = np.arange(2).reshape(1, 1, 1, 1, 1, 2)
    shape = (3, 3, 4, 4, 2, 2)
    kr = np.broadcast_to(4 * dr + pr - 2 * qy + 2, shape)
    kc = np.broadcast_to(4 * dc + pc - 2 * qx + 2, shape)
    valid = (kr >= 0) & (kr < 6) & (kc >= 0) & (kc < 6)
    W3 = _phase_stem_gather(W6, kr, kc, valid)  # (3,3,4,4,2,2,ci,co)
    return W3.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(3, 3, 16 * ci, 4 * co)


def phase_stem_kernel_b(W1):
    """(3,3,ci,co) 3x3/s2/p1 kernel -> (2,2,4*ci,co) phase kernel."""
    ci, co = W1.shape[2], W1.shape[3]
    er = np.arange(-1, 1).reshape(2, 1, 1, 1)
    ec = np.arange(-1, 1).reshape(1, 2, 1, 1)
    qy = np.arange(2).reshape(1, 1, 2, 1)
    qx = np.arange(2).reshape(1, 1, 1, 2)
    shape = (2, 2, 2, 2)
    kr = np.broadcast_to(2 * er + qy + 1, shape)
    kc = np.broadcast_to(2 * ec + qx + 1, shape)
    valid = (kr >= 0) & (kr < 3) & (kc >= 0) & (kc < 3)
    W2 = _phase_stem_gather(W1, kr, kc, valid)  # (2,2,2,2,ci,co)
    return W2.reshape(2, 2, 4 * ci, co)


class _PhaseKernel(nn.Module):
    """Declares the standard-layout conv kernel at .../conv2d/kernel."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_conv_kernel_init, self.shape,
                          jnp.float32)


class _PhaseConvScope(nn.Module):
    """Scope shim so the kernel lives at l{i}/conv/conv2d/kernel, exactly
    where the ConvBnAct this module replaces puts it."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return _PhaseKernel(self.shape, name="conv2d")()


class PhaseStemA(nn.Module):
    """Phase-layout replacement for l0 = FusedFocus (ConvBnAct c2,6,2,2).

    Input (B, H/4, W/4, 16*ci) in s2d4 channel order (pr, pc, ci);
    output (B, H/4, W/4, 4*c2) in (qy, qx, c2) order. BN statistics are
    computed per ORIGINAL channel by folding the 2x2 output phase into the
    reduction axes — bit-identical population to the standard layout."""

    c2: int
    ci: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        W6 = _PhaseConvScope((6, 6, self.ci, self.c2), name="conv")()
        W3 = phase_stem_kernel_a(W6).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), W3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _name_conv_out(y)
        b, h, w, _ = y.shape
        bn = BatchNorm(self.dtype, name="bn")
        if train:
            # batch statistics must be per ORIGINAL channel: fold the 2x2
            # output phase into the reduction axes via the (4, c2) reshape
            y = bn(y.reshape(b, h, w, 4, self.c2), True)
            return _store_act(silu(y).reshape(b, h, w, 4 * self.c2), True)
        # Eval: BN with running stats is a per-channel affine. Splitting the
        # 128-lane minor dim for it costs a full relayout round trip of the
        # stem's biggest tensor (~3.6 ms at b128, profile_layers_prod) and
        # breaks conv-epilogue fusion — instead read the child's params and
        # apply the affine tiled over the phase dim (channel order is
        # (qy, qx, co), so jnp.tile matches the reshape semantics exactly).
        _ = bn(jnp.zeros((1, 1, 1, 4, self.c2), self.dtype), False)  # bind
        v = bn.variables
        mean = v["batch_stats"]["bn"]["mean"].astype(jnp.float32)
        var = v["batch_stats"]["bn"]["var"].astype(jnp.float32)
        gamma = v["params"]["bn"]["scale"].astype(jnp.float32)
        beta = v["params"]["bn"]["bias"].astype(jnp.float32)
        s = gamma * jax.lax.rsqrt(var + 1e-3)
        s128 = jnp.tile(s, 4).astype(self.dtype)
        b128 = jnp.tile(beta - mean * s, 4).astype(self.dtype)
        return _store_act(silu(y * s128 + b128), False)


class PhaseStemB(nn.Module):
    """Phase-layout replacement for l1 = Conv (ConvBnAct c2,3,2).

    Input (B, H/4, W/4, 4*ci) in (qy, qx, ci) order — PhaseStemA's output —
    output the STANDARD (B, H/4, W/4, c2) map; layers >= 2 are unchanged."""

    c2: int
    ci: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        W1 = _PhaseConvScope((3, 3, self.ci, self.c2), name="conv")()
        W2 = phase_stem_kernel_b(W1).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), W2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _name_conv_out(y)
        y = BatchNorm(self.dtype, name="bn")(y, train)
        return _store_act(silu(y), train)
