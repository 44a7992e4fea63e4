"""Detection and segmentation heads (flax.linen, NHWC).

Behavioral parity targets:
- Detect: reference core/models/yolo.py:238-282 (1x1 convs, sigmoid decode
  xy=(2s-0.5+grid)*stride, wh=(2s)^2*anchor, flatten+concat across scales).
- SegMaskPSP2 (shipped default head, yolov5s_seg.yaml:50): yolo.py:200-235.
- SegMaskPSP: yolo.py:156-197;  SegMaskBiSe: yolo.py:35-91;
  SegMaskLab: yolo.py:98-129;   SegMaskBase: yolo.py:134-153.

TPU design notes:
- Decode is part of the jitted graph (grids are trace-time numpy constants —
  no lazy grid caching needed).
- Per-scale feature layout is (B, na, ny, nx, no) to match the reference's
  training-output convention (simplifies loss + converter parity tests).
- Seg heads end with the 8x align_corners=True bilinear upsample expressed as
  a separable matmul (ops/resize.py) — MXU work, not gathers.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from desenet_tpu.models.layers import (
    ACSP,
    ASPP,
    C3,
    C3SPP,
    ConvBnAct,
    Conv2d,
    FFM,
    PyramidPooling,
    RFB2,
    maybe_cat,
    qt_maybe_cat,
    to_compute,
    torch_conv_kernel_init,
)
from desenet_tpu import quant as Q
from desenet_tpu.quant import QTensor, QuantCfg
from desenet_tpu.ops.resize import resize_bilinear

Dtype = Any


def detect_bias_init(na: int, no: int, stride: float, fan_in: int):
    """torch-uniform base + the focal-prior shift of yolo.py:388-396:
    obj += log(8/(640/stride)^2), cls += log(0.6/(nc-0.99))."""
    nc = no - 5
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        b = jax.random.uniform(key, shape, dtype, -bound, bound)
        b = b.reshape(na, no)
        b = b.at[:, 4].add(math.log(8.0 / (640.0 / stride) ** 2))
        if nc > 1:
            b = b.at[:, 5:].add(math.log(0.6 / (nc - 0.99)))
        return b.reshape(-1)

    return init


class Detect(nn.Module):
    """Anchor-based multi-scale detection head (yolo.py:238-282)."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]  # (nl, na*2) pixel anchors
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Dtype = jnp.float32
    decode_cat: bool = True  # False: inference returns the PER-SCALE decoded
    # list instead of the (B, sum A_s, no) concat — NMS then prefilters
    # scale-locally and the big concat never materializes (ops/nms.py)

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    def anchors_grid_units(self) -> np.ndarray:
        """(nl, na, 2) anchors divided by stride — what the loss consumes
        (yolo.py:316)."""
        a = np.asarray(self.anchors, dtype=np.float32).reshape(self.nl, self.na, 2)
        return a / np.asarray(self.strides, dtype=np.float32)[:, None, None]

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        na, no = self.na, self.no
        anchors_px = np.asarray(self.anchors, np.float32).reshape(self.nl, na, 2)
        feats = []
        decoded = []
        for i, x in enumerate(xs):
            fan_in = x.shape[-1]
            y = nn.Conv(
                features=no * na,
                kernel_size=(1, 1),
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=torch_conv_kernel_init,
                bias_init=detect_bias_init(na, no, float(self.strides[i]), fan_in),
                name=f"m{i}",
            )(x)
            b, ny, nx, _ = y.shape
            # (B,ny,nx,na*no) -> (B,na,ny,nx,no): na is the *major* factor of
            # the channel dim (torch reshape bs,na,no,ny,nx from a na*no
            # channel conv), preserved here for converter parity.
            y = y.reshape(b, ny, nx, na, no).transpose(0, 3, 1, 2, 4)
            feats.append(y)

            if not train:
                gy, gx = np.meshgrid(
                    np.arange(ny, dtype=np.float32),
                    np.arange(nx, dtype=np.float32),
                    indexing="ij",
                )
                grid = np.stack([gx, gy], axis=-1)[None, None]  # (1,1,ny,nx,2)
                s = jax.nn.sigmoid(y.astype(jnp.float32))
                xy = (s[..., 0:2] * 2.0 - 0.5 + grid) * float(self.strides[i])
                wh = (s[..., 2:4] * 2.0) ** 2 * anchors_px[i][None, :, None, None, :]
                z = jnp.concatenate([xy, wh, s[..., 4:]], axis=-1)
                decoded.append(z.reshape(b, -1, no))

        if train:
            return feats
        if not self.decode_cat:
            return decoded, feats
        return jnp.concatenate(decoded, axis=1), feats


class _SegStem(nn.Module):
    """Shared m8/m16/m32 stem: 1x1 convs to c_hid, 2x/4x align_corners
    bilinear upsample of the deeper levels (yolo.py:207-217).

    Returns the branch LIST (implicit channel concat): every consumer is a
    1x1 conv, which slices its kernel per branch instead of reading a
    materialized 3*c_hid concat (this libtpu rewrites channel concats into
    pad+maximum chains — see PERF.md)."""

    c_hid: int
    dtype: Dtype = jnp.float32
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        q = self.quant
        f8 = ConvBnAct(self.c_hid, 1, dtype=self.dtype, quant=q,
                       name="m8")(xs[0], train)
        f16 = ConvBnAct(self.c_hid, 1, dtype=self.dtype, quant=q,
                        name="m16")(xs[1], train)
        f32 = ConvBnAct(self.c_hid, 1, dtype=self.dtype, quant=q,
                        name="m32")(xs[2], train)
        if isinstance(f8, QTensor):
            hw = f8.data.shape[1:3]
            f16 = Q.qt_resize_bilinear(f16, hw, align_corners=True)
            f32 = Q.qt_resize_bilinear(f32, hw, align_corners=True)
            return qt_maybe_cat([f8, f16, f32])
        f16 = resize_bilinear(f16, f8.shape[1:3], align_corners=True)
        f32 = resize_bilinear(f32, f8.shape[1:3], align_corners=True)
        return maybe_cat([f8, f16, f32])


def _seg_out_conv(mdl, fused, n_segcls, dtype):
    """Final 1x1 class conv (reference yolo.py:193, 232). With an int8 input
    the conv runs s8 x s8 with bias and returns fp logits directly (no
    output requant — decode precision preserved)."""
    if isinstance(fused, QTensor) and not mdl.is_initializing():
        p = mdl.variables["params"]["out"]["conv2d"]
        return Q.int8_conv_block(fused, p["kernel"], bias=p["bias"],
                                 out_scale=None, out_dtype=dtype)
    if isinstance(fused, QTensor):  # initializing
        fused = Q.dequantize(fused, dtype)
    return Conv2d(n_segcls, 1, use_bias=True, dtype=dtype, name="out")(fused)


class SegMaskPSP2(nn.Module):
    """The shipped seg head (yolo.py:200-235): stem -> dual path
    {spatial=ACSP(has_global), context=1x1(c_hid/6)->PyramidPooling} ->
    FFM(is_cat) -> 1x1 -> 8x bilinear up."""

    n_segcls: int = 19
    n: int = 1
    c_hid: int = 256
    dtype: Dtype = jnp.float32
    upsample: bool = True  # False: return 1/8-res logits (fused Pallas seg tail)
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        map_reduce = 6
        q = self.quant
        feat = _SegStem(self.c_hid, self.dtype, quant=q, name="stem")(xs, train)
        spatial = ACSP(
            self.c_hid, map_reduce=map_reduce, d=(2, 3), has_global=True,
            dtype=self.dtype, quant=q, name="spatial_path",
        )(feat, train)
        ctx = ConvBnAct(self.c_hid // map_reduce, 1, 1, dtype=self.dtype,
                        quant=q, name="context_red")(feat, train)
        ctx = PyramidPooling(k=(1, 2, 3, 6), short_cut=False, dtype=self.dtype,
                             quant=q, name="context_pp")(ctx, train)
        fused = FFM(self.c_hid, is_cat=True, k=3, dtype=self.dtype, quant=q,
                    name="ffm")([spatial, ctx], train)
        out = _seg_out_conv(self, fused, self.n_segcls, self.dtype)
        if not self.upsample:
            return out
        h, w = out.shape[1:3]
        return resize_bilinear(out, (h * 8, w * 8), align_corners=True)


class SegMaskPSP(nn.Module):
    """PSP head (yolo.py:156-197): stem -> RFB2(map_reduce=6) ->
    PyramidPooling(short_cut) -> FFM(k=3, no-cat) -> 1x1 -> 8x up."""

    n_segcls: int = 19
    n: int = 1
    c_hid: int = 256
    shortcut: bool = False
    dtype: Dtype = jnp.float32
    upsample: bool = True  # False: return 1/8-res logits (fused Pallas seg tail)
    quant: Optional[QuantCfg] = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        q = self.quant
        feat = _SegStem(self.c_hid, self.dtype, quant=q, name="stem")(xs, train)
        y = RFB2(self.c_hid, map_reduce=6, d=(2, 3), dtype=self.dtype, quant=q,
                 name="rfb")(feat, train)
        y = PyramidPooling(k=(1, 2, 3, 6), short_cut=True, dtype=self.dtype,
                           quant=q, name="pp")(y, train)
        y = FFM(self.c_hid, is_cat=False, k=3, dtype=self.dtype, quant=q,
                name="ffm")(y, train)
        out = _seg_out_conv(self, y, self.n_segcls, self.dtype)
        if not self.upsample:
            return out
        h, w = out.shape[1:3]
        return resize_bilinear(out, (h * 8, w * 8), align_corners=True)


class SegMaskBiSe(nn.Module):
    """BiSeNet-style head with train-time aux outputs (yolo.py:35-91)."""

    n_segcls: int = 19
    n: int = 1
    c_hid: int = 256
    shortcut: bool = False
    dtype: Dtype = jnp.float32
    upsample: bool = True  # False: return 1/8-res logits (fused Pallas seg tail)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        f8 = ConvBnAct(128, 1, dtype=self.dtype, name="m8")(xs[0], train)
        f16_m = RFB2(128, map_reduce=4, d=(2, 3), has_global=False,
                     dtype=self.dtype, name="m16")(xs[1], train)
        f32_m = RFB2(128, map_reduce=8, d=(2, 3), has_global=True,
                     dtype=self.dtype, name="m32")(xs[2], train)

        # up32: 3x3 refine then 2x bilinear(align_corners)
        feat3 = ConvBnAct(128, 3, dtype=self.dtype, name="up32_conv")(f32_m, train)
        feat3 = resize_bilinear(feat3, (feat3.shape[1] * 2, feat3.shape[2] * 2),
                                align_corners=True)
        feat2 = ConvBnAct(128, 3, dtype=self.dtype, name="up16_conv")(
            to_compute(f16_m, self.dtype) + to_compute(feat3, self.dtype), train
        )
        feat2 = resize_bilinear(feat2, (feat2.shape[1] * 2, feat2.shape[2] * 2),
                                align_corners=True)

        fused = FFM(256, k=3, is_cat=True, dtype=self.dtype, name="ffm")(
            [f8, feat2], train
        )
        if train:
            fused = nn.Dropout(0.1, deterministic=False)(fused)
        out = Conv2d(self.n_segcls, 1, use_bias=True, dtype=self.dtype, name="out")(
            fused
        )
        if not train and not self.upsample:
            return out
        out = resize_bilinear(out, (out.shape[1] * 8, out.shape[2] * 8),
                              align_corners=True)
        if not train:
            return out

        aux16 = ConvBnAct(128, 3, dtype=self.dtype, name="aux16_conv")(feat2, train)
        aux16 = Conv2d(self.n_segcls, 1, use_bias=True, dtype=self.dtype,
                       name="aux16_out")(aux16)
        aux16 = resize_bilinear(aux16, (aux16.shape[1] * 8, aux16.shape[2] * 8),
                                align_corners=True)
        aux32 = ConvBnAct(128, 3, dtype=self.dtype, name="aux32_conv")(feat3, train)
        aux32 = Conv2d(self.n_segcls, 1, use_bias=True, dtype=self.dtype,
                       name="aux32_out")(aux32)
        aux32 = resize_bilinear(aux32, (aux32.shape[1] * 16, aux32.shape[2] * 16),
                                align_corners=True)
        return [out, aux16, aux32]


class SegMaskLab(nn.Module):
    """DeepLabV3+-style head (yolo.py:98-129): detail(1/8) + ASPP(1/16) ->
    FFM decoder -> 8x up. `n` controls ASPP map_reduce = 5-n."""

    n_segcls: int = 19
    n: int = 1
    c_hid: int = 256
    shortcut: bool = False
    dtype: Dtype = jnp.float32
    upsample: bool = True  # False: return 1/8-res logits (fused Pallas seg tail)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        detail = ConvBnAct(48, 1, dtype=self.dtype, name="detail1")(xs[0], train)
        detail = ConvBnAct(48, 3, dtype=self.dtype, name="detail2")(detail, train)

        enc = ConvBnAct(self.c_hid * 2, 1, dtype=self.dtype, name="enc_red")(
            xs[1], train
        )
        enc = ASPP(256, d=(3, 6, 9), has_global=False, map_reduce=5 - self.n,
                   dtype=self.dtype, name="aspp")(enc, train)
        enc = resize_bilinear(enc, (enc.shape[1] * 2, enc.shape[2] * 2),
                              align_corners=True)

        y = FFM(256, k=1, is_cat=True, dtype=self.dtype, name="ffm")(
            [detail, enc], train
        )
        y = ConvBnAct(self.c_hid, 3, dtype=self.dtype, name="dec_conv")(y, train)
        out = Conv2d(self.n_segcls, 1, use_bias=True, dtype=self.dtype, name="out")(y)
        if not self.upsample:
            return out
        return resize_bilinear(out, (out.shape[1] * 8, out.shape[2] * 8),
                               align_corners=True)


class SegMaskBase(nn.Module):
    """Single-input C3 + C3SPP head (yolo.py:134-153)."""

    n_segcls: int = 19
    n: int = 1
    c_hid: int = 256
    shortcut: bool = False
    dtype: Dtype = jnp.float32
    upsample: bool = True  # False: return 1/8-res logits (fused Pallas seg tail)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x = xs[0] if isinstance(xs, (list, tuple)) else xs
        y = C3(self.c_hid, n=self.n, shortcut=self.shortcut, dtype=self.dtype,
               name="c3")(x, train)
        y = C3SPP(int(self.c_hid * 1.5), k=(5, 9, 13), dtype=self.dtype,
                  name="c3spp")(y, train)
        if train:
            y = nn.Dropout(0.1, deterministic=False)(y)
        out = Conv2d(self.n_segcls, 3, padding=1, use_bias=False, dtype=self.dtype,
                     name="out")(y)
        if not self.upsample:
            return out
        return resize_bilinear(out, (out.shape[1] * 8, out.shape[2] * 8),
                               align_corners=True)
