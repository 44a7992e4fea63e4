"""Pallas TPU kernel: the SegMaskPSP2 head fused, one image per grid step.

STATUS: documented NEGATIVE result — correct (bit-level bf16 parity,
argmax agreement 1.0 vs the XLA head on TPU) but NOT faster: 17.7 ms
standalone vs 16.1 XLA at b128 640px, and ~12 vs ~10.8 in-model with the
known optimizations applied (pair-packed conv taps 2.4 -> 1.7 ms/conv,
slice-mean pyramid pools). Root cause: the head's cost is dominated by the
64-channel 3x3 dilated-conv cascade, which is MXU-quantization-bound
(K=N=64 fills a quarter of the 128x128 array) — the same arithmetic XLA
already emits — so removing the HBM round-trips between layers buys less
than the Mosaic per-op overhead costs. Kept for the parity tests and as
the measured baseline against re-attempting this fusion blind.

The original motivation: the seg head costs ~10.8 ms of the ~43 ms b128
inference program as XLA ops; its tensors are small-channel (64/21/5) at
1/8 resolution and a dozen 80x80 intermediates round-trip HBM. Per image
the whole working set is a few MB — it fits VMEM. The kernel runs ACSP +
context pyramid + FFM + class conv as straight-line VMEM compute:

- 1x1 convs are (P, Cin) @ (Cin, Cout) matmuls with f32 accumulation and
  folded eval-BN (scale/shift absorbed into W, b).
- 3x3 (optionally dilated) convs are 9 shifted-tap matmuls over a
  zero-padded copy.
- pyramid pools/upsamples use kron'd (k*k, P) matrices built from the
  ops/resize.py trace-time matrices — single matmuls, no layout changes.
- the two 1x1-input convs (PyramidPooling k=1, ACSP global branch) skip BN
  per the reference quirk (common.py:53) — they fold to conv+SiLU only.

The m16/m32 stem branches stay in XLA: their bilinear upsample commutes
with the 1x1 consumers (both linear), so branch0_a/context_red
contributions are convolved at 1/16 & 1/32 resolution and upsampled after
— exact in exact arithmetic, and it sidesteps Mosaic's no-lane-merge
reshape limit for in-kernel separable resampling. The kernel then reads
l16 plus two small pre-summed contribution planes and writes only the
(B, H/8, W/8, nc) logits. Eval-only: training and non-PSP2 heads keep the
XLA path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desenet_tpu.ops.resize import (_adaptive_pool_matrix, _linear_matrix,
                                    resize_bilinear)

F32 = jnp.float32
# per-image VMEM working set scales with P8 = (H/8)*(W/8); beyond ~8k
# positions (≈724x724 input) fall back to the XLA head
MAX_P8 = 8192


def _silu_f32(x):
    return x * jax.nn.sigmoid(x)


def _mm(a, w):
    """(P, Ci) @ (Ci, Co) with f32 accumulation."""
    return jnp.dot(a, w, preferred_element_type=F32)


def _fold(p, bs):
    """ConvBnAct eval fold -> (W, b f32); W keeps its spatial dims for 3x3,
    (ci, co) for 1x1. bs None => the 1x1-input BN-skip quirk: no BN at all."""
    w = p["conv"]["conv2d"]["kernel"].astype(F32)
    if w.ndim == 4 and w.shape[0] == 1 and w.shape[1] == 1:
        w = w[0, 0]
    if bs is None:
        return w, jnp.zeros((w.shape[-1],), F32)
    g = p["bn"]["bn"]["scale"].astype(F32)
    be = p["bn"]["bn"]["bias"].astype(F32)
    mu = bs["bn"]["bn"]["mean"].astype(F32)
    var = bs["bn"]["bn"]["var"].astype(F32)
    s = g * jax.lax.rsqrt(var + 1e-3)
    return w * s, be - mu * s


@functools.partial(jax.jit, static_argnames=("n_segcls", "interpret"))
def fused_psp2_eval(xs: Sequence[jax.Array], params, batch_stats,
                    n_segcls: int, interpret: bool = False) -> jax.Array:
    """Eval-only fused SegMaskPSP2 forward.

    xs: [l16 (B,H8,W8,128), l19 (B,H16,W16,256), l22 (B,H32,W32,512)];
    params/batch_stats: the head's variable subtrees. Returns
    (B, H8, W8, n_segcls) f32 logits (1/8 resolution, upsample=False
    semantics).
    """
    l16, l19, l22 = xs
    b, h8, w8, _ = l16.shape
    p8 = h8 * w8
    dt = l16.dtype
    # channel widths from the weight shapes — s/m/l all supported
    # (c_hid = 128/192/256, ACSP inner = c_hid//2, ctx = 4*(c_hid//6//4))
    c16 = l16.shape[-1]

    sp = params["spatial_path"]
    sbs = batch_stats["spatial_path"]
    st = params["stem"]
    stbs = batch_stats["stem"]
    pp = params["context_pp"]
    ppbs = batch_stats["context_pp"]

    wm8, bm8 = _fold(st["m8"], stbs["m8"])
    wm16, bm16 = _fold(st["m16"], stbs["m16"])
    wm32, bm32 = _fold(st["m32"], stbs["m32"])
    w0a, b0a = _fold(sp["branch0_a"], sbs["branch0_a"])
    w0b, b0b = _fold(sp["branch0_b"], sbs["branch0_b"])
    w1, b1 = _fold(sp["branch1"], sbs["branch1"])
    w2, b2 = _fold(sp["branch2"], sbs["branch2"])
    wg = sp["branch_global"]["conv"]["conv"]["conv2d"]["kernel"][0, 0]
    wlin, blin = _fold(sp["conv_linear"], sbs["conv_linear"])
    wred, bred = _fold(params["context_red"], batch_stats["context_red"])
    wpp1 = pp["conv1"]["conv"]["conv2d"]["kernel"][0, 0]
    wpp2, bpp2 = _fold(pp["conv2"], ppbs["conv2"])
    wpp3, bpp3 = _fold(pp["conv3"], ppbs["conv3"])
    wpp6, bpp6 = _fold(pp["conv4"], ppbs["conv4"])
    wcb, bcb = _fold(params["ffm"]["convblk"], batch_stats["ffm"]["convblk"])
    wfc1 = params["ffm"]["att_fc1"]["conv2d"]["kernel"][0, 0]
    wfc2 = params["ffm"]["att_fc2"]["conv2d"]["kernel"][0, 0]
    wout = params["out"]["conv2d"]["kernel"][0, 0]
    bout = params["out"]["conv2d"]["bias"].astype(F32)

    c_hid = wm8.shape[-1]          # stem width (s 128 / m 192 / l 256)
    inner = w0b.shape[-1]          # ACSP branch width (c_hid // 2 ... s 64)
    nctx = wpp1.shape[-1] * 4      # context concat width (4 pyramid levels)

    # ---- XLA part: m16/m32 stem conv+BN+SiLU at native resolution, then
    # the 1x1 branch0_a / context_red slices, THEN the (commuting) bilinear
    # upsample — summed contribution planes for the kernel
    def stem_contrib(x, wm, bm):
        g = _silu_f32(jnp.einsum("bpc,cd->bpd", x.reshape(b, -1, x.shape[-1])
                                 .astype(dt), wm.astype(dt),
                                 preferred_element_type=F32) + bm).astype(dt)
        return g  # (B, P_in, 128)

    g16 = stem_contrib(l19, wm16, bm16)
    g32 = stem_contrib(l22, wm32, bm32)

    def up(v, src, c):
        h, w = src.shape[1:3]
        v = v.astype(dt).reshape(b, h, w, c)
        return resize_bilinear(v, (h8, w8), align_corners=True).reshape(
            b, p8, c)

    w0a_16 = jnp.einsum("bpc,cd->bpd", g16,
                        w0a[c_hid:2 * c_hid].astype(dt),
                        preferred_element_type=F32)
    w0a_32 = jnp.einsum("bpc,cd->bpd", g32,
                        w0a[2 * c_hid:3 * c_hid].astype(dt),
                        preferred_element_type=F32)
    red_16 = jnp.einsum("bpc,cd->bpd", g16,
                        wred[c_hid:2 * c_hid].astype(dt),
                        preferred_element_type=F32)
    red_32 = jnp.einsum("bpc,cd->bpd", g32,
                        wred[2 * c_hid:3 * c_hid].astype(dt),
                        preferred_element_type=F32)
    asum = (up(w0a_16, l19, inner) + up(w0a_32, l22, inner)).astype(dt)
    rsum = (up(red_16, l19, wred.shape[-1])
            + up(red_32, l22, wred.shape[-1])).astype(dt)

    kmats = []
    for k in (2, 3, 6):
        ah = _adaptive_pool_matrix(h8, k)
        aw = _adaptive_pool_matrix(w8, k)
        uh = _linear_matrix(k, h8, True)
        uw = _linear_matrix(k, w8, True)
        kmats.append(jnp.asarray(np.kron(ah, aw), dt))  # (k*k, P8)
        kmats.append(jnp.asarray(np.kron(uh, uw), dt))  # (P8, k*k)

    def cw(w):
        return w.astype(dt)

    weights = [cw(wm8), bm8,
               cw(w0a[0:c_hid]), b0a, cw(w0b), b0b, cw(w1), b1,
               cw(w2), b2, cw(wg),
               cw(wlin), blin, cw(wred[0:c_hid]), bred,
               cw(wpp1), cw(wpp2), bpp2, cw(wpp3), bpp3,
               cw(wpp6), bpp6,
               cw(wcb), bcb, cw(wfc1), cw(wfc2),
               cw(wout), bout] + kmats

    kernel = _make_psp2_kernel((h8, w8), n_segcls, dt,
                               dims=(c16, c_hid, inner, nctx))

    img_ins = [l16, asum, rsum]
    img_specs = [
        pl.BlockSpec((1,) + tuple(a.shape[1:]),
                     lambda i, nd=a.ndim: (i,) + (0,) * (nd - 1))
        for a in img_ins
    ]
    w_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd)
               for w in weights]
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, p8, n_segcls), F32),
        in_specs=img_specs + w_specs,
        out_specs=pl.BlockSpec((1, p8, n_segcls), lambda i: (i, 0, 0)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the per-image working set legitimately exceeds the 16 MB
            # scoped-vmem default; v5e has 128 MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*img_ins, *weights)
    return out.reshape(b, h8, w8, n_segcls)


def _make_psp2_kernel(hw, n_segcls: int, dt, dims=(128, 128, 64, 20)):
    h8, w8 = hw
    p8 = h8 * w8
    c16, c_hid, inner, nctx_total = dims

    def act(acc_f32):
        return _silu_f32(acc_f32).astype(dt)

    def conv3x3(v, cin, w, bias, d, extra=None, w2=None, cin2=0):
        x3 = v.reshape(h8, w8, cin)
        xp = jnp.pad(x3, ((d, d), (d, d), (0, 0)))
        if extra is not None:
            ep = jnp.pad(extra.reshape(h8, w8, cin2),
                         ((d, d), (d, d), (0, 0)))
        acc = jnp.broadcast_to(bias, (p8, bias.shape[-1])).astype(F32)
        for i in range(3):
            for j in range(3):
                tap = xp[i * d:i * d + h8, j * d:j * d + w8, :]
                acc = acc + _mm(tap.reshape(p8, cin), w[i, j])
                if extra is not None:
                    tape = ep[i * d:i * d + h8, j * d:j * d + w8, :]
                    acc = acc + _mm(tape.reshape(p8, cin2), w2[i, j])
        return acc

    def kernel(l16_ref, asum_ref, rsum_ref,
               wm8, bm8,
               w0a8, b0a, w0b, b0b, w1, b1, w2, b2, wg,
               wlin, blin, wred8, bred,
               wpp1, wpp2, bpp2, wpp3, bpp3, wpp6, bpp6,
               wcb, bcb, wfc1, wfc2, wout, bout,
               pk2, uk2, pk3, uk3, pk6, uk6,
               out_ref):
        x8 = l16_ref[0].reshape(p8, c16)
        f8 = act(_mm(x8, wm8[...]) + bm8[...])

        # ---- ACSP spatial path
        x0a = act(_mm(f8, w0a8[...]) + asum_ref[0].astype(F32) + b0a[...])
        x0 = act(conv3x3(x0a, inner, w0b[...], b0b[...], 1))
        x1 = act(conv3x3(x0, inner, w1[...], b1[...], 2))
        x2 = act(conv3x3(x1, inner, w2[...], b2[...], 3))
        gm = jnp.mean(x2.astype(F32), axis=0, keepdims=True).astype(dt)
        gv = _silu_f32(_mm(gm, wg[...])).astype(dt)  # BN skipped (1x1 quirk)
        wlin_ = wlin[...]
        spatial = act(_mm(x0, wlin_[0:inner])
                      + _mm(x1, wlin_[inner:2 * inner])
                      + _mm(x2, wlin_[2 * inner:3 * inner])
                      + _mm(gv, wlin_[3 * inner:4 * inner])
                      + blin[...])

        # ---- context path: red -> pyramid pooling (k=1,2,3,6)
        red = act(_mm(f8, wred8[...]) + rsum_ref[0].astype(F32) + bred[...])
        pooled1 = jnp.mean(red.astype(F32), axis=0, keepdims=True).astype(dt)
        c1 = _silu_f32(_mm(pooled1, wpp1[...])).astype(dt)  # BN skipped
        ctx1 = jnp.broadcast_to(c1, (p8, c1.shape[-1]))
        branches = [ctx1]
        for pk, uk, wk, bk in ((pk2, uk2, wpp2, bpp2),
                               (pk3, uk3, wpp3, bpp3),
                               (pk6, uk6, wpp6, bpp6)):
            pooled = _mm(pk[...], red).astype(dt)  # (k*k, 21)
            ck = act(_mm(pooled, wk[...]) + bk[...])  # (k*k, 5)
            branches.append(_mm(uk[...], ck).astype(dt))
        ctx = jnp.concatenate(branches, axis=-1)  # (P8, 20)

        # ---- FFM: 3x3 conv over [spatial | ctx] + channel attention
        wcb_ = wcb[...]
        nctx = ctx.shape[-1]
        feat = act(conv3x3(spatial, c_hid, wcb_[:, :, 0:c_hid], bcb[...], 1,
                           extra=ctx, w2=wcb_[:, :, c_hid:c_hid + nctx],
                           cin2=nctx))
        m = jnp.mean(feat.astype(F32), axis=0, keepdims=True).astype(dt)
        a1 = _silu_f32(_mm(m, wfc1[...])).astype(dt)
        gate = jax.nn.sigmoid(_mm(a1, wfc2[...])).astype(dt)
        out_feat = feat * gate + feat

        # ---- class conv (with bias, no BN)
        logits = _mm(out_feat, wout[...]) + bout[...]
        out_ref[0] = logits.astype(F32)

    return kernel
