"""Build-time compiler: YAML graph DSL -> concrete flax model.

Keeps the reference's model DSL (rows of [from, number, module, args] with
depth_multiple/width_multiple scaling — yolo.py:443-499 semantics) but
compiles it *ahead of time* into a static LayerSpec list:

- no eval() of module names (explicit registry),
- channel propagation and width gain (make_divisible(c2*gw, 8)) resolved at
  build time,
- layer strides derived *statically* from the graph (the reference probes a
  zeros(2,3,256,256) forward, yolo.py:315 — unnecessary here),
- head outputs discovered structurally (reference hard-codes seg layer 24 via
  save.append(24) / y[-2], yolo.py:305,356 — a documented quirk we fix).

The resulting DeSeNet flax module walks the compiled layer list; under jit
this unrolls into a single XLA graph.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml as pyyaml
from flax import linen as nn

from desenet_tpu.models import heads as H
from desenet_tpu.models import layers as L
from desenet_tpu import quant as quant_mod
from desenet_tpu.ops.resize import upsample_nearest

Dtype = Any

# module-name -> (kind tag used by the walker, needs n repeats from depth gain)
_BLOCKS_WITH_WIDTH = {
    "Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP", "SPPF",
    "DWConv", "MixConv2d", "Focus", "CrossConv", "BottleneckCSP", "C3",
    "C3TR", "C3SPP", "C3Ghost",
}
_REPEAT_INNER = {"BottleneckCSP", "C3", "C3TR", "C3Ghost"}
_SEG_HEADS = {"SegMaskLab", "SegMaskBase", "SegMaskPSP", "SegMaskPSP2",
              "SegMaskBiSe"}
# seg heads with a native int8 path (quant.py); others dequantize at entry
_QUANT_SEG_HEADS = {"SegMaskPSP", "SegMaskPSP2"}
# minimum arg arity per module kind (width blocks default to 1: out-channels)
_MIN_ARGS = {"nn.Upsample": 2, "Detect": 2, "Contract": 1, "Expand": 1,
             "SegMaskLab": 1, "SegMaskBase": 1, "SegMaskPSP": 1,
             "SegMaskPSP2": 1, "SegMaskBiSe": 1}


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    i: int
    f: Tuple[int, ...]  # absolute 'from' layer indices (-1 already resolved)
    name: str  # registry module name
    args: Tuple  # positional args after channel resolution
    c2: int  # output channels
    stride: int  # cumulative stride vs input resolution (0 for heads)
    n: int = 1  # outer repeat count (only for non-inner-repeat modules)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    layers: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]  # layer indices whose outputs later layers consume
    de_nc: int
    se_nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    det_strides: Tuple[int, ...]
    det_layer: int  # index of Detect layer (-1 if absent)
    seg_layer: int  # index of SegMask layer (-1 if absent)
    ch_in: int = 3


def _round_depth(n: int, gd: float) -> int:
    return max(round(n * gd), 1) if n > 1 else n


def parse_config(cfg, ch: int = 3, nc: Optional[int] = None,
                 se_nc: Optional[int] = None,
                 anchors: Optional[Sequence] = None,
                 fuse_focus: bool = True) -> ModelSpec:
    """Compile a model dict / yaml path into a ModelSpec.

    nc / se_nc / anchors override the yaml values (the reference supports the
    det-nc and anchors overrides, yolo.py:298-303; the seg analog prevents
    silent class-count mismatches with the dataset)."""
    if isinstance(cfg, (str, os.PathLike)):
        with open(cfg, "r", encoding="utf-8") as fh:
            cfg = pyyaml.safe_load(fh)

    if not isinstance(cfg, dict):
        raise ValueError(f"model config must be a mapping, got {type(cfg).__name__}")
    missing = [k for k in ("depth_multiple", "width_multiple", "anchors",
                           "backbone", "head")
               if k not in cfg]
    if nc is None and "de_nc" not in cfg:
        missing.insert(0, "de_nc")
    if missing:
        raise ValueError(
            f"model config missing required key(s) {missing}; expected the "
            "reference yaml schema (de_nc/se_nc, depth_multiple, "
            "width_multiple, anchors, backbone, head; see docs/MODEL_DSL.md)")

    de_nc = int(nc if nc is not None else cfg["de_nc"])
    se_nc = int(se_nc if se_nc is not None else cfg.get("se_nc", 0))
    cfg = dict(cfg)
    cfg["de_nc"] = de_nc
    cfg["se_nc"] = se_nc
    if anchors is not None:
        cfg["anchors"] = [list(np.asarray(a).reshape(-1)) for a in
                          np.asarray(anchors).reshape(len(cfg["anchors"]), -1, 2)]
    gd = float(cfg["depth_multiple"])
    gw = float(cfg["width_multiple"])
    anchors = cfg["anchors"]

    chs = [ch]  # per-layer output channels (chs[0] = input)
    strides = [1]  # per-layer cumulative stride
    layers = []
    save = set()
    det_layer = seg_layer = -1
    det_strides: Tuple[int, ...] = ()

    rows = list(cfg["backbone"]) + list(cfg["head"])
    for i, row in enumerate(rows):
        try:
            f, n, mname, args = row
        except (TypeError, ValueError):
            raise ValueError(
                f"model config row {i} must be [from, number, module, args], "
                f"got {row!r}") from None
        fs = tuple(
            (x if x >= 0 else i + x) for x in (f if isinstance(f, list) else [f])
        )
        if not fs:
            raise ValueError(
                f"row {i} ({mname}): 'from' must name at least one input "
                f"layer, got {f!r}")
        for x in fs:
            if not (-1 <= x < i):
                raise ValueError(
                    f"row {i} ({mname}): 'from' index {x} out of range — "
                    f"must reference the input (-1 relative / earlier layer "
                    f"0..{i - 1})")
        n_rep_req = int(n)
        if not 0 < n_rep_req <= 1000:
            raise ValueError(
                f"row {i} ({mname}): repeat count must be in 1..1000, "
                f"got {n!r}")
        n_out = _round_depth(n_rep_req, gd)
        args = list(args)

        # resolve symbolic args from the Parameters block (the reference
        # eval()s them; we substitute explicitly)
        for j, a in enumerate(args):
            if isinstance(a, str) and a in cfg:
                args[j] = cfg[a]
        min_args = _MIN_ARGS.get(
            mname, 1 if mname in _BLOCKS_WITH_WIDTH else 0)
        if len(args) < min_args:
            raise ValueError(
                f"row {i} ({mname}): needs at least {min_args} arg(s), "
                f"got {args!r}")
        if mname == "Detect" and args[0] == cfg.get("de_nc"):
            args[0] = de_nc

        in_stride = strides[fs[0] + 1]
        stride = in_stride
        if mname in _BLOCKS_WITH_WIDTH:
            c2 = args[0]
            c2 = L.make_divisible(c2 * gw, 8)
            margs = [c2, *args[1:]]
            if mname in _REPEAT_INNER:
                margs.insert(1, n_out)  # inner repeat count
                n_rep = 1
            else:
                n_rep = n_out
            if mname == "Focus":
                stride = in_stride * 2
                if fuse_focus:
                    # Focus (slice-concat + kxk conv) == one (2k)x(2k)/s2
                    # conv on the raw image (exact weight rearrangement, see
                    # torch_convert._focus_kernel_to_conv) — ~14% faster
                    # end-to-end on v5e: no strided-slice materialization.
                    k = margs[1] if len(margs) > 1 else 1
                    spec = LayerSpec(i, fs, "FusedFocus",
                                     (c2, 2 * k, 2, k - 1), c2, stride, n_rep)
                    layers.append(spec)
                    chs.append(spec.c2)
                    strides.append(spec.stride)
                    for x in fs:
                        if x != i - 1:
                            save.add(x)
                    continue
            elif mname in ("Conv", "DWConv", "GhostConv", "CrossConv", "MixConv2d"):
                s = margs[2] if len(margs) > 2 else 1
                stride = in_stride * int(s)
            elif mname == "GhostBottleneck":
                s = margs[2] if len(margs) > 2 else 1
                stride = in_stride * int(s)
            spec = LayerSpec(i, fs, mname, tuple(
                tuple(a) if isinstance(a, list) else a for a in margs
            ), c2, stride, n_rep)
        elif mname == "nn.Upsample":
            scale = int(args[1])
            if scale < 1:
                raise ValueError(
                    f"row {i} (nn.Upsample): scale must be >= 1, got {scale}")
            mode = args[2] if len(args) > 2 else "nearest"
            c2 = chs[fs[0] + 1]
            stride = in_stride // scale
            spec = LayerSpec(i, fs, "Upsample", (scale, mode), c2, stride)
        elif mname == "Concat":
            c2 = sum(chs[x + 1] for x in fs)
            spec = LayerSpec(i, fs, "Concat", (), c2, in_stride)
        elif mname == "nn.BatchNorm2d":
            c2 = chs[fs[0] + 1]
            spec = LayerSpec(i, fs, "BatchNorm", (), c2, in_stride)
        elif mname == "Contract":
            g = int(args[0])
            if g < 1:
                raise ValueError(
                    f"row {i} (Contract): gain must be >= 1, got {g}")
            c2 = chs[fs[0] + 1] * g * g
            spec = LayerSpec(i, fs, "Contract", (g,), c2, in_stride * g)
        elif mname == "Expand":
            g = int(args[0])
            if g < 1:
                raise ValueError(
                    f"row {i} (Expand): gain must be >= 1, got {g}")
            c2 = chs[fs[0] + 1] // (g * g)
            spec = LayerSpec(i, fs, "Expand", (g,), c2, in_stride // g)
        elif mname == "Detect":
            det_layer = i
            det_strides = tuple(strides[x + 1] for x in fs)
            anc = args[1]
            if isinstance(anc, int):  # 'anchors: N' shorthand
                if not 0 < anc <= 64:
                    raise ValueError(
                        f"row {i} (Detect): 'anchors: N' shorthand must have "
                        f"0 < N <= 64 anchors per scale, got {anc}")
                anc = [list(range(anc * 2))] * len(fs)
            anchors = anc
            c2 = 0
            spec = LayerSpec(
                i, fs, "Detect",
                (args[0], tuple(tuple(float(v) for v in row) for row in anc)),
                c2, 0,
            )
        elif mname in _SEG_HEADS:
            seg_layer = i
            n_seg = _round_depth(int(args[1]), gd) if len(args) > 1 else 1
            c_hid = L.make_divisible(args[2] * gw, 8) if len(args) > 2 else 256
            shortcut = bool(args[3]) if len(args) > 3 else False
            c2 = int(args[0])
            spec = LayerSpec(i, fs, mname, (int(args[0]), n_seg, c_hid, shortcut),
                             c2, strides[fs[0] + 1])
        else:
            raise ValueError(f"unknown module {mname!r} in model config row {i}")

        layers.append(spec)
        chs.append(spec.c2)
        strides.append(spec.stride)
        for x in fs:
            if x != i - 1:
                save.add(x)

    return ModelSpec(
        layers=tuple(layers),
        save=tuple(sorted(save)),
        de_nc=de_nc,
        se_nc=se_nc,
        anchors=tuple(tuple(float(v) for v in row) for row in anchors),
        det_strides=det_strides,
        det_layer=det_layer,
        seg_layer=seg_layer,
        ch_in=ch,
    )


def _instantiate(spec: LayerSpec, dtype, name: str,
                 fused_csp: bool = True,
                 seg_upsample: bool = True,
                 quant=None) -> Optional[nn.Module]:
    """LayerSpec -> flax module (None for parameterless graph ops)."""
    a = spec.args
    mk = {
        "C3": lambda: L.C3(a[0], *(a[1:]), dtype=dtype, fused=fused_csp,
                           quant=quant, name=name),
        "Conv": lambda: L.ConvBnAct(a[0], *(a[1:]), dtype=dtype, quant=quant,
                                    name=name),
        "DWConv": lambda: L.DWConv(0, a[0], *(a[1:]), dtype=dtype, name=name),
        "Focus": lambda: L.Focus(a[0], *(a[1:]), dtype=dtype, quant=quant,
                                 name=name),
        "FusedFocus": lambda: L.ConvBnAct(a[0], a[1], a[2], a[3], dtype=dtype,
                                          quant=quant, name=name),
        "Bottleneck": lambda: L.Bottleneck(a[0], *(a[1:]), dtype=dtype,
                                           quant=quant, name=name),
        "BottleneckCSP": lambda: L.BottleneckCSP(a[0], *(a[1:]), dtype=dtype,
                                                 name=name),
        "C3TR": lambda: L.C3TR(a[0], *(a[1:]), dtype=dtype, name=name),
        "C3SPP": lambda: L.C3SPP(a[0], *(a[1:]), dtype=dtype, name=name),
        "C3Ghost": lambda: L.C3Ghost(a[0], *(a[1:]), dtype=dtype, name=name),
        "SPP": lambda: L.SPP(a[0], tuple(a[1]) if len(a) > 1 else (5, 9, 13),
                             dtype=dtype, quant=quant, name=name),
        "SPPF": lambda: L.SPPF(a[0], a[1] if len(a) > 1 else 5, dtype=dtype,
                               quant=quant, name=name),
        "GhostConv": lambda: L.GhostConv(a[0], *(a[1:]), dtype=dtype, name=name),
        "GhostBottleneck": lambda: L.GhostBottleneck(a[0], *(a[1:]), dtype=dtype,
                                                     name=name),
        "CrossConv": lambda: L.CrossConv(a[0], *(a[1:]), dtype=dtype, name=name),
        "MixConv2d": lambda: L.MixConv2d(a[0], *(a[1:]), dtype=dtype, name=name),
        "Contract": lambda: L.Contract(a[0], name=name),
        "Expand": lambda: L.Expand(a[0], name=name),
        "BatchNorm": lambda: L.BatchNorm(dtype, name=name),
        "Upsample": lambda: None,
        "Concat": lambda: None,
    }
    if spec.name in mk:
        return mk[spec.name]()
    if spec.name == "Detect":
        return None  # built by DeSeNet with strides
    if spec.name in _SEG_HEADS:
        cls = getattr(H, spec.name)
        n_segcls, n_seg, c_hid, shortcut = spec.args
        kw = dict(n_segcls=n_segcls, n=n_seg, c_hid=c_hid, dtype=dtype,
                  name=name, upsample=seg_upsample)
        if spec.name != "SegMaskPSP2":
            kw["shortcut"] = shortcut
        if spec.name in _QUANT_SEG_HEADS:
            kw["quant"] = quant
        return cls(**kw)
    raise ValueError(spec.name)


def _check_stem_s2d(spec: ModelSpec, quant) -> None:
    """stem_s2d is an exact rewrite ONLY of the shipped stem shape:
    l0 = FusedFocus(k=6, s=2, p=2) fed by the input, l1 = Conv(k=3, s=2)
    fed by l0. Anything else must build without the flag."""
    ok = (
        quant is None
        and len(spec.layers) >= 2
        and spec.layers[0].name == "FusedFocus"
        and tuple(spec.layers[0].args[1:4]) == (6, 2, 2)
        and spec.layers[0].f == (-1,)
        and spec.layers[0].n == 1
        and spec.layers[1].name == "Conv"
        and spec.layers[1].f == (0,)
        and spec.layers[1].n == 1
        and len(spec.layers[1].args) >= 3
        and tuple(spec.layers[1].args[1:3]) == (3, 2)
        and all(a is None or a == 1 or a is True
                for a in spec.layers[1].args[3:])
        and 0 not in spec.save  # nothing downstream reads the phase map
    )
    if not ok:
        raise ValueError(
            "stem_s2d=True requires l0=Focus(k=3)/FusedFocus(6,2,2) on the "
            "input and l1=Conv(k=3,s=2) on l0 (and no int8 quant); this "
            "config does not match — build without stem_s2d")


class DeSeNet(nn.Module):
    """The compiled joint detection+segmentation model.

    __call__(x NHWC in [0,1]) ->
      train=True:  (det_feats [per-scale (B,na,ny,nx,no)], seg_out)
      train=False: ((det_decoded (B,A,no), det_feats), seg_out)
    matching the reference Model._forward_once contract (yolo.py:344-356) with
    the head outputs discovered structurally instead of by index.
    """

    spec: ModelSpec
    dtype: Dtype = jnp.float32
    remat: bool = False  # rematerialize block activations (trade FLOPs for
    # HBM; enables ~2x larger training batches at 640px)
    fused_csp: bool = True  # fused C3 cv1+cv2 (faster inference; the engine
    # trains with False — the backward prefers the split layout — and
    # checkpoints convert exactly in both directions)
    seg_upsample: bool = True  # False: seg head returns 1/8-res logits for
    # the fused Pallas upsample+argmax tail (ops/seg_pallas.py)
    decode_cat: bool = True  # False: Detect returns per-scale decode list
    # for the scale-local NMS prefilter (ops/nms.py)
    quant: Any = None  # QuantCfg for the int8 W8A8 inference path (quant.py)
    stem_s2d: bool = False  # True: input arrives in host-side
    # space-to-depth-4 layout (B, H/4, W/4, 16*ch_in) and l0/l1 run as
    # phase-layout convs (layers.PhaseStemA/B) — exact, same param tree,
    # fixes the cin=3 stem's ~6% MXU utilization (PERF.md)
    act_store: Any = None  # storage dtype (jnp.float8_e4m3fn) for block
    # activations on the EVAL path: ConvBnAct outputs are written to HBM in
    # this dtype, compute stays in `dtype` (layers.act_store_scope). Layers
    # feeding Detect are excluded (same policy as int8). None = off.
    seg_head_fused: bool = False  # eval-only: run SegMaskPSP2 as the fused
    # Pallas whole-head-in-VMEM kernel (ops/seg_head_pallas.py) instead of
    # the XLA module graph. Measured a wash at s (PERF.md round 2); exposed
    # for the m/l economics question (round-4 attribution: 14.3 ms / 17% of
    # the m forward at neither-roofline utilization). Falls back to the XLA
    # path off-TPU, in train mode, under quant/act_store, or when the
    # per-image working set exceeds MAX_P8.
    det_fp_hops: int = 1  # how many COMPUTE layers upstream of Detect stay
    # full-precision under int8/fp8 modes. 1 (default) = the direct det-src
    # layers (through pass-through rows); 2 also keeps their producers fp —
    # the int8 mAP@.5:.95 tail-precision lever (tight-IoU box regression
    # noise enters through the quantized neck features; docs/QUANT.md)

    # modules that natively carry QTensors through the int8 path; others
    # receive dequantized inputs from the walker
    _QUANT_AWARE = frozenset({
        "Conv", "C3", "Focus", "FusedFocus", "SPP", "SPPF", "Bottleneck",
        "Upsample", "Concat", "SegMaskPSP", "SegMaskPSP2",
    })

    def setup(self):
        # layers feeding Detect stay fp: their outputs are the box/obj/cls
        # features — quantizing them costs detection accuracy dearly at the
        # val conf=0.001 tail for near-zero speed gain (they are the last,
        # cheapest convs of the neck)
        det_srcs = (set(self.spec.layers[self.spec.det_layer].f)
                    if self.spec.det_layer >= 0 else set())
        # expand the exclusion through pass-through rows (Concat/Upsample/
        # Contract/Expand carry their inputs' precision unchanged) so the
        # "layers feeding Detect stay full-precision" policy reaches the
        # producing compute layers even when Detect reads a reshaping row.
        # det_fp_hops > 1 additionally walks that many COMPUTE layers
        # upstream (each compute row costs a hop, pass-throughs are free).
        passthrough = {"Concat", "Upsample", "Contract", "Expand"}
        budget = {i: int(self.det_fp_hops) for i in det_srcs}
        frontier = list(det_srcs)
        while frontier:
            i = frontier.pop()
            if i < 0:
                continue
            row = self.spec.layers[i]
            nb = budget[i] if row.name in passthrough else budget[i] - 1
            if nb <= 0:
                continue
            for j in row.f:  # absolute indices; -1 = the model input
                if j >= 0 and budget.get(j, 0) < nb:
                    det_srcs.add(j)
                    budget[j] = nb
                    frontier.append(j)
        self._quant_skip = det_srcs
        if self.stem_s2d:
            _check_stem_s2d(self.spec, self.quant)
        mods = {}
        for ls in self.spec.layers:
            if self.stem_s2d and ls.i == 0:
                mods["l0"] = L.PhaseStemA(c2=ls.args[0], ci=self.spec.ch_in,
                                          dtype=self.dtype, name="l0")
            elif self.stem_s2d and ls.i == 1:
                mods["l1"] = L.PhaseStemB(
                    c2=ls.args[0], ci=self.spec.layers[0].args[0],
                    dtype=self.dtype, name="l1")
            elif ls.name == "Detect":
                mods[f"l{ls.i}"] = H.Detect(
                    nc=ls.args[0],
                    anchors=ls.args[1],
                    strides=self.spec.det_strides,
                    dtype=self.dtype,
                    decode_cat=self.decode_cat,
                    name=f"l{ls.i}",
                )
            else:
                q = (self.quant if ls.name in self._QUANT_AWARE
                     and ls.i not in det_srcs else None)
                if ls.n > 1:
                    # outer repeats mirror torch's nn.Sequential wrapping:
                    # torch 'model.i.j.*' <-> flax 'l{i}s{j}/*'
                    mods[f"l{ls.i}"] = tuple(
                        _instantiate(ls, self.dtype, name=f"l{ls.i}s{j}",
                                     fused_csp=self.fused_csp,
                                     seg_upsample=self.seg_upsample, quant=q)
                        for j in range(ls.n)
                    )
                else:
                    m = _instantiate(ls, self.dtype, name=f"l{ls.i}",
                                     fused_csp=self.fused_csp,
                                     seg_upsample=self.seg_upsample, quant=q)
                    if m is not None:
                        mods[f"l{ls.i}"] = m
        self._mods = mods

    def _run_layer(self, ls, inp, train: bool):
        """Dispatch one graph row to its module / primitive."""
        if ls.name == "Upsample":
            scale, mode = ls.args
            assert mode == "nearest", mode
            if isinstance(inp, quant_mod.QTensor):
                return quant_mod.QTensor(
                    upsample_nearest(inp.data, scale), inp.scale)
            return upsample_nearest(inp, scale)
        if ls.name == "Concat":
            # keep the concat implicit (list) when the only consumer is
            # the immediately-following conv-entry block and every part
            # is MXU-wide — the consumer's first conv then slices its
            # kernel per part (split-conv, PERF.md); else materialize
            nxt = (self.spec.layers[ls.i + 1]
                   if ls.i + 1 < len(self.spec.layers) else None)
            splittable = (
                ls.i not in self.spec.save
                and nxt is not None
                and nxt.name in ("C3", "Conv", "C3TR", "C3Ghost",
                                 "BottleneckCSP", "SPP", "SPPF")
                and nxt.n == 1
                and tuple(nxt.f) == (ls.i,)  # f is absolute indices
            )
            if any(isinstance(v, quant_mod.QTensor) for v in inp):
                return (L.qt_maybe_cat(inp) if splittable
                        else quant_mod.qt_concat(inp))
            if splittable:
                return L.maybe_cat(inp)
            if len({v.dtype for v in inp}) > 1:
                # fp8-stored part next to a bf16 one (det-src boundary)
                inp = [L.to_compute(v, self.dtype) for v in inp]
            return jnp.concatenate(inp, axis=-1)
        if ls.name == "Detect":
            # single-scale Detect: a lone 'from' index arrives as a bare
            # tensor — the head expects one feature map per scale
            if not isinstance(inp, (list, tuple)):
                inp = [inp]
            return self._mods[f"l{ls.i}"](inp, train=train)
        if ls.name in _SEG_HEADS:
            xs = inp if isinstance(inp, list) else [inp]
            if (self.seg_head_fused and not train
                    and ls.name == "SegMaskPSP2"
                    and self.quant is None and self.act_store is None
                    and not self.is_initializing()
                    and jax.default_backend() == "tpu"):
                from desenet_tpu.ops.seg_head_pallas import (MAX_P8,
                                                             fused_psp2_eval)

                if xs[0].shape[1] * xs[0].shape[2] <= MAX_P8:
                    out = fused_psp2_eval(
                        xs, self.variables["params"][f"l{ls.i}"],
                        self.variables["batch_stats"][f"l{ls.i}"],
                        int(ls.args[0])).astype(self.dtype)
                    if self.seg_upsample:
                        from desenet_tpu.ops.resize import resize_bilinear

                        h8, w8 = out.shape[1:3]
                        out = resize_bilinear(out, (h8 * 8, w8 * 8),
                                              align_corners=True)
                    return out
            return self._mods[f"l{ls.i}"](xs, train=train)
        m = self._mods[f"l{ls.i}"]

        def run_mod(mod, y, _train=train):
            return mod(y, train=_train)

        if self.remat and train:
            run_mod = nn.remat(run_mod)
        if isinstance(m, tuple):
            out = inp
            for sub in m:
                out = run_mod(sub, out)
            return out
        return run_mod(m, inp)

    def __call__(self, x, train: bool = False, up_to: Optional[int] = None):
        """Forward. `up_to=k` stops after layer k and returns that layer's
        output (feature extraction / per-layer profiling; analog of the
        reference's feature_visualization hook, yolo.py:354-355)."""
        cache = {}
        det_out = None
        seg_out = None
        if (self.quant is not None and self.quant.is_int8
                and self.spec.layers[0].name in self._QUANT_AWARE):
            # model input is [0,1]: quantize once at the known static scale
            x = quant_mod.quantize(x, 1.0 / 127.0)
        cache[-1] = x
        prev = x
        for ls in self.spec.layers:
            if len(ls.f) == 1:
                inp = prev if ls.f[0] == ls.i - 1 else cache[ls.f[0]]
            else:
                inp = [prev if j == ls.i - 1 else cache[j] for j in ls.f]

            if ls.name not in self._QUANT_AWARE or ls.i in self._quant_skip:
                # heads and non-quantized blocks consume fp activations
                if isinstance(inp, quant_mod.QTensor):
                    inp = quant_mod.dequantize(inp, self.dtype)
                elif isinstance(inp, list):
                    inp = [quant_mod.dequantize(v, self.dtype)
                           if isinstance(v, quant_mod.QTensor) else v
                           for v in inp]

            # fp8 activation storage: scope the storage dtype for this
            # layer's blocks (eval only; layers feeding Detect excluded —
            # their outputs ARE the box/obj/cls features, same policy as
            # the int8 path)
            store = (self.act_store
                     if (self.act_store is not None and not train
                         and ls.name != "Detect"
                         and ls.i not in self._quant_skip) else None)
            with L.act_store_scope(store):
                out = self._run_layer(ls, inp, train)
            if ls.name == "Detect":
                det_out = out
            elif ls.name in _SEG_HEADS:
                seg_out = out

            if ls.i in self.spec.save:
                cache[ls.i] = out
            prev = out
            if up_to is not None and ls.i >= up_to:
                return out
        return det_out, seg_out


def build_model(cfg, ch: int = 3, nc: Optional[int] = None,
                se_nc: Optional[int] = None, anchors: Optional[Sequence] = None,
                fuse_focus: bool = True, remat: bool = False,
                fused_csp: bool = True, seg_upsample: bool = True,
                dtype=jnp.float32, quant=None,
                decode_cat: bool = True,
                stem_s2d: bool = False,
                act_store=None,
                seg_head_fused: bool = False,
                det_fp_hops: int = 1) -> Tuple[DeSeNet, ModelSpec]:
    if isinstance(act_store, str):
        act_store = {"fp8": jnp.float8_e4m3fn,
                     "fp8_e4m3": jnp.float8_e4m3fn,
                     "fp8_e5m2": jnp.float8_e5m2}[act_store]
    if act_store is not None and quant is not None:
        raise ValueError("act_store (fp8 storage) and quant (int8 W8A8) are "
                         "mutually exclusive inference modes")
    spec = parse_config(cfg, ch=ch, nc=nc, se_nc=se_nc, anchors=anchors,
                        fuse_focus=fuse_focus)
    return DeSeNet(spec=spec, dtype=dtype, remat=remat,
                   fused_csp=fused_csp, seg_upsample=seg_upsample,
                   decode_cat=decode_cat, quant=quant,
                   stem_s2d=stem_s2d, act_store=act_store,
                   seg_head_fused=seg_head_fused,
                   det_fp_hops=det_fp_hops), spec


def init_model(model: DeSeNet, rng, img_size: int = 640, batch: int = 1):
    """Initialize params/batch_stats with a dummy forward."""
    if model.stem_s2d:
        x = jnp.zeros((batch, img_size // 4, img_size // 4,
                       16 * model.spec.ch_in), model.dtype)
    else:
        x = jnp.zeros((batch, img_size, img_size, model.spec.ch_in),
                      model.dtype)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    return variables
