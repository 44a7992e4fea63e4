"""PyTorch checkpoint -> flax variables converter.

Lets trained reference weights (splwany/DeSeNet .pt checkpoints, see
experimental.py:85-108 attempt_load) validate and seed this framework.

Works on a plain {name: np.ndarray} dict (extract the torch state_dict to
numpy first — no torch dependency here). The mapping is rule-based:

  torch 'model.{i}.<inner>' <-> flax 'l{i}/<inner>'

with per-module-type inner-name tables mirroring how our flax modules were
named (models/layers.py / models/heads.py). Tensor layout transforms:
  conv weight  OIHW -> HWIO        (transpose 2,3,1,0; grouped convs too)
  linear weight (out,in) -> (in,out)
  BN weight/bias/running_mean/running_var -> scale/bias/mean/var

Torch-side keys with no flax counterpart are expected for:
  - num_batches_tracked counters
  - Detect anchors / anchor_grid buffers (static config here)
  - BN layers the reference *creates but never executes* (the Conv 1x1-map
    BN-skip quirk, common.py:53 — e.g. ACSP.branch_global, PyramidPooling
    k=1 conv; 138 params in the shipped config)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util

from desenet_tpu.models.build import ModelSpec, _SEG_HEADS


def _rfb2_table(fpfx: str, tpfx: str, has_global: bool) -> Dict[str, str]:
    t = {
        f"{fpfx}/branch0_a/": f"{tpfx}.branch0.0/",
        f"{fpfx}/branch0_b/": f"{tpfx}.branch0.1/",
        f"{fpfx}/branch1/conv/conv2d/": f"{tpfx}.branch1.0/",
        f"{fpfx}/branch1/bn/bn/": f"{tpfx}.branch1.1/",
        f"{fpfx}/branch2/conv/conv2d/": f"{tpfx}.branch2.0/",
        f"{fpfx}/branch2/bn/bn/": f"{tpfx}.branch2.1/",
        f"{fpfx}/branch3/": f"{tpfx}.branch3.0/",
        f"{fpfx}/conv_linear/": f"{tpfx}.ConvLinear/",
    }
    if has_global:
        t[f"{fpfx}/branch4/conv/"] = f"{tpfx}.branch4.1/"
    return t


def _ffm_table(fpfx: str, tpfx: str) -> Dict[str, str]:
    return {
        f"{fpfx}/convblk/": f"{tpfx}.convblk/",
        f"{fpfx}/att_fc1/conv2d/": f"{tpfx}.channel_attention.1/",
        f"{fpfx}/att_fc2/conv2d/": f"{tpfx}.channel_attention.3/",
    }


def _head_table(head: str) -> Dict[str, str]:
    """flax-subpath-prefix -> torch-subpath-prefix for each seg head type."""
    if head == "SegMaskPSP2":  # yolo.py:200-235
        t = {
            "stem/m8/": "m8.0/",
            "stem/m16/": "m16.0/",
            "stem/m32/": "m32.0/",
            "spatial_path/branch0_a/": "spatial_path.branch0.0/",
            "spatial_path/branch0_b/": "spatial_path.branch0.1/",
            "spatial_path/branch1/conv/conv2d/": "spatial_path.branch1.0/",
            "spatial_path/branch1/bn/bn/": "spatial_path.branch1.1/",
            "spatial_path/branch2/conv/conv2d/": "spatial_path.branch2.0/",
            "spatial_path/branch2/bn/bn/": "spatial_path.branch2.1/",
            "spatial_path/branch_global/conv/": "spatial_path.branch_global.1/",
            "spatial_path/conv_linear/": "spatial_path.ConvLinear/",
            "context_red/": "context_path.0/",
            "context_pp/": "context_path.1/",
            "out/conv2d/": "out.0/",
        }
        t.update(_ffm_table("ffm", "ffm"))
        return t
    if head == "SegMaskPSP":  # yolo.py:156-197
        t = {
            "stem/m8/": "m8.0/",
            "stem/m16/": "m16.0/",
            "stem/m32/": "m32.0/",
            "pp/": "out.1/",
            "out/conv2d/": "out.3/",
        }
        t.update(_rfb2_table("rfb", "out.0", has_global=False))
        t.update(_ffm_table("ffm", "out.2"))
        return t
    if head == "SegMaskBiSe":  # yolo.py:35-91
        t = {
            "m8/": "m8.0/",
            "up16_conv/": "up16.0/",
            "up32_conv/": "up32.0/",
            "out/conv2d/": "out.2/",
            "aux16_conv/": "aux16.0/",
            "aux16_out/conv2d/": "aux16.1/",
            "aux32_conv/": "aux32.0/",
            "aux32_out/conv2d/": "aux32.1/",
        }
        t.update(_rfb2_table("m16", "m16.0", has_global=False))
        t.update(_rfb2_table("m32", "m32.0", has_global=True))
        t.update(_ffm_table("ffm", "out.0"))
        return t
    if head == "SegMaskLab":  # yolo.py:98-129
        t = {
            "detail1/": "detail.0/",
            "detail2/": "detail.1/",
            "enc_red/": "encoder.0/",
            "aspp/branch0/": "encoder.1.branch0.0/",
            "aspp/branch1/conv/conv2d/": "encoder.1.branch1.0/",
            "aspp/branch1/bn/bn/": "encoder.1.branch1.1/",
            "aspp/branch2/conv/conv2d/": "encoder.1.branch2.0/",
            "aspp/branch2/bn/bn/": "encoder.1.branch2.1/",
            "aspp/branch3/conv/conv2d/": "encoder.1.branch3.0/",
            "aspp/branch3/bn/bn/": "encoder.1.branch3.1/",
            "aspp/branch4/conv/": "encoder.1.branch4.1/",
            "aspp/conv_linear/": "encoder.1.ConvLinear/",
            "dec_conv/": "decoder.1/",
            "out/conv2d/": "decoder.2/",
        }
        t.update(_ffm_table("ffm", "decoder.0"))
        return t
    if head == "SegMaskBase":  # yolo.py:134-153
        return {
            "c3/": "m.0/",
            "c3spp/": "m.1/",
            "out/conv2d/": "m.3/",
        }
    raise ValueError(head)


_LEAF = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def flax_path_to_torch_key(path: Tuple[str, ...], spec: ModelSpec) -> str:
    """Translate one flattened flax variable path to its torch state_dict key."""
    joined = "/".join(path)
    m = re.match(r"^l(\d+)(?:s(\d+))?/(.*)$", joined)
    if not m:
        raise KeyError(f"unexpected flax path {joined}")
    li = int(m.group(1))
    seq = m.group(2)
    inner = m.group(3)
    ls = spec.layers[li]

    # head-specific prefix rewrites
    if ls.name in _SEG_HEADS:
        for fp, tp in _head_table(ls.name).items():
            if inner.startswith(fp):
                inner = tp + inner[len(fp):]
                break
    elif ls.name == "Detect":
        inner = re.sub(r"^m(\d+)/", r"m.\1/", inner)
    elif ls.name == "FusedFocus":
        # the fused stem is one ConvBnAct; its torch source is the Focus
        # module's inner Conv: model.i.conv.{conv,bn}.*
        inner = "conv/" + inner

    leaf_src = inner.rsplit("/", 1)[-1]
    body = inner[: -(len(leaf_src) + 1)] if "/" in inner else ""

    # generic structural collapses
    body = body.replace("conv/conv2d", "conv")
    body = body.replace("bn/bn", "bn")
    body = re.sub(r"(^|/)conv2d($|/)", r"\1\2", body).strip("/")
    body = re.sub(r"m_(\d+)", r"m.\1", body)
    body = body.replace("/", ".")

    leaf = _LEAF[leaf_src]
    prefix = f"model.{li}." + (f"{seq}." if seq else "")
    return prefix + (f"{body}.{leaf}" if body else leaf)


def _to_flax_tensor(t: np.ndarray, flax_leaf: str) -> np.ndarray:
    if t.ndim == 4:  # OIHW -> HWIO
        return np.transpose(t, (2, 3, 1, 0))
    if t.ndim == 2 and flax_leaf == "kernel":  # linear (out,in) -> (in,out)
        return np.transpose(t, (1, 0))
    return t


def _focus_kernel_to_conv(w: np.ndarray) -> np.ndarray:
    """Exact Focus -> fused-conv weight rearrangement.

    torch Focus conv weight (O, 4*C, k, k) over the space-to-depth input
    becomes a (2k, 2k, C, O) HWIO kernel over the raw image: tap
    (2*di + oy, 2*dj + ox) takes the w[:, C*(oy + 2*ox):.., di, dj] block
    (slice concat order [(0,0), (1,0), (0,1), (1,1)] in (oy, ox),
    common.py:626).
    """
    o, c4, k, _ = w.shape
    c = c4 // 4
    out = np.zeros((2 * k, 2 * k, c, o), w.dtype)
    for oy in range(2):
        for ox in range(2):
            s = oy + 2 * ox
            blk = w[:, c * s:c * (s + 1)]  # (O, C, k, k)
            out[oy::2, ox::2] = np.transpose(blk, (2, 3, 1, 0))
    return out


def _conv_kernel_to_focus(w6: np.ndarray) -> np.ndarray:
    """Inverse of _focus_kernel_to_conv: (2k,2k,C,O) HWIO -> (O,4C,k,k)."""
    kk, _, c, o = w6.shape
    k = kk // 2
    out = np.zeros((o, 4 * c, k, k), w6.dtype)
    for oy in range(2):
        for ox in range(2):
            s = oy + 2 * ox
            out[:, c * s:c * (s + 1)] = np.transpose(
                w6[oy::2, ox::2], (3, 2, 0, 1)
            )
    return out


def fused_csp_sources(path: Tuple[str, ...]):
    """For a fused-C3 leaf (cv12 / bn12, models/layers.py C3), return the two
    unfused flax pseudo-paths it merges plus the flax-side concat axis."""
    p = list(path)
    if "cv12" in p:
        i = p.index("cv12")  # (..., cv12, conv2d, kernel)
        p1 = p[:i] + ["cv1", "conv"] + p[i + 1:]
        p2 = p[:i] + ["cv2", "conv"] + p[i + 1:]
        return tuple(p1), tuple(p2), -1
    if "bn12" in p:
        i = p.index("bn12")  # (..., bn12, bn, leaf)
        p1 = p[:i] + ["cv1", "bn"] + p[i + 1:]
        p2 = p[:i] + ["cv2", "bn"] + p[i + 1:]
        return tuple(p1), tuple(p2), 0
    return None


def convert_state_dict(
    torch_sd: Dict[str, np.ndarray],
    template_vars,
    spec: ModelSpec,
    strict: bool = True,
):
    """Fill a flax variables template from a torch state_dict.

    template_vars: the dict returned by model.init (gives paths+shapes).
    Returns (variables, report) where report lists unused torch keys and any
    missing flax leaves.
    """
    fused_focus_layers = {
        f"l{ls.i}" for ls in spec.layers if ls.name == "FusedFocus"
    }
    out = {}
    used = set()
    missing = []
    for col in template_vars:
        flat = traverse_util.flatten_dict(template_vars[col])
        new_flat = {}
        for path, val in flat.items():
            fs = fused_csp_sources(path)
            if fs is not None:
                p1, p2, ax = fs
                k1 = flax_path_to_torch_key(p1, spec)
                k2 = flax_path_to_torch_key(p2, spec)
                if k1 not in torch_sd or k2 not in torch_sd:
                    missing.append((col, "/".join(path), f"{k1}+{k2}"))
                    new_flat[path] = val
                    continue
                t = np.concatenate(
                    [_to_flax_tensor(np.asarray(torch_sd[k]), path[-1])
                     for k in (k1, k2)], axis=ax,
                )
                used.add(k1)
                used.add(k2)
                if tuple(t.shape) != tuple(val.shape):
                    raise ValueError(
                        f"shape mismatch {k1}+{k2} {t.shape} -> "
                        f"{'/'.join(path)} {val.shape}"
                    )
                new_flat[path] = t.astype(np.asarray(val).dtype)
                continue
            tkey = flax_path_to_torch_key(path, spec)
            if tkey not in torch_sd:
                missing.append((col, "/".join(path), tkey))
                new_flat[path] = val
                continue
            if path[0] in fused_focus_layers and path[-1] == "kernel":
                t = _focus_kernel_to_conv(np.asarray(torch_sd[tkey]))
            else:
                t = _to_flax_tensor(np.asarray(torch_sd[tkey]), path[-1])
            if tuple(t.shape) != tuple(val.shape):
                raise ValueError(
                    f"shape mismatch {tkey} {t.shape} -> {'/'.join(path)} {val.shape}"
                )
            new_flat[path] = t.astype(np.asarray(val).dtype)
            used.add(tkey)
        out[col] = traverse_util.unflatten_dict(new_flat)

    unused = [
        k
        for k in torch_sd
        if k not in used
        and not k.endswith("num_batches_tracked")
        and "anchor" not in k
    ]
    if strict and missing:
        raise ValueError(f"missing torch tensors for flax leaves: {missing[:10]}")
    return out, {"unused_torch_keys": unused, "missing": missing}


def load_torch_npz(path: str) -> Dict[str, np.ndarray]:
    """Load a state_dict that was exported with np.savez (tools/export_ref)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
