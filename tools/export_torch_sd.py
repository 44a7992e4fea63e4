"""Export a desenet_tpu checkpoint to a PyTorch-layout state_dict (.npz).

The inverse of tools/import_torch_ckpt.py: every flax leaf is renamed with
utils/torch_convert.flax_path_to_torch_key and transposed back to torch
layout (HWIO -> OIHW, (in,out) -> (out,in)). The npz can be loaded into the
reference Model with:

    sd = {k: torch.from_numpy(v) for k, v in np.load(path).items()}
    model.load_state_dict(sd, strict=False)   # quirk-BNs keep torch init

Used by the val-parity harness (tools/run_ref_val.py) and by users migrating
back to the torch reference.
"""

from __future__ import annotations

import argparse

import numpy as np
from flax import traverse_util

from desenet_tpu.models import build_model, config_path
from desenet_tpu.utils.checkpoint import load_inference_variables
from desenet_tpu.utils.torch_convert import flax_path_to_torch_key


def to_torch_tensor(x: np.ndarray, leaf: str) -> np.ndarray:
    if x.ndim == 4:
        return np.transpose(x, (3, 2, 0, 1))  # HWIO -> OIHW
    if x.ndim == 2 and leaf == "kernel":
        return np.transpose(x, (1, 0))
    return x


def export_state_dict(weights_dir: str):
    variables, meta = load_inference_variables(weights_dir)
    assert meta is not None
    _, spec = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                          se_nc=meta["se_nc"])
    from desenet_tpu.utils.torch_convert import (
        _conv_kernel_to_focus,
        fused_csp_sources,
    )

    fused = {f"l{ls.i}" for ls in spec.layers if ls.name == "FusedFocus"}
    out = {}
    for col in ("params", "batch_stats"):
        if col not in variables or not variables[col]:
            continue
        for path, val in traverse_util.flatten_dict(variables[col]).items():
            val = np.asarray(val, np.float32)
            fs = fused_csp_sources(path)
            if fs is not None:  # split fused C3 cv12/bn12 back into cv1+cv2
                p1, p2, ax = fs
                half = val.shape[ax] // 2
                v1, v2 = np.split(val, [half], axis=ax)
                out[flax_path_to_torch_key(p1, spec)] = to_torch_tensor(
                    v1, path[-1]
                )
                out[flax_path_to_torch_key(p2, spec)] = to_torch_tensor(
                    v2, path[-1]
                )
                continue
            tkey = flax_path_to_torch_key(path, spec)
            if path[0] in fused and path[-1] == "kernel":
                out[tkey] = _conv_kernel_to_focus(val)
            else:
                out[tkey] = to_torch_tensor(val, path[-1])
    return out, meta, spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights_dir")
    ap.add_argument("out_npz")
    args = ap.parse_args()
    sd, meta, spec = export_state_dict(args.weights_dir)
    np.savez(args.out_npz, **sd)
    print(f"exported {len(sd)} tensors -> {args.out_npz} "
          f"(cfg={meta['cfg']}, de_nc={spec.de_nc}, se_nc={spec.se_nc})")


if __name__ == "__main__":
    main()
