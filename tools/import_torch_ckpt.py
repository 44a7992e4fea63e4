"""Import a reference (splwany/DeSeNet) PyTorch .pt checkpoint into a
desenet_tpu orbax checkpoint.

The reference pickles the full nn.Module (train.py:426-443), so unpickling
needs the reference code importable: pass --ref-root pointing at a DeSeNet
checkout (default /root/reference). Prefers the 'ema' weights like
attempt_load (experimental.py:85-108).

Usage:
    python tools/import_torch_ckpt.py best.pt out_ckpt \
        --cfg yolov5s_seg --data data.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pt_path")
    ap.add_argument("out_dir")
    ap.add_argument("--cfg", default="yolov5s_seg",
                    help="matching desenet_tpu model config")
    ap.add_argument("--ref-root", default="/root/reference")
    ap.add_argument("--de-names", nargs="*", default=None)
    ap.add_argument("--se-names", nargs="*", default=None)
    args = ap.parse_args()

    sys.path.insert(0, args.ref_root)
    import numpy as np
    import torch

    ckpt = torch.load(args.pt_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        module = ckpt.get("ema") or ckpt.get("model") or ckpt
    else:
        module = ckpt
    sd = {k: v.float().numpy() for k, v in module.state_dict().items()}

    import jax
    import orbax.checkpoint as ocp

    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.utils.torch_convert import convert_state_dict

    model, spec = build_model(config_path(args.cfg))
    template = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    variables, report = convert_state_dict(sd, template, spec)
    print(f"converted; {len(report['unused_torch_keys'])} unused torch keys "
          f"(expected: quirk BNs + buffers)")

    payload = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray,
                                    variables.get("batch_stats", {})),
        "ema_params": None,
        "ema_batch_stats": None,
    }
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.out_dir), payload,
                                  force=True)
    meta = {
        "cfg": args.cfg,
        "imgsz": 640,
        "de_nc": spec.de_nc,
        "se_nc": spec.se_nc,
        "de_names": args.de_names or [str(i) for i in range(spec.de_nc)],
        "se_names": args.se_names or [str(i) for i in range(spec.se_nc)],
        "source": os.path.abspath(args.pt_path),
    }
    with open(os.path.join(os.path.abspath(args.out_dir), "meta.json"),
              "w") as f:
        json.dump(meta, f, indent=1)
    print(f"saved {args.out_dir}")


if __name__ == "__main__":
    main()
