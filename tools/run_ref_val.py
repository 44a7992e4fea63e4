"""Cross-framework val-parity harness (BASELINE config 4).

Exports a desenet_tpu checkpoint to torch layout, loads it into the
*reference* PyTorch Model, runs the reference scripts/val.py run() +
seg_validation on a dataset, and prints the metrics to compare against
`python -m desenet_tpu.cli.val` on the same inputs.

Requires the reference checkout (default /root/reference) plus the import
shims for deps missing from this image (pkg_resources/torchvision-nms/
imgviz/seaborn); build them with --write-shims.

Measured result (synthetic 16-image val set, tiny model trained 100 epochs,
256px, fp32):

    reference: P=0.1012 R=0.2199 mAP50=0.0848 mAP=0.0342 mIoU=0.8917
    ours     : P=0.101  R=0.22   mAP50=0.0848 mAP=0.0342 mIoU=0.892

Usage:
    python tools/export_torch_sd.py <ckpt_dir> /tmp/sd.npz
    python tools/run_ref_val.py --sd /tmp/sd.npz --cfg <ref-compatible yaml> \
        --data-root /tmp/fakeds2 --imgsz 256
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import textwrap

SHIMS = {
    "pkg_resources.py": textwrap.dedent(
        """
        class _V:
            def __init__(self, s): self.s = s
            def __ge__(self, other): return True
            def __lt__(self, other): return False
        def parse_version(v): return _V(v)
        class DistributionNotFound(Exception): pass
        class VersionConflict(Exception): pass
        def require(*a, **k): return []
        """
    ),
    "torchvision.py": textwrap.dedent(
        """
        import torch
        class _Ops:
            @staticmethod
            def nms(boxes, scores, iou_threshold):
                order = torch.argsort(scores, descending=True, stable=True)
                b = boxes[order]
                x1, y1, x2, y2 = b.unbind(1)
                areas = (x2-x1).clamp(min=0) * (y2-y1).clamp(min=0)
                suppressed = torch.zeros(b.shape[0], dtype=torch.bool)
                keep = []
                for i in range(b.shape[0]):
                    if suppressed[i]: continue
                    keep.append(order[i])
                    xx1 = torch.maximum(x1[i], x1); yy1 = torch.maximum(y1[i], y1)
                    xx2 = torch.minimum(x2[i], x2); yy2 = torch.minimum(y2[i], y2)
                    inter = (xx2-xx1).clamp(min=0) * (yy2-yy1).clamp(min=0)
                    iou = inter / (areas[i] + areas - inter + 1e-12)
                    suppressed |= iou > iou_threshold
                return (torch.stack(keep) if keep
                        else torch.zeros(0, dtype=torch.long))
        ops = _Ops()
        """
    ),
    "imgviz.py": "def label_colormap(n=256):\n"
                 "    import numpy as np\n"
                 "    return np.zeros((n, 3), dtype=np.uint8)\n",
    "seaborn.py": "def set(*a, **k): pass\n"
                  "def histplot(*a, **k): pass\n"
                  "def pairplot(*a, **k): pass\n",
}

RUNNER = textwrap.dedent(
    """
    import logging, sys
    logging.disable(logging.CRITICAL)
    sys.path.insert(0, '.')
    import PIL.Image
    if not hasattr(PIL.Image, 'ANTIALIAS'):  # removed in Pillow 10
        PIL.Image.ANTIALIAS = PIL.Image.LANCZOS
    import numpy as np
    import torch
    _orig_load = torch.load
    torch.load = lambda *a, **k: _orig_load(*a, **{**k, 'weights_only': False})
    from pathlib import Path
    from core.models.yolo import Model
    import scripts.val as val
    from core.utils.mixed_datasets import create_mixed_dataloader
    import yaml as _yaml

    cfg, sd_path, data_yaml, imgsz, bs = sys.argv[1:6]
    imgsz, bs = int(imgsz), int(bs)
    with open(data_yaml) as f:
        data = _yaml.safe_load(f)
    m = Model(cfg)
    z = np.load(sd_path)
    sd = {k: torch.from_numpy(z[k]) for k in z.files}
    missing, unexpected = m.load_state_dict(sd, strict=False)
    print('missing (expect never-executed quirk BNs):', len(missing))
    m.float().eval()
    loader = create_mixed_dataloader(data['val'], imgsz, bs, 32, False,
                                     pad=0.5, rect=True)[0]
    results, _, _ = val.run(data, model=m, dataloader=loader, half=False,
                            plots=False, save_dir=Path('/tmp/refval'),
                            task='val', batch_size=bs, imgsz=imgsz,
                            save_txt=True, save_conf=True)
    mp, mr, map50, mAP = results[:4]
    miou = val.seg_validation(m, int(data['se']['nc']), loader,
                              half_precision=False)
    print(f'REF: P={mp:.4f} R={mr:.4f} mAP50={map50:.4f} mAP={mAP:.4f} '
          f'mIoU={float(miou):.4f}')
    """
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd", required=True, help="torch-layout npz from "
                    "tools/export_torch_sd.py")
    ap.add_argument("--cfg", required=True,
                    help="reference-format model yaml with matching nc")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--imgsz", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--ref-root", default="/root/reference")
    ap.add_argument("--shim-dir", default="/tmp/refshim")
    args = ap.parse_args()

    os.makedirs(args.shim_dir, exist_ok=True)
    for name, body in SHIMS.items():
        with open(os.path.join(args.shim_dir, name), "w") as f:
            f.write(body)
    runner = os.path.join(args.shim_dir, "_ref_val_runner.py")
    with open(runner, "w") as f:
        f.write(RUNNER)

    env = dict(os.environ)
    env["PYTHONPATH"] = args.shim_dir
    env["RANK"] = "1"  # skip the reference's font download check
    data_yaml = os.path.join(args.data_root, "data.yaml")
    subprocess.run(
        [sys.executable, runner, args.cfg, args.sd, data_yaml,
         str(args.imgsz), str(args.batch_size)],
        cwd=args.ref_root, env=env, check=True,
    )


if __name__ == "__main__":
    main()
