"""Reverse-direction trained-weight parity harness: train in the
*reference* (PyTorch, CPU), then import the .pt here and compare both val
stacks. Complements tools/run_ref_val.py (which goes ours -> reference).

This exercises the reference hot loop (/root/reference/scripts/train.py:65)
with the same shims run_ref_val.py uses for packages missing from this
image, writing everything under --project (never into the read-only
reference checkout; dataset caches land next to the dataset).

Usage:
    python tools/make_fake_dataset.py /tmp/refds --size 256
    python tools/run_ref_train.py --cfg /tmp/tiny6.yaml \
        --data-root /tmp/refds --imgsz 128 --epochs 40 --project /tmp/refrun
    python tools/import_torch_ckpt.py /tmp/refrun/exp/weights/best.pt \
        /tmp/ref_imported --cfg /tmp/tiny6.yaml
    python -m desenet_tpu.cli.val --data /tmp/refds/data.yaml \
        --weights /tmp/ref_imported --img-size 128 --no-half
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import textwrap

from run_ref_val import SHIMS  # same missing-package shims

RUNNER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, '.')
    import PIL.Image
    if not hasattr(PIL.Image, 'ANTIALIAS'):  # removed in Pillow 10
        PIL.Image.ANTIALIAS = PIL.Image.LANCZOS
    from PIL import ImageFont
    if not hasattr(ImageFont.FreeTypeFont, 'getsize'):  # removed in Pillow 10
        ImageFont.FreeTypeFont.getsize = (
            lambda self, t: self.getbbox(t)[2:4])
    import torch
    _orig_load = torch.load
    torch.load = lambda *a, **k: _orig_load(*a, **{**k, 'weights_only': False})

    # torch>=1.13 rejects in-place clamp of integer tensors with float
    # bounds (loss.py:218 clamps long grid indices with a float gain) —
    # cast the bounds like the era-matched torch did implicitly
    _orig_clamp_ = torch.Tensor.clamp_
    def _compat_clamp_(self, min=None, max=None):
        if not torch.is_floating_point(self):
            def cast(v):
                if isinstance(v, torch.Tensor) and torch.is_floating_point(v):
                    return v.to(self.dtype)
                if isinstance(v, float):
                    return int(v)
                return v
            min, max = cast(min), cast(max)
        return _orig_clamp_(self, min=min, max=max)
    torch.Tensor.clamp_ = _compat_clamp_

    # latent reference bug: loggers.on_train_batch_end does
    # `assert wandb is not None` under the hardcoded plots=True
    # (train.py:101, loggers/__init__.py:97) — the reference cannot train
    # at all without the wandb package. Skip the mosaic hook; metrics,
    # csv, TB and checkpoints are unaffected.
    import core.utils.loggers as _rl
    _rl.Loggers.on_train_batch_end = lambda self, *a, **k: None
    import scripts.train as train

    (cfg, data_yaml, imgsz, bs, epochs, project, hyp) = sys.argv[1:8]
    train.run(
        cfg=cfg, data=data_yaml, hyp=hyp, weights='',
        imgsz=int(imgsz), batch_size=int(bs), epochs=int(epochs),
        project=project, name='exp', exist_ok=True, device='cpu',
        workers=2, noautoanchor=True, patience=10**6, single_cls=False,
        adam=False, linear_lr=False, label_smoothing=0.0, freeze=0,
        save_period=-1, nosave=False, noval=False, evolve=None,
        rect=False, resume=False, image_weights=False, multi_scale=False,
        sync_bn=False, quad=False, cache=None, entity=None,
        upload_dataset=False, bbox_interval=-1, artifact_alias='latest',
    )
    """
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True,
                    help="reference-format model yaml (de_nc/se_nc must "
                         "match the dataset)")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--project", default="/tmp/refrun")
    ap.add_argument("--hyp", default=None,
                    help="hyp yaml (default: the reference's scratch.yaml)")
    ap.add_argument("--ref-root", default="/root/reference")
    ap.add_argument("--shim-dir", default="/tmp/refshim")
    args = ap.parse_args()

    os.makedirs(args.shim_dir, exist_ok=True)
    for name, body in SHIMS.items():
        with open(os.path.join(args.shim_dir, name), "w") as f:
            f.write(body)
    runner = os.path.join(args.shim_dir, "_ref_train_runner.py")
    with open(runner, "w") as f:
        f.write(RUNNER)

    hyp = args.hyp or os.path.join(args.ref_root, "core", "hyp",
                                   "scratch.yaml")
    # The reference's Annotator class body asserts a CJK TTF exists in
    # ~/.config/fonts (plots.py:54-64; zero egress here, so no download) —
    # satisfy it with any real TTF. Training must run as RANK=-1 (single
    # process) or EMA/val/checkpointing are skipped, so the run_ref_val.py
    # RANK=1 dodge is not available.
    import shutil

    import matplotlib
    font_dir = os.path.join(os.path.expanduser("~"), ".config", "fonts")
    os.makedirs(font_dir, exist_ok=True)
    target = os.path.join(font_dir, "wqy-microhei.ttc")
    if not os.path.exists(target):
        src = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                           "fonts", "ttf", "DejaVuSans.ttf")
        shutil.copyfile(src, target)

    env = dict(os.environ)
    env["PYTHONPATH"] = args.shim_dir
    env.pop("RANK", None)
    env["WANDB_DISABLED"] = "true"
    data_yaml = os.path.join(args.data_root, "data.yaml")
    subprocess.run(
        [sys.executable, runner, args.cfg, data_yaml, str(args.imgsz),
         str(args.batch_size), str(args.epochs), args.project, hyp],
        cwd=args.ref_root, env=env, check=True,
    )


if __name__ == "__main__":
    main()
