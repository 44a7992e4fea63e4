"""Generate tiny-model parity goldens from the reference implementation.

Runs the reference PyTorch model (read-only mount at /root/reference, with
import shims for deps absent from this image) on tiny width-0.125 configs for
every seg head variant, and saves state_dict + eval outputs as npz under
tests/goldens/. The committed test (tests/test_model_parity.py) then checks
our converted flax model reproduces these outputs bit-closely without needing
the reference tree.

Usage (from /root/repo):
    python tools/gen_goldens.py

Note: the graph must keep the full 26-layer layout — the reference hard-codes
the seg head at layer 24 (yolo.py:305, y[-2] at :356).
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")
CFG_DIR = os.path.join(REPO, "tests", "configs")

# SegMaskBiSe is absent from the reference's parse_model special-case list
# (yolo.py:477) — it cannot be built from yaml there (quirk); we golden-test
# it standalone below instead.
HEAD_ROWS = {
    "psp2": "[[16, 19, 22], 1, SegMaskPSP2, [se_nc, 3, 256]]",
    "psp": "[[16, 19, 22], 1, SegMaskPSP, [se_nc, 3, 256, False]]",
    "lab": "[[4, 19], 1, SegMaskLab, [se_nc, 1, 256, False]]",
    "base": "[[16], 1, SegMaskBase, [se_nc, 1, 256, False]]",
}

TEMPLATE = """\
# tiny parity-test config (width 0.125) — head variant: {head}
de_nc: 3
se_nc: 2
depth_multiple: 0.33
width_multiple: 0.125
anchors:
  - [10, 13, 16, 30, 33, 23]
  - [30, 61, 62, 45, 59, 119]
  - [116, 90, 156, 198, 373, 326]

backbone:
  [[-1, 1, Focus, [64, 3]],
   [-1, 1, Conv, [128, 3, 2]],
   [-1, 3, C3, [128]],
   [-1, 1, Conv, [256, 3, 2]],
   [-1, 9, C3, [256]],
   [-1, 1, Conv, [512, 3, 2]],
   [-1, 9, C3, [512]],
   [-1, 1, Conv, [1024, 3, 2]],
   [-1, 1, SPP, [1024, [5, 9, 13]]],
   [-1, 3, C3, [1024, False]],
  ]

head:
  [[-1, 1, Conv, [512, 1, 1]],
   [-1, 1, nn.Upsample, [None, 2, 'nearest']],
   [[-1, 6], 1, Concat, [1]],
   [-1, 3, C3, [512, False]],
   [-1, 1, Conv, [256, 1, 1]],
   [-1, 1, nn.Upsample, [None, 2, 'nearest']],
   [[-1, 4], 1, Concat, [1]],
   [-1, 3, C3, [256, False]],
   [-1, 1, Conv, [256, 3, 2]],
   [[-1, 14], 1, Concat, [1]],
   [-1, 3, C3, [512, False]],
   [-1, 1, Conv, [512, 3, 2]],
   [[-1, 10], 1, Concat, [1]],
   [-1, 3, C3, [1024, False]],
   {head_row},
   [[17, 20, 23], 1, Detect, [de_nc, anchors]],
  ]
"""

RUNNER = """\
import logging, sys
logging.disable(logging.CRITICAL)
sys.path.insert(0, '.')
import numpy as np
import torch
from core.models.yolo import Model

cfg, out_path, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
torch.manual_seed(seed)
m = Model(cfg)
m.eval()
rng = np.random.default_rng(seed)
x = rng.uniform(0, 1, size=(2, 3, 64, 64)).astype(np.float32)
with torch.no_grad():
    (dec, feats), seg = m(torch.from_numpy(x))
sd = {('sd__' + k): v.detach().numpy() for k, v in m.state_dict().items()}
np.savez_compressed(
    out_path, x=x, dec=dec.numpy(), seg=seg.numpy(),
    **{f'feat{i}': f.numpy() for i, f in enumerate(feats)}, **sd)
print(out_path, 'params',
      sum(int(np.prod(v.shape)) for k, v in sd.items() if 'num_batches' not in k))
"""


BISE_RUNNER = """\
import logging, sys
logging.disable(logging.CRITICAL)
sys.path.insert(0, '.')
import numpy as np
import torch
from core.models.yolo import SegMaskBiSe
from core.utils.torch_utils import initialize_weights

out_path = sys.argv[1]
torch.manual_seed(11)
head = SegMaskBiSe(n_segcls=2, n=1, c_hid=32, ch=(32, 32, 64))
initialize_weights(head)  # BN eps=1e-3 as inside a full Model (yolo.py:322)
head.eval()
rng = np.random.default_rng(11)
xs = [rng.standard_normal((2, c, s, s)).astype(np.float32)
      for c, s in [(32, 16), (32, 8), (64, 4)]]
with torch.no_grad():
    seg = head([torch.from_numpy(v) for v in xs])
sd = {('sd__' + k): v.detach().numpy() for k, v in head.state_dict().items()}
np.savez_compressed(out_path, seg=seg.numpy(),
                    **{f'x{i}': v for i, v in enumerate(xs)}, **sd)
print(out_path)
"""


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    os.makedirs(CFG_DIR, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/tmp/refshim:/root/.axon_site"
    env["RANK"] = "1"

    runner_path = "/tmp/golden_runner.py"
    with open(runner_path, "w") as fh:
        fh.write(RUNNER)
    for head, row in HEAD_ROWS.items():
        cfg_path = os.path.join(CFG_DIR, f"tiny_{head}.yaml")
        with open(cfg_path, "w") as fh:
            fh.write(TEMPLATE.format(head=head, head_row=row))
        out_path = os.path.join(GOLDEN_DIR, f"tiny_{head}.npz")
        subprocess.run(
            [sys.executable, runner_path, cfg_path, out_path, "7"],
            cwd="/root/reference",
            env=env,
            check=True,
        )

    bise_path = "/tmp/golden_bise_runner.py"
    with open(bise_path, "w") as fh:
        fh.write(BISE_RUNNER)
    subprocess.run(
        [sys.executable, bise_path, os.path.join(GOLDEN_DIR, "head_bise.npz")],
        cwd="/root/reference",
        env=env,
        check=True,
    )

    loss_path = "/tmp/golden_loss_runner.py"
    with open(loss_path, "w") as fh:
        fh.write(LOSS_RUNNER)
    subprocess.run(
        [
            sys.executable,
            loss_path,
            os.path.join(CFG_DIR, "tiny_psp2.yaml"),
            os.path.join(GOLDEN_DIR, "det_loss.npz"),
        ],
        cwd="/root/reference",
        env=env,
        check=True,
    )


LOSS_RUNNER = """\
import logging, sys
logging.disable(logging.CRITICAL)
sys.path.insert(0, '.')
import numpy as np
import torch

# Newer torch forbids clamping a long tensor with float bounds; the reference
# (loss.py:218) relies on the old lenient behavior.
_orig_clamp_ = torch.Tensor.clamp_
def _patched_clamp_(self, min=None, max=None):
    conv = lambda v: (v.to(self.dtype) if torch.is_tensor(v) else v)
    return _orig_clamp_(self, conv(min), conv(max))
torch.Tensor.clamp_ = _patched_clamp_

from core.models.yolo import Model
from core.utils.loss import ComputeLoss

cfg, out_path = sys.argv[1], sys.argv[2]
torch.manual_seed(3)
m = Model(cfg)
m.hyp = dict(box=0.05, cls=0.5, cls_pw=1.0, obj=0.7, obj_pw=1.0,
             fl_gamma=0.0, anchor_t=4.0, label_smoothing=0.0)
loss_fn = ComputeLoss(m)

rng = np.random.default_rng(5)
B, nc = 4, 3
shapes = [(B, 3, 8, 8, nc + 5), (B, 3, 4, 4, nc + 5), (B, 3, 2, 2, nc + 5)]
p = [rng.standard_normal(s).astype(np.float32) for s in shapes]
# 14 random targets spread over the batch: [img, cls, x, y, w, h]
n = 14
tg = np.zeros((n, 6), np.float32)
tg[:, 0] = rng.integers(0, B, n)
tg[:, 1] = rng.integers(0, nc, n)
tg[:, 2:4] = rng.uniform(0.1, 0.9, (n, 2))
tg[:, 4:6] = rng.uniform(0.05, 0.6, (n, 2))
total, comps = loss_fn([torch.from_numpy(v) for v in p], torch.from_numpy(tg))
anchors = loss_fn.anchors.numpy()
np.savez(out_path, p0=p[0], p1=p[1], p2=p[2], targets=tg,
         total=total.detach().numpy(), comps=comps.numpy(), anchors=anchors)
print(out_path, 'total', float(total), 'comps', comps.numpy())
"""


if __name__ == "__main__":
    main()
