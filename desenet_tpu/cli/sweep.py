"""W&B hyperparameter sweep entry — reference loggers/wandb/sweep.py:17-33:
pulls the sampled hyp from wandb.config and re-enters train().

    wandb sweep <(python -m desenet_tpu.cli.sweep --print-config)
    wandb agent <sweep-id> -- python -m desenet_tpu.cli.sweep --data ...
"""

from __future__ import annotations

import argparse
import json
import tempfile

import yaml

from desenet_tpu.train.engine import DEFAULT_HYP, TrainConfig, train
from desenet_tpu.utils.general import set_logging
from desenet_tpu.utils.wandb_logger import SWEEP_CONFIG, WandbLogger, _WANDB


def main(argv=None):
    set_logging()
    p = argparse.ArgumentParser("desenet_tpu sweep")
    p.add_argument("--print-config", action="store_true",
                   help="dump the sweep search space and exit")
    p.add_argument("--data", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5s_seg")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--project", type=str, default="runs/sweep")
    o = p.parse_args(argv)

    if o.print_config:
        print(json.dumps(SWEEP_CONFIG, indent=1))
        return SWEEP_CONFIG

    assert _WANDB is not None, "wandb is required to run a sweep agent"
    run = _WANDB.init()
    hyp = dict(DEFAULT_HYP)
    hyp.update({k: v for k, v in dict(run.config).items() if k in hyp})
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(hyp, f)
        hyp_path = f.name

    cfg = TrainConfig(
        data=o.data, cfg=o.cfg, hyp=hyp_path, epochs=o.epochs,
        batch_size=o.batch_size, imgsz=o.img_size, project=o.project,
    )
    results = train(cfg)
    run.log({"val/fitness": results.get("best_fitness", 0.0)})
    return results


if __name__ == "__main__":
    main()
