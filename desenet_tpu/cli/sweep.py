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


def _sample_hyp(rng):
    """One random draw from the sweep search space (reference
    sweep.yaml:17-143 distributions)."""
    hyp = dict(DEFAULT_HYP)
    for k, spec in SWEEP_CONFIG["parameters"].items():
        if k not in hyp:
            continue
        if spec.get("distribution") == "uniform":
            hyp[k] = float(rng.uniform(spec["min"], spec["max"]))
        elif "values" in spec:
            hyp[k] = spec["values"][int(rng.integers(len(spec["values"])))]
    return hyp


def run_local(o):
    """Zero-egress random-search sweep: N trials sampled from SWEEP_CONFIG,
    each logged through print_mutation (evolve.csv + hyp_evolve.yaml — the
    reference's evolution bookkeeping, general.py:769-805). Returns the best
    (fitness, hyp)."""
    import dataclasses

    import numpy as np

    from desenet_tpu.utils.general import print_mutation

    rng = np.random.default_rng(o.seed)
    best = (-1.0, None)
    for trial in range(o.local):
        hyp = _sample_hyp(rng)
        with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                         delete=False) as f:
            yaml.safe_dump(hyp, f)
            hyp_path = f.name
        cfg = TrainConfig(
            data=o.data, cfg=o.cfg, hyp=hyp_path, epochs=o.epochs,
            batch_size=o.batch_size, imgsz=o.img_size, project=o.project,
            name=f"trial{trial}", exist_ok=True, use_tb=False,
            **(json.loads(o.train_kwargs) if o.train_kwargs else {}),
        )
        results = train(cfg)
        fi = float(results.get("best_fitness", 0.0))
        print_mutation({"fitness": fi}, hyp, o.project)
        print(f"trial {trial}: fitness={fi:.4f}")
        if fi > best[0]:
            best = (fi, hyp)
    print(f"best fitness {best[0]:.4f}; best hyp in "
          f"{o.project}/hyp_evolve.yaml")
    return best


def main(argv=None):
    set_logging()
    p = argparse.ArgumentParser("desenet_tpu sweep")
    p.add_argument("--print-config", action="store_true",
                   help="dump the sweep search space and exit")
    p.add_argument("--local", type=int, default=0,
                   help="run N local random-search trials (no wandb agent "
                        "needed; logs evolve.csv/hyp_evolve.yaml)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-kwargs", type=str, default="",
                   help="JSON dict of extra TrainConfig fields for trials")
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
    if o.local:
        return run_local(o)

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
