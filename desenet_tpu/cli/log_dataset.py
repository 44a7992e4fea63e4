"""Standalone dataset-artifact upload CLI.

Reference: core/utils/loggers/wandb/log_dataset.py (argparse wrapper) +
wandb_utils.py:188-209 `check_and_upload_dataset` — uploads the train/val
splits as W&B dataset artifacts and writes a ``<data>_wandb.yaml`` whose
split paths are ``wandb-artifact://`` references, printing its path.

Transport follows utils/wandb_logger.py: real ``wandb`` when importable,
the vendored offline backend otherwise (zero-egress container).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import yaml

from desenet_tpu.utils.general import check_dataset, set_logging
from desenet_tpu.utils.wandb_logger import WandbLogger


def create_dataset_artifact(data: str, project: str = "desenet_tpu",
                            name: str = "log dataset",
                            entity: str | None = None,
                            single_cls: bool = False) -> Path:
    """Upload the dataset splits and write the artifact-referencing yaml.

    Returns the path of the written ``*_wandb.yaml`` config.
    """
    data_dict = check_dataset(data)
    if single_cls:
        # reference semantics (train.py --single-cls): one det class
        data_dict = dict(data_dict)
        data_dict["de"] = {"nc": 1, "names": ["item"]}
    names = dict(enumerate(data_dict["de"]["names"]))

    wb = WandbLogger(project=Path(project).stem or project, name=name,
                     entity=entity, job_type="Dataset Creation",
                     config={"data": str(data), "single_cls": single_cls})
    out = wb.log_dataset_artifact(data_dict, names, project=project)
    wb.on_train_end()

    cfg_path = Path(str(data)).with_name(
        Path(str(data)).stem + "_wandb.yaml")
    with open(cfg_path, "w", encoding="utf-8") as f:
        yaml.safe_dump(out, f, sort_keys=False)
    print(f"Created dataset config file {cfg_path}")
    return cfg_path


def main(argv=None):
    set_logging()
    p = argparse.ArgumentParser(
        description="upload a dataset as W&B artifacts")
    p.add_argument("--data", type=str, required=True, help="data.yaml path")
    p.add_argument("--single-cls", action="store_true",
                   help="train as single-class dataset")
    p.add_argument("--project", type=str, default="desenet_tpu",
                   help="name of W&B project")
    p.add_argument("--entity", default=None, help="W&B entity")
    p.add_argument("--name", type=str, default="log dataset",
                   help="name of W&B run")
    opt = p.parse_args(argv)
    create_dataset_artifact(opt.data, project=opt.project, name=opt.name,
                            entity=opt.entity, single_cls=opt.single_cls)


if __name__ == "__main__":
    main()
