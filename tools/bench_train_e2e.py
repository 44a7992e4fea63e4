"""End-to-end TRAINING throughput: real data pipeline feeding the real step.

PERF.md's train numbers (508.5 img/s/chip at b128) are device-step-only with
synthetic in-HBM batches; the host loader on this 1-CPU-core container peaks
far below that. This tool measures the composite the reference's hot loop
actually runs (train.py:322-376 — loader iteration + device step per batch):

  loader   — epoch img/s of the data pipeline alone (decode + aug + mosaic +
             rasterize + collate + device staging), no step.
  composite— epoch img/s of loader + jitted b128 train step, with the
             loader's `stage` callback device_put-ing the next batch while
             the step runs (double buffering, same wiring as train/engine.py).

Epoch 0 warms compiles / OS page cache / image caches; epochs >=1 are timed.
Variants that trade augmentation or host work for throughput:

  --no-aug            deterministic pipeline (no mosaic/perspective/HSV)
  --cache-images ram  decode once, pin decoded arrays (skips JPEG decode)
  --fast-decode       native scaled-JPEG decode (native/fastops.cpp)

Usage (defaults reproduce the PERF.md row):
  python tools/bench_train_e2e.py --mode all --n-images 512
Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def build_dataset(root: str, n: int, size: int):
    """Synthesize a det+seg dataset of n JPEG images (reference layout).

    Each (n, size) combination gets its OWN subdirectory: regenerating a
    smaller set into a shared root would leave the previous larger image
    set on disk and silently mis-size the measured epoch."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import make_fake_dataset

    ds_root = os.path.join(root, f"n{n}_s{size}")
    marker = os.path.join(ds_root, ".complete")
    if not os.path.exists(marker):
        make_fake_dataset.generate(ds_root, n, 8, size, seed=0)
        open(marker, "w").close()
    return os.path.join(ds_root, "data.yaml")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="existing data.yaml (default: synthesize)")
    ap.add_argument("--root", default="/tmp/e2e_train_ds")
    ap.add_argument("--n-images", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--epochs", type=int, default=3,
                    help="epoch 0 warms; later epochs are timed")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--mode", choices=["loader", "composite", "all"],
                    default="all")
    ap.add_argument("--no-aug", action="store_true")
    ap.add_argument("--fast-decode", action="store_true")
    ap.add_argument("--cache-images", choices=["ram", "disk"], default=None)
    ap.add_argument("--cfg", default="yolov5s_seg")
    args = ap.parse_args(argv)
    if args.epochs < 2:
        # epoch 0 only warms; at least one timed epoch must exist or the
        # rate aggregation below has nothing to report
        args.epochs = 2

    from desenet_tpu.utils.general import enable_compile_cache

    enable_compile_cache(_REPO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from desenet_tpu.data import create_mixed_dataloader
    from desenet_tpu.losses import DetectionLoss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect
    from desenet_tpu.parallel import make_mesh, shard_batch
    from desenet_tpu.parallel.mesh import replicate_tree
    from desenet_tpu.train import (create_train_state, make_train_step,
                                   one_cycle)
    from desenet_tpu.train.engine import DEFAULT_HYP
    from desenet_tpu.train.optim import OptimConfig

    hyp = dict(DEFAULT_HYP)
    data_yaml = args.data or build_dataset(args.root, args.n_images,
                                           args.img_size)
    import yaml

    with open(data_yaml) as f:
        data = yaml.safe_load(f)
    de_nc = int(data["de"]["nc"])
    se_nc = int(data["se"]["nc"])

    model, spec = build_model(config_path(args.cfg), nc=de_nc, se_nc=se_nc,
                              fused_csp=False, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0),
                           img_size=args.img_size, batch=1)
    mesh = make_mesh(1)

    nl = len(spec.det_strides)
    det_ls = spec.layers[spec.det_layer]
    head = Detect(nc=de_nc, anchors=det_ls.args[1], strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in s)
                    for s in head.anchors_grid_units())
    det_loss = DetectionLoss(
        anchors=anchors, nc=de_nc, box_gain=hyp["box"] * 3.0 / nl,
        obj_gain=hyp["obj"] * (args.img_size / 640.0) ** 2 * 3.0 / nl,
        cls_gain=hyp["cls"] * de_nc / 80.0 * 3.0 / nl,
        cls_pw=hyp["cls_pw"], obj_pw=hyp["obj_pw"], fl_gamma=hyp["fl_gamma"],
        anchor_t=hyp["anchor_t"])
    opt_cfg = OptimConfig(lr0=hyp["lr0"], momentum=hyp["momentum"],
                          weight_decay=hyp["weight_decay"],
                          warmup_bias_lr=hyp["warmup_bias_lr"],
                          warmup_momentum=hyp["warmup_momentum"])

    def stage(batch):
        staged = {k: v for k, v in batch.items()
                  if k not in ("paths", "shapes")}
        return {**shard_batch(staged, mesh), "paths": batch["paths"]}

    def make_loader(with_stage):
        loader, ds = create_mixed_dataloader(
            data["train"], img_size=args.img_size,
            batch_size=args.batch_size, augment=not args.no_aug, hyp=hyp,
            stride=max(spec.det_strides), workers=args.workers,
            seed=0, stage=stage if with_stage else None,
            fast_decode=args.fast_decode, cache_images=args.cache_images,
            shuffle=True,
        )
        return loader, ds

    results = {}

    if args.mode in ("loader", "all"):
        loader, _ = make_loader(with_stage=False)
        nb = len(loader)
        n_img = nb * args.batch_size
        rates = []
        for epoch in range(args.epochs):
            loader.set_epoch(epoch)
            t0 = time.perf_counter()
            for batch in loader:
                pass  # numpy batches are already materialized
            dt = time.perf_counter() - t0
            if epoch >= 1:
                rates.append(n_img / dt)
        results["loader"] = max(rates)
        print(json.dumps({
            "metric": "train_loader_only_img_s",
            "value": round(results["loader"], 1), "unit": "img/s",
            "config": {"aug": not args.no_aug, "fast_decode": args.fast_decode,
                       "cache_images": args.cache_images,
                       "batch": args.batch_size, "size": args.img_size},
        }), flush=True)

    if args.mode in ("composite", "all"):
        loader, _ = make_loader(with_stage=True)
        nb = len(loader)
        n_img = nb * args.batch_size
        step_fn = make_train_step(
            model, det_loss, opt_cfg, one_cycle(1.0, hyp["lrf"], args.epochs),
            nb=nb, warmup_iters=max(3 * nb, 12), nominal_bs=args.batch_size,
            batch_size=args.batch_size)
        state = replicate_tree(create_train_state(variables, opt_cfg), mesh)
        rng = jax.random.PRNGKey(1)
        rates = []
        for epoch in range(args.epochs):
            loader.set_epoch(epoch)
            t0 = time.perf_counter()
            for batch in loader:
                batch.pop("paths", None)
                batch.pop("shapes", None)
                rng, srng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, srng)
            jax.block_until_ready(state.params)
            dt = time.perf_counter() - t0
            if epoch >= 1:
                rates.append(n_img / dt)
        results["composite"] = max(rates)
        print(json.dumps({
            "metric": "train_e2e_loader_plus_step_img_s",
            "value": round(results["composite"], 1), "unit": "img/s/chip",
            "config": {"aug": not args.no_aug, "fast_decode": args.fast_decode,
                       "cache_images": args.cache_images,
                       "batch": args.batch_size, "size": args.img_size},
        }), flush=True)

    return results


if __name__ == "__main__":
    main()
