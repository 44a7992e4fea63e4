"""The training engine — reference train.py:65-487 `train()` equivalent,
re-orchestrated around a single jitted train step.

Flow (call stack parity with SURVEY §3.1): dataset check -> model build
(+ optional transfer/resume) -> 3-group optimizer + one-cycle schedule + EMA
-> mixed dataloaders (train aug / val rect) -> hyp gain scaling
(box*3/nl, cls*nc/80*3/nl, obj*(imgsz/640)^2*3/nl, train.py:258-260) ->
epoch loop {train steps, EMA val (mAP + mIoU), fitness_det_seg checkpointing,
early stop} -> final strip.
"""

from __future__ import annotations

import logging
import math
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from desenet_tpu.data import create_mixed_dataloader
from desenet_tpu.eval.validator import Validator
from desenet_tpu.losses import DetectionLoss
from desenet_tpu.models import build_model, config_path, init_model
from desenet_tpu.models.heads import Detect
from desenet_tpu.parallel import make_mesh, shard_batch
from desenet_tpu.parallel.mesh import check_spatial, replicate_tree
from desenet_tpu.train import create_train_state, make_train_step, one_cycle
from desenet_tpu.train.optim import OptimConfig
from desenet_tpu.train.schedule import linear_lr
from desenet_tpu.utils import checkpoint as ckpt
from desenet_tpu.utils.callbacks import Callbacks
from desenet_tpu.utils.general import (
    EarlyStopping,
    check_dataset,
    check_img_size,
    increment_path,
    init_seeds,
    labels_to_class_weights,
)
from desenet_tpu.utils.loggers import Loggers
from desenet_tpu.utils.metrics import fitness_det_seg

LOGGER = logging.getLogger("desenet_tpu")

DEFAULT_HYP = dict(
    lr0=0.01, lrf=0.2, momentum=0.937, weight_decay=0.0005,
    warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
    box=0.05, cls=0.5, cls_pw=1.0, obj=0.7, obj_pw=1.0,
    iou_t=0.2, anchor_t=4.0, fl_gamma=0.0,
    hsv_h=0.05, hsv_s=0.2, hsv_v=0.1,
    degrees=0.0, translate=0.1, scale=0.2, shear=0.0, perspective=0.0,
    flipud=0.0, fliplr=0.5, mosaic=1.0, mixup=0.0,
)


@dataclass
class TrainConfig:
    data: str = ""  # dataset yaml
    cfg: str = "yolov5s_seg"  # model config name/path
    hyp: Optional[str] = None  # hyp yaml path (None -> DEFAULT_HYP)
    weights: str = ""  # pretrain checkpoint dir ('' = from scratch)
    epochs: int = 300
    batch_size: int = 16
    imgsz: int = 640
    workers: int = 8
    project: str = "runs/train"
    name: str = "exp"
    exist_ok: bool = False
    single_cls: bool = False
    adam: bool = False
    linear_lr: bool = False
    label_smoothing: float = 0.0
    patience: int = 30
    seed: int = 0
    max_targets: int = 128
    noval: bool = False
    nosave: bool = False
    save_period: int = -1
    det_gain: float = 0.14  # train.py:285 detgain
    seg_gain: float = 1.0
    resume: str = ""  # checkpoint dir to resume from
    dtype: str = "bfloat16"
    n_devices: Optional[int] = None
    use_tb: bool = True
    noautoanchor: bool = False
    multi_scale: bool = False  # random 0.5-1.5x size buckets per batch
    image_weights: bool = False  # class-weighted image resampling per epoch
    nbs: int = 64  # nominal batch size for grad accumulation (train.py:146)
    warmup_floor: int = 1000  # min warmup iterations (train.py:287 hardcodes
    # 1000; configurable here because it swamps small-dataset runs)
    remat: bool = False  # rematerialize activations (bigger batches)
    wandb: bool = False  # W&B sink (offline backend when pkg absent)
    upload_dataset: bool = False  # log the dataset as a W&B artifact
    entity: Optional[str] = None  # W&B entity (train.py --entity)
    bbox_interval: int = -1  # epochs between W&B val media panels; -1 =
    # epochs//10 like the reference (wandb_utils.py:252-253)
    artifact_alias: str = "latest"  # dataset artifact version for
    # wandb-artifact:// splits (train.py --artifact_alias)
    fast_decode: bool = False  # scaled-JPEG train decode (native libjpeg;
    # ~4x PIL on oversized sources, not pixel-equal — val keeps PIL)
    cache_images: Optional[str] = None  # "ram" | "disk": decode each image
    # once (reference datasets.py:57-86 cache_images; decode is ~76% of
    # mosaic sample cost, PERF.md)
    rect: bool = False  # aspect-sorted per-batch shapes (train.py --rect;
    # disables mosaic + shuffle; one jit specialization per shape bucket)
    quad: bool = False  # quad collate: groups of 4 -> 2x2 super-image or
    # 2x upscale (train.py --quad, mixed_datasets.py collate_fn4)
    freeze: int = 0  # freeze first N layers (train.py:137-143)
    spatial: int = 1  # spatial-partitioning factor: 2D (data, spatial) mesh
    # with image/label HEIGHT sharded over 'spatial' (parallel/mesh.py) —
    # for when per-device batch would drop below 1 (huge images/many chips).
    # imgsz must keep the deepest feature map >= 2 rows/shard (check_spatial)
    fused_seg_loss: bool = True  # train the seg head at 1/8 resolution and
    # compute the CE-vs-8x-upsample objective with the tiled fused kernel
    # (ops/seg_ce.py) instead of materializing the full-res logits + their
    # cotangent — same loss/grads to f32 summation order; the dominant
    # single activation of the l/b128 step disappears. --no-fused-seg-loss
    # restores the literal reference formulation.


def load_hyp(path: Optional[str]) -> Dict:
    hyp = dict(DEFAULT_HYP)
    if path:
        with open(path, encoding="utf-8") as f:
            hyp.update(yaml.safe_load(f))
    return hyp


def train(cfg: TrainConfig, callbacks: Optional[Callbacks] = None) -> Dict:
    callbacks = callbacks or Callbacks()
    init_seeds(cfg.seed)
    hyp = load_hyp(cfg.hyp)

    # Multi-process (multi-host) SPMD: when launched under
    # jax.distributed.initialize (cli/train.py reads DESENET_COORDINATOR /
    # DESENET_NUM_PROCESSES / DESENET_PROCESS_ID), every process runs this
    # same engine; process 0 owns all artifacts (ckpt/logs/plots/val) like
    # the reference's rank-0 guards (/root/reference/scripts/train.py:319,
    # 393), each process loads a strided shard of every global batch
    # (DistributedSampler analog, train.py:223-226) and promotes it with
    # jax.make_array_from_process_local_data, and processes sync at
    # dataset-cache and checkpoint boundaries (torch_distributed_zero_first
    # analog, core/utils/torch_utils.py:27-36).
    pc = jax.process_count()
    is_main = jax.process_index() == 0
    if pc > 1:
        from desenet_tpu.parallel.multihost import (
            broadcast_str, global_batch_from_local, sync_hosts)

        if cfg.batch_size % pc:
            raise ValueError(
                f"global batch {cfg.batch_size} not divisible by "
                f"{pc} processes")
        if cfg.quad and (cfg.batch_size // pc) % 4:
            raise ValueError(
                f"--quad needs the per-process batch "
                f"({cfg.batch_size}/{pc}={cfg.batch_size // pc}) divisible "
                f"by 4 (collate groups 4 images per super-image)")
        if cfg.spatial > 1:
            raise ValueError(
                "multi-process training supports spatial=1 only (per-host "
                "input shards split the batch axis)")
        if cfg.rect:
            raise ValueError(
                "multi-process training is incompatible with --rect: "
                "aspect-sorted batch shapes diverge across hosts")
        # --wandb runs on process 0 only; wandb-artifact:// dataset paths
        # are not resolved on workers (pass local paths when multi-process)
    local_bs = cfg.batch_size // pc

    if is_main:
        save_dir = str(increment_path(os.path.join(cfg.project, cfg.name),
                                      exist_ok=cfg.exist_ok, mkdir=True))
        with open(os.path.join(save_dir, "hyp.yaml"), "w") as f:
            yaml.safe_dump(hyp, f)
        with open(os.path.join(save_dir, "opt.yaml"), "w") as f:
            # real types, so bare --resume can restore the run's options
            # (reference train.py:538-547 reloads opt.yaml into the
            # namespace); path-like fields are absolutized so resume works
            # from any cwd
            snap = {}
            for k, v in vars(cfg).items():
                if not isinstance(v, (str, int, float, bool, type(None))):
                    v = str(v)
                if (k in ("data", "cfg", "hyp", "weights", "project")
                        and isinstance(v, str) and os.path.exists(v)):
                    v = os.path.abspath(v)
                snap[k] = v
            yaml.safe_dump(snap, f)
    else:
        save_dir = None  # resolved below: process 0 broadcasts its
        # increment_path result so every process (and the Validator) agrees
        # on the REAL run directory even when exist_ok=False bumped it
    if pc > 1:
        save_dir = broadcast_str("save_dir",
                                 save_dir if is_main else None)

    loggers = None
    if is_main:
        loggers = Loggers(save_dir, use_tb=cfg.use_tb)
        callbacks.auto_register(loggers)
    wb = None
    if cfg.wandb and is_main:
        from desenet_tpu.utils.wandb_logger import WandbLogger

        # -1 -> every epochs//10 epochs, as the reference resolves it
        # (wandb_utils.py:252-253)
        bbox_interval = (cfg.bbox_interval if cfg.bbox_interval > 0 else
                         (cfg.epochs // 10 if cfg.epochs > 10 else 1))
        wb = WandbLogger(project=os.path.basename(cfg.project) or
                         "desenet_tpu", name=cfg.name,
                         config={**vars(cfg), "hyp": hyp},
                         bbox_interval=bbox_interval, entity=cfg.entity,
                         dir=save_dir)
        callbacks.auto_register(wb)

    data_cfg = cfg.data
    if wb is not None and wb.enabled:
        # resolve wandb-artifact:// splits/checkpoints before path checks
        # (reference wandb_utils.py:90-97, 70-81; version via artifact_alias)
        from desenet_tpu.utils.wandb_logger import WANDB_ARTIFACT_PREFIX

        if isinstance(data_cfg, (str, os.PathLike)):
            with open(data_cfg, encoding="utf-8") as f:
                data_cfg = yaml.safe_load(f)
        for k in ("train", "val"):
            if str(data_cfg.get(k, "")).startswith(WANDB_ARTIFACT_PREFIX):
                local = wb.download_dataset_artifact(
                    data_cfg[k], alias=cfg.artifact_alias)
                assert local, f"failed to resolve dataset artifact {data_cfg[k]}"
                data_cfg[k] = local
        for attr in ("resume", "weights"):
            path = getattr(cfg, attr)
            if str(path).startswith(WANDB_ARTIFACT_PREFIX):
                local = wb.download_model_artifact(path)
                assert local, f"failed to resolve model artifact {path}"
                setattr(cfg, attr, local)
    data = check_dataset(data_cfg)
    if wb is not None and wb.enabled and cfg.upload_dataset:
        # dataset artifact (wandb_utils.py:321-345); splits keep local paths
        # for this run, the artifact carries the copies
        wb.log_dataset_artifact(
            {"train": data.get("train"), "val": data.get("val")},
            {i: n for i, n in enumerate(data["de"]["names"])},
            project=cfg.project)
    de_nc = 1 if cfg.single_cls else int(data["de"]["nc"])
    se_nc = int(data["se"]["nc"])
    de_names = (["item"] if cfg.single_cls else list(data["de"]["names"]))

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    # training uses the unfused C3 layout (its backward is ~15% faster than
    # the fused variant; inference loaders auto-migrate checkpoints back to
    # the fused layout); with fused_seg_loss the TRAIN model returns 1/8-res
    # seg logits (the upsample carries no params — the eval model for
    # validation is built with the ordinary full-res head below)
    def _build(seg_upsample: bool, anchors=None):
        return build_model(config_path(cfg.cfg), nc=de_nc, se_nc=se_nc,
                           anchors=anchors, remat=cfg.remat, fused_csp=False,
                           dtype=dtype, seg_upsample=seg_upsample)

    model, spec = _build(not cfg.fused_seg_loss)
    imgsz = check_img_size(cfg.imgsz, s=max(spec.det_strides))

    variables = init_model(model, jax.random.PRNGKey(cfg.seed),
                           img_size=imgsz, batch=1)

    start_epoch = 0
    best_fitness = 0.0
    resumed = None
    if cfg.resume:
        resumed = ckpt.load_checkpoint(cfg.resume)
        LOGGER.info("resuming from %s (epoch %d)", cfg.resume,
                    int(resumed["counters"]["epoch"]))
    elif cfg.weights:
        payload = ckpt.load_checkpoint(cfg.weights)
        src_vars = ckpt.defuse_c3(ckpt.migrate_legacy({
            "params": payload.get("ema_params") or payload["params"],
            "batch_stats": (payload.get("ema_batch_stats")
                            or payload.get("batch_stats") or {}),
        }))
        variables["params"], n = ckpt.intersect_trees(
            src_vars["params"], variables["params"]
        )
        if src_vars["batch_stats"]:
            variables["batch_stats"], _ = ckpt.intersect_trees(
                src_vars["batch_stats"], variables["batch_stats"]
            )
        LOGGER.info("transferred %d tensors from %s", n, cfg.weights)

    # loaders -----------------------------------------------------------
    # stage: loader threads device_put the next batches while the step runs
    # (double-buffered HBM staging; multi-scale runs unstaged host batches)
    _mesh_holder = {}

    def _place(staged):
        """Host batch -> device arrays on the mesh: single-process places
        with shard_batch; multi-process promotes this host's rows to global
        arrays (no cross-host transfer)."""
        mesh = _mesh_holder["mesh"]
        if pc > 1:
            return global_batch_from_local(staged, mesh)
        return shard_batch(staged, mesh)

    def _stage(batch):
        if cfg.multi_scale or "mesh" not in _mesh_holder:
            return batch
        staged = {k: v for k, v in batch.items()
                  if k not in ("paths", "shapes")}
        return {**_place(staged),
                "paths": batch["paths"], "shapes": batch["shapes"]}

    # label-cache zero-first (torch_utils.py:27-36 analog): process 0 scans
    # and writes the *.cache files, the rest wait and load them
    if pc > 1 and not is_main:
        sync_hosts("dataset_cache")
    train_loader, train_ds = create_mixed_dataloader(
        data["train"], img_size=imgsz, batch_size=local_bs, augment=True,
        hyp=hyp, stride=max(spec.det_strides), single_cls=cfg.single_cls,
        workers=cfg.workers, max_targets=cfg.max_targets, seed=cfg.seed,
        stage=_stage, fast_decode=cfg.fast_decode,
        cache_images=cfg.cache_images, rect=cfg.rect, quad=cfg.quad,
        rank=jax.process_index(), world_size=pc,
    )
    val_loader = None
    if is_main:  # validation runs on process 0 only (train.py:319 analog)
        val_loader, val_ds = create_mixed_dataloader(
            data["val"], img_size=imgsz, batch_size=local_bs, augment=False,
            rect=True, pad=0.5, stride=max(spec.det_strides),
            single_cls=cfg.single_cls, workers=cfg.workers,
            max_targets=cfg.max_targets, seed=cfg.seed,
        )
    if pc > 1 and is_main:
        sync_hosts("dataset_cache")
    # every process must run the same number of steps per epoch: the floor
    # over ranks of the per-rank drop_last batch count (ranks may own one
    # extra sample from the strided epoch permutation)
    nb = (len(train_ds) // pc) // local_bs if pc > 1 else len(train_loader)
    class_weights = labels_to_class_weights(train_ds.det_labels, de_nc)
    LOGGER.info("class weights: %s", np.round(class_weights, 3))

    # autoanchor BPR gate (train.py:243-245); model rebuild is cheap — the
    # param shapes don't depend on anchor values
    final_anchors = None
    if not cfg.noautoanchor:
        from desenet_tpu.utils.autoanchor import check_anchors

        det_ls0 = spec.layers[spec.det_layer]
        cur_anchors = np.asarray(det_ls0.args[1], np.float32).reshape(
            len(spec.det_strides), -1, 2
        )
        new_anchors, changed = check_anchors(
            train_ds, cur_anchors, spec.det_strides, thr=hyp["anchor_t"],
            imgsz=imgsz, seed=cfg.seed,
        )
        if changed:
            final_anchors = new_anchors
            model, spec = _build(not cfg.fused_seg_loss, anchors=new_anchors)

    # loss gains scaled like train.py:258-260
    nl = len(spec.det_strides)
    box_gain = hyp["box"] * 3.0 / nl
    cls_gain = hyp["cls"] * de_nc / 80.0 * 3.0 / nl
    obj_gain = hyp["obj"] * (imgsz / 640.0) ** 2 * 3.0 / nl

    det_ls = spec.layers[spec.det_layer]
    head = Detect(nc=de_nc, anchors=det_ls.args[1], strides=spec.det_strides)
    anchors = tuple(
        tuple(tuple(float(v) for v in a) for a in s)
        for s in head.anchors_grid_units()
    )
    det_loss = DetectionLoss(
        anchors=anchors, nc=de_nc, box_gain=box_gain, obj_gain=obj_gain,
        cls_gain=cls_gain, cls_pw=hyp["cls_pw"], obj_pw=hyp["obj_pw"],
        label_smoothing=cfg.label_smoothing, fl_gamma=hyp["fl_gamma"],
        anchor_t=hyp["anchor_t"],
    )

    opt_cfg = OptimConfig(
        optimizer="adam" if cfg.adam else "sgd",
        lr0=hyp["lr0"], momentum=hyp["momentum"],
        weight_decay=hyp["weight_decay"],
        warmup_bias_lr=hyp["warmup_bias_lr"],
        warmup_momentum=hyp["warmup_momentum"],
    )
    lf = (linear_lr(hyp["lrf"], cfg.epochs) if cfg.linear_lr
          else one_cycle(1.0, hyp["lrf"], cfg.epochs))
    warmup_iters = max(round(hyp["warmup_epochs"] * nb), cfg.warmup_floor)

    n_avail = len(jax.devices()) if cfg.n_devices is None else cfg.n_devices
    # --quad collate emits batch_size//4 images per batch (collate_quad);
    # device count must divide the EFFECTIVE per-batch image count
    eff_bs = cfg.batch_size // 4 if cfg.quad else cfg.batch_size
    if pc > 1:
        # multi-process SPMD must span every process's devices — a partial
        # mesh would leave some processes without addressable shards
        n_avail = len(jax.devices())
        if eff_bs % n_avail:
            raise ValueError(
                f"multi-process: global batch of {eff_bs} images must be "
                f"divisible by the {n_avail} global devices")
    sp = max(cfg.spatial, 1)
    if n_avail % sp:
        raise ValueError(
            f"--spatial {sp} must divide the device count ({n_avail})")
    dp_avail = n_avail // sp
    n_dp = next(d for d in range(min(dp_avail, eff_bs), 0, -1)
                if eff_bs % d == 0)
    n_dev = n_dp * sp
    if n_dev != n_avail:
        LOGGER.info("using %d of %d devices (batch %d divisibility)", n_dev,
                    n_avail, eff_bs)
    mesh = make_mesh(n_dev, spatial=sp)
    if sp > 1:
        smax = max(spec.det_strides)
        # multi-scale floors at the 0.5x stride-rounded bucket
        min_sz = ((imgsz // 2) // smax * smax) if cfg.multi_scale else imgsz
        check_spatial(mesh, min_sz, max_stride=smax)
        LOGGER.info("mesh: %d-way data x %d-way spatial", n_dp, sp)
    _mesh_holder["mesh"] = mesh

    state = create_train_state(variables, opt_cfg)
    if resumed is not None:
        state = state.replace(
            params=resumed["params"], batch_stats=resumed["batch_stats"],
            opt_state=resumed["opt_state"], accum_grads=resumed["accum_grads"],
            ema_params=resumed["ema_params"],
            ema_batch_stats=resumed["ema_batch_stats"],
            ema_updates=jnp.asarray(resumed["counters"]["ema_updates"]),
            step=jnp.asarray(resumed["counters"]["step"]),
            last_opt_step=jnp.asarray(resumed["counters"]["last_opt_step"]),
        )
        start_epoch = int(resumed["counters"]["epoch"]) + 1
        best_fitness = float(resumed["counters"]["best_fitness"])
    state = replicate_tree(state, mesh)

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    step_fn = make_train_step(
        model, det_loss, opt_cfg, lf, nb=nb, warmup_iters=warmup_iters,
        nominal_bs=cfg.nbs, batch_size=cfg.batch_size, det_gain=cfg.det_gain,
        seg_gain=cfg.seg_gain, freeze=cfg.freeze, n_params=n_params,
        fused_seg=cfg.fused_seg_loss,
    )

    # validation needs full-res seg logits (mIoU argmax at label
    # resolution); with the fused train loss the train model returns 1/8-res
    # — build the eval twin (identical param tree: the upsample is a
    # parameter-free matrix contraction)
    eval_model = (model if not cfg.fused_seg_loss
                  else _build(True, anchors=final_anchors)[0])
    validator = Validator(
        eval_model, nc=de_nc, se_nc=se_nc, single_cls=cfg.single_cls,
        save_dir=save_dir, names={i: n for i, n in enumerate(de_names)},
    )
    stopper = EarlyStopping(patience=cfg.patience)
    meta = {
        "cfg": cfg.cfg, "imgsz": imgsz, "de_nc": de_nc, "se_nc": se_nc,
        "de_names": de_names, "se_names": list(data["se"]["names"]),
        "hyp": hyp,
    }

    callbacks.run("on_train_start")
    if is_main:
        LOGGER.info(
            "training %s on %s for %d epochs (%d batches/epoch, %d devices"
            "%s)", cfg.cfg, cfg.data, cfg.epochs, nb, n_dev,
            f", {pc} processes" if pc > 1 else "",
        )
    t_start = time.time()
    final_results = {}
    # Multi-process: the first train-step execution opens the gloo (CPU) /
    # ICI communicator with a short rendezvous window — all processes must
    # arrive within it. Compile times can skew arbitrarily (cold vs warm
    # persistent cache), so each process AOT-compiles the step FIRST and
    # then waits at a KV-store barrier (generous timeout, no device
    # involvement) before the first execution.
    compile_synced = pc <= 1
    rng = jax.random.PRNGKey(cfg.seed + 1)
    ms_rng = np.random.default_rng(cfg.seed + 7)
    stride_max = max(spec.det_strides)
    for epoch in range(start_epoch, cfg.epochs):
        callbacks.run("on_train_epoch_start")
        train_loader.set_epoch(epoch)
        if cfg.image_weights:
            from desenet_tpu.utils.general import labels_to_image_weights

            iw = labels_to_image_weights(train_ds.det_labels, de_nc,
                                         class_weights)
            train_ds.resample(iw + 1e-9, ms_rng)
        # Per-batch device scalars buffered without syncing; reduced in a
        # single stacked op at log ticks so mloss is a true running mean
        # over ALL batches (reference updates mloss every batch) while the
        # loop stays free of per-batch host round-trips.
        loss_hist = []
        mloss_sum = np.zeros(4, np.float64)
        mloss_n = 0
        mloss = np.zeros(4, np.float64)  # box, obj, cls, seg running means
        t_ep = time.time()
        for i, batch in enumerate(train_loader):
            if i >= nb:  # ranks may own one spare batch (multi-process)
                break
            batch.pop("paths", None)
            batch.pop("shapes", None)
            already_staged = not isinstance(batch["image"], np.ndarray)
            if cfg.multi_scale:
                # random 0.5-1.5x size, stride-multiple buckets, ASPECT-
                # PRESERVING per-dim scale like the reference (train.py:
                # 343-348: sf = sz/max(shape), ns = ceil(dim*sf/gs)*gs);
                # one jit specialization per bucket
                sz = (int(ms_rng.uniform(0.5, 1.5) * imgsz) // stride_max
                      ) * stride_max
                h, w = batch["image"].shape[1:3]
                sf = sz / max(h, w)
                nh = int(math.ceil(h * sf / stride_max) * stride_max)
                nw = int(math.ceil(w * sf / stride_max) * stride_max)
                if (nh, nw) != (h, w):
                    import cv2 as _cv2

                    batch["image"] = np.stack([
                        _cv2.resize(im, (nw, nh),
                                    interpolation=_cv2.INTER_LINEAR)
                        for im in batch["image"]
                    ])
                    batch["seg_labels"] = np.stack([
                        _cv2.resize(m.astype(np.uint8), (nw, nh),
                                    interpolation=_cv2.INTER_NEAREST)
                        for m in batch["seg_labels"]
                    ])
            if not already_staged:
                batch = _place(batch)
            rng, step_rng = jax.random.split(rng)
            if not compile_synced:
                # lowering+compiling does not execute (and so does not
                # donate `state`); the subsequent call hits the persistent
                # compile cache, leaving only trace-time skew (~seconds)
                # between processes at the collective rendezvous
                step_fn.lower(state, batch, step_rng).compile()
                sync_hosts("train_step_compiled")
                compile_synced = True
            state, metrics = step_fn(state, batch, step_rng)
            loss_hist.append((metrics["lbox"], metrics["lobj"],
                              metrics["lcls"], metrics["lseg"]))
            if (i + 1) % max(nb // 4, 1) == 0 or i == nb - 1:
                # fold only the new per-batch device scalars into a running
                # host-side (sum, n) — O(tick) work and O(1) live buffers
                # instead of restacking the whole epoch history
                flat = jnp.stack([s for v in loss_hist for s in v])
                mloss_sum += np.asarray(
                    flat.reshape(len(loss_hist), 4), np.float64).sum(axis=0)
                mloss_n += len(loss_hist)
                loss_hist.clear()
                mloss = mloss_sum / max(mloss_n, 1)
                if is_main:
                    LOGGER.info(
                        "epoch %d/%d batch %d/%d  box %.4f obj %.4f "
                        "cls %.4f seg %.4f  lr %.5f",
                        epoch, cfg.epochs - 1, i + 1, nb, *mloss,
                        float(metrics["lr"]),
                    )
            callbacks.run("on_train_batch_end")
        callbacks.run("on_train_epoch_end")

        # validation with EMA weights (train.py:396-416); multi-process:
        # process 0 pulls the (fully-replicated) EMA tree to host and
        # validates on its local device, then broadcasts the fitness so
        # every process takes the same best-ckpt/early-stop decisions (the
        # reference left this DDP broadcast commented out, train.py:450-458)
        results = dict(mp=0.0, mr=0.0, map50=0.0, map=0.0, miou=0.0,
                       pix_acc=0.0)
        if is_main and (not cfg.noval or epoch == cfg.epochs - 1):
            ema_vars = {
                "params": state.ema_params,
                "batch_stats": state.ema_batch_stats,
            }
            if pc > 1:  # detach from the global mesh -> local single-device
                ema_vars = jax.device_get(ema_vars)  # batched async pull
            callbacks.run("on_val_start")
            results = validator.run(ema_vars, val_loader)
            callbacks.run("on_val_end")

        fi = float(fitness_det_seg(
            np.asarray([[results["mp"], results["mr"], results["map50"],
                         results["map"]]]),
            results["miou"],
        )[0])
        if pc > 1:
            from jax.experimental import multihost_utils

            fi = float(multihost_utils.broadcast_one_to_all(
                np.asarray(fi, np.float32)))
        row = {
            "epoch": epoch,  # logger hooks are registered on process 0 only
            "train/box_loss": mloss[0], "train/obj_loss": mloss[1],
            "train/cls_loss": mloss[2], "train/seg_loss": mloss[3],
            "metrics/precision": results["mp"],
            "metrics/recall": results["mr"],
            "metrics/mAP_0.5": results["map50"],
            "metrics/mAP_0.5:0.95": results["map"],
            "metrics/mIoU": results["miou"],
            "metrics/pixAcc": results["pix_acc"],
            "val/fitness": fi,
            "x/lr": float(opt_cfg.lr0 * lf(epoch)),
        }
        callbacks.run("on_fit_epoch_end", row)
        if is_main:
            mem = ""
            try:  # device memory in the epoch line (train.py:382 analog)
                ms = jax.local_devices()[0].memory_stats()
                if ms and "bytes_in_use" in ms:
                    mem = f"  mem {ms['bytes_in_use'] / 2**30:.1f}G"
            except Exception:
                pass
            LOGGER.info(
                "epoch %d done in %.1fs  mAP50 %.4f mAP %.4f mIoU %.4f "
                "fitness %.4f%s", epoch, time.time() - t_ep,
                results["map50"], results["map"], results["miou"], fi, mem,
            )

        if fi > best_fitness:
            best_fitness = fi
        if not cfg.nosave and is_main:
            ckpt.save_checkpoint(os.path.join(save_dir, "last"), state, epoch,
                                 best_fitness, meta)
            if best_fitness == fi:
                ckpt.save_checkpoint(os.path.join(save_dir, "best"), state,
                                     epoch, best_fitness, meta)
            if cfg.save_period > 0 and epoch % cfg.save_period == 0:
                ckpt.save_checkpoint(
                    os.path.join(save_dir, f"epoch{epoch}"), state, epoch,
                    best_fitness, meta,
                )
            callbacks.run("on_model_save")
            if wb is not None and wb.enabled:
                wb.log_model(os.path.join(save_dir, "last"), epoch, fi,
                             best_model=best_fitness == fi,
                             total_epochs=cfg.epochs)
        if pc > 1:
            # checkpoint-boundary barrier: no process starts the next epoch
            # (or exits) while process 0 is still writing artifacts
            sync_hosts(f"ckpt_epoch_{epoch}")
        final_results = results
        if stopper(epoch, fi):
            break

    if is_main:
        LOGGER.info("training finished in %.1f min; best fitness %.4f",
                    (time.time() - t_start) / 60, best_fitness)
    if not cfg.nosave and is_main:
        # finalize: inference-only (EMA-promoted, no optimizer) checkpoint —
        # strip_optimizer analog (general.py:753-766, train.py:462-469)
        try:
            ckpt.strip_checkpoint(os.path.join(save_dir, "best"),
                                  os.path.join(save_dir, "best_stripped"))
        except Exception as e:  # noqa: BLE001 — finalization is best-effort
            LOGGER.warning("strip failed: %s", e)
    callbacks.run("on_train_end")
    callbacks.run("teardown")
    if pc > 1:
        sync_hosts("train_end")  # workers wait for process 0's finalization
    return {"save_dir": save_dir, "best_fitness": best_fitness,
            **final_results}
