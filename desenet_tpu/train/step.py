"""The jitted joint train step.

One XLA program covering: forward (train mode, BN batch stats over the global
sharded batch == SyncBN semantics for free), combined multi-task loss
(det_gain * ComputeLoss * bs + seg_gain * CE — single backward, replacing the
reference's dual backward with retain_graph, train.py:362-367), gradient
accumulation with the warmup-interpolated `accumulate` trigger
(train.py:146-147, 332-340, 370-376), 3-group SGD/Adam update, and EMA.

The loss-scale convention follows the single-process reference exactly; under
data parallelism the global-batch formulation makes gradients identical to
the reference's loss*WORLD_SIZE + DDP-mean pattern (SURVEY §2.9). One quirk
NOT replicated: with W GPUs the reference effectively multiplies the seg loss
by W (train.py:356-358 applies *WORLD_SIZE to a batch-size-independent mean);
we keep seg_gain * mean regardless of device count. Set seg_gain=W to
reproduce it.
"""

from __future__ import annotations

import functools
import os
import re
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from desenet_tpu.losses import DetectionLoss, segmentation_loss
from desenet_tpu.ops.seg_ce import upsampled_ce
from desenet_tpu.train import optim as O
from desenet_tpu.train.ema import ema_update
from desenet_tpu.train.schedule import warmup_interp
from desenet_tpu.train.state import TrainState


def make_train_step(
    model,
    det_loss_fn: DetectionLoss,
    opt_cfg: O.OptimConfig,
    lf: Callable,  # epoch -> lr scale (one_cycle / linear)
    nb: int,  # batches per epoch
    warmup_iters: int,  # nw = max(3 epochs * nb, 1000) (train.py:287)
    nominal_bs: int = 64,
    batch_size: int = 16,
    det_gain: float = 0.14,
    seg_gain: float = 1.0,
    seg_aux_weight: float = 0.1,
    ema_base: float = 0.9999,
    ema_tau: float = 2000.0,
    donate: bool = True,
    remat_convs: bool = False,
    freeze: int = 0,
    compiler_options="auto",  # "auto" = latency-hiding sched on TPU;
    # None for callers that NEST the step inside another jit (jax rejects
    # compiler_options on non-top-level jits, e.g. probe scan chains)
    n_params: Optional[int] = None,  # model parameter count; gates the
    # "auto" latency-hiding scheduler (measured win ONLY for the s-scale
    # model at b128; REGRESSION at m/b128 and s/b64 — PERF.md rounds 3-4)
    fused_seg: bool = False,  # caller hint: the model returns 1/8-res seg
    # logits and the step runs the fused tiled upsample+CE (engine default).
    # On THAT program the latency-hiding scheduler wins at every measured
    # scale/batch (s/b64 +30%, s/b128 record, l/b64 +23%, m/b128 neutral —
    # PERF.md round 5: the loss scan serializes the default schedule; LHS
    # restores the overlap), so "auto" enables it unconditionally.
    _force_select_path: bool = False,  # test hook: disable the always-step
    # specialization to compare it bit-for-bit against the general path
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with
      image      (B, H, W, 3) float in [0,1] or uint8
      det_targets(B, M, 5), det_mask (B, M)
      seg_labels (B, H, W) integer class ids — uint8 from the production
                 collate (widened to int32 on-device), int32 accepted
    """
    accum_target = nominal_bs / batch_size

    def _frozen(key: str) -> bool:
        # params are keyed l{i} (or l{i}s{j} for n>1 repeats); freeze the
        # first `freeze` layers like the reference's requires_grad=False
        # loop (train.py:137-143, `model.{x}.` prefixes)
        m = re.match(r"l(\d+)(?:s\d+)?$", key)
        return m is not None and int(m.group(1)) < freeze

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        ni = state.step
        imgs = batch["image"]
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(model.dtype) / 255.0
        else:
            imgs = imgs.astype(model.dtype)

        def fwd(params, x):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            det_feats, seg_out = out
            return det_feats, seg_out, mut["batch_stats"]

        if remat_convs:
            # Save ONLY conv outputs (tagged via checkpoint_name in
            # layers.py); the backward recomputes the cheap BN/SiLU
            # elementwise chains instead of materializing them in the
            # forward.
            fwd = jax.checkpoint(
                fwd,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"),
            )

        def loss_fn(params):
            det_feats, seg_out, new_bs = fwd(params, imgs)
            det_total, comps = det_loss_fn(
                det_feats, batch["det_targets"], batch["det_mask"]
            )
            # masks arrive uint8 (collate keeps them narrow: 4x less host
            # memcpy + host->device traffic at b128/640); widen on-device
            seg_lab = batch["seg_labels"].astype(jnp.int32)
            if (not isinstance(seg_out, (list, tuple))
                    and seg_out.shape[1:3] != seg_lab.shape[1:3]):
                # model built with seg_upsample=False: the head returned
                # 1/8-res logits — compute the reference objective (CE vs
                # the 8x align_corners=True upsample, yolo.py:170-183 +
                # loss.py:242-243) with the tiled fused kernel instead of
                # materializing the (B, H, W, C) map + its cotangent
                seg_l = upsampled_ce(seg_out, seg_lab, seg_lab.shape[1:3],
                                     align_corners=True)
            else:
                seg_l = segmentation_loss(seg_out, seg_lab,
                                          aux_weight=seg_aux_weight)
            total = det_gain * det_total + seg_gain * seg_l
            return total, (comps, seg_l, new_bs)

        (loss, (comps, seg_l, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if freeze > 0:
            grads = {
                k: (jax.tree.map(jnp.zeros_like, v) if _frozen(k) else v)
                for k, v in grads.items()
            }

        # Static specialization: with batch_size >= nominal_bs the reference
        # formula accumulate = round(interp(ni, [0,nw], [1, nbs/bs])) is 1 at
        # every step (train.py:146-147, 334), so the accumulation buffer and
        # the step/skip selects over the whole state tree are statically dead
        # — dropping them removes ~0.5 GB of HBM traffic per step (the accum
        # add + 4 full-tree selects) with bit-identical semantics.
        always_step = accum_target <= 1.0 and not _force_select_path

        if always_step:
            accum = grads
        else:
            accum = jax.tree.map(lambda a, g: a + g.astype(a.dtype),
                                 state.accum_grads, grads)

        # warmup-interpolated accumulation count (train.py:334)
        accumulate = jnp.maximum(
            jnp.round(warmup_interp(ni.astype(jnp.float32),
                                    float(warmup_iters), 1.0, accum_target)),
            1.0,
        ).astype(jnp.int32)
        do_step = (True if always_step
                   else (ni - state.last_opt_step) >= accumulate)

        epoch = (ni // nb).astype(jnp.float32)
        lr_scale = lf(epoch)
        warmup_t = jnp.clip(
            ni.astype(jnp.float32) / max(float(warmup_iters), 1.0), 0.0, 1.0
        )

        # Arithmetic select instead of lax.cond: a conditional over the whole
        # state tree copies every buffer through the branch boundary and
        # blocks fusion (~20 ms/step measured on v5e); the optimizer math is
        # ~1 ms of elementwise work, so compute it always and select.
        new_params, new_opt = O.apply_updates(
            state.params, accum, state.opt_state, state.groups, opt_cfg,
            lr_scale, warmup_t,
        )
        if freeze > 0:
            # zeroed grads alone are not enough: the decay group's weight-
            # decay term would still move frozen params — pin them
            new_params = {
                k: (state.params[k] if _frozen(k) else v)
                for k, v in new_params.items()
            }
        updates = state.ema_updates + 1
        ema_p = ema_update(state.ema_params, new_params, updates,
                           ema_base, ema_tau)
        ema_b = ema_update(state.ema_batch_stats, new_bs, updates,
                           ema_base, ema_tau)

        if always_step:
            params, opt_state = new_params, new_opt
            accum_out = state.accum_grads  # stays all-zero, never read
            ema_updates, last_opt = updates, ni
        else:
            def sel(on_step, on_skip):
                return jax.tree.map(
                    lambda a, b: jnp.where(do_step, a, b), on_step, on_skip)

            params = sel(new_params, state.params)
            opt_state = sel(new_opt, state.opt_state)
            accum_out = sel(jax.tree.map(jnp.zeros_like, accum), accum)
            ema_p = sel(ema_p, state.ema_params)
            ema_b = sel(ema_b, state.ema_batch_stats)
            ema_updates = sel(updates, state.ema_updates)
            last_opt = sel(ni, state.last_opt_step)

        new_state = state.replace(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            accum_grads=accum_out,
            ema_params=ema_p,
            ema_batch_stats=ema_b,
            ema_updates=ema_updates,
            step=ni + 1,
            last_opt_step=last_opt,
        )
        metrics = {
            "loss": loss,
            "lbox": comps[0],
            "lobj": comps[1],
            "lcls": comps[2],
            "lseg": seg_l,
            "lr": opt_cfg.lr0 * lr_scale * warmup_t,
            "stepped": (jnp.int32(1) if always_step
                        else do_step.astype(jnp.int32)),
        }
        return new_state, metrics

    # TPU: the latency-hiding scheduler reorders the step's HLO so copies/
    # loads overlap compute — measured +11% on the b128 production step
    # (539 -> 593-605 img/s, two runs; PERF.md round 3). Off-TPU or on
    # backends that reject the option, fall back to default scheduling.
    # DESENET_NO_LHS=1 disables (escape hatch).
    kw = {}
    if compiler_options == "auto":
        # Measured per-shape AND per-scale on v5e (PERF.md rounds 3-4):
        # +11% at s/b128/640 (539 -> 593-605 img/s), -6% at s/b64/640
        # (452 -> 425), -5% at m/b128/640 (289 -> 275) — the scheduler's
        # prefetch aggressiveness pays off only in the s-model's
        # bandwidth-bound regime at the large batch. Auto-enable needs BOTH
        # the batch and a small-model hint (n_params from the caller;
        # unknown -> off, the safe default). Override explicitly
        # (compiler_options={...}/None) or via DESENET_NO_LHS.
        lhs = (fused_seg  # fused-CE program: measured win/neutral everywhere
               or (batch_size >= 128  # materialized-loss legacy gate
                   and n_params is not None and n_params < 15_000_000))
        if (jax.default_backend() == "tpu" and lhs
                and not os.environ.get("DESENET_NO_LHS")):
            kw["compiler_options"] = {
                "xla_tpu_enable_latency_hiding_scheduler": "true"}
    elif compiler_options:
        kw["compiler_options"] = dict(compiler_options)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (), **kw)
