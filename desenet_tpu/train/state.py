"""Training state pytree and constructor."""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp

from desenet_tpu.train import optim as O

PyTree = Any


@flax.struct.dataclass
class TrainState:
    params: PyTree
    batch_stats: PyTree
    opt_state: Dict[str, PyTree]
    accum_grads: PyTree
    ema_params: PyTree
    ema_batch_stats: PyTree
    ema_updates: jax.Array  # int32 — optimizer steps taken (EMA decay input)
    step: jax.Array  # int32 — integrated batches ni (train.py:330)
    last_opt_step: jax.Array  # int32 — for the accumulation trigger
    groups: PyTree = None  # int group tags, same structure as params


def create_train_state(variables, opt_cfg: O.OptimConfig) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    groups = O.build_group_tree(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=O.init_opt_state(params, opt_cfg),
        accum_grads=jax.tree.map(jnp.zeros_like, params),
        # EMA starts as a *copy* — astype would alias fp32 buffers and break
        # buffer donation in the jitted step
        ema_params=jax.tree.map(
            lambda x: jnp.array(x, dtype=jnp.float32, copy=True), params
        ),
        ema_batch_stats=jax.tree.map(
            lambda x: jnp.array(x, dtype=jnp.float32, copy=True), batch_stats
        ),
        ema_updates=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        last_opt_step=-jnp.ones((), jnp.int32),
        groups=groups,
    )
