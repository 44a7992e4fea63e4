"""Optimizer with torch-exact semantics for the reference recipe.

The reference builds 3 param groups (train.py:151-168):
  g0: BatchNorm weights (gamma)        — no weight decay
  g1: conv/linear weights              — weight decay
  g2: biases (incl. BN beta)           — no weight decay, special warmup LR

and uses SGD(nesterov, momentum) or Adam(betas=(momentum, 0.999)). During
warmup (first max(3 epochs, 1000) integrated batches, train.py:332-340) the
bias group LR ramps 0.1 -> lr, other groups 0 -> lr, and SGD momentum ramps
0.8 -> momentum.

Hand-rolled as pure pytree math (rather than optax) because lr AND momentum
are per-step traced values and weight decay must enter the momentum buffer
exactly like torch.optim.SGD (grad += wd * p before momentum; nesterov update
g + mu * buf).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

PyTree = Any

# param-group tags
BN_WEIGHT, WEIGHT, BIAS = 0, 1, 2


def group_label(path) -> int:
    """Classify a flattened param path like the reference's .bias/.weight split.

    flax leaf names: BN gamma='scale', BN beta / conv bias='bias',
    conv/linear weight='kernel'.
    """
    leaf = path[-1]
    if leaf == "scale":
        return BN_WEIGHT
    if leaf == "bias":
        return BIAS
    return WEIGHT


def build_group_tree(params: PyTree) -> PyTree:
    """Pytree of int group tags matching params' structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def tag(path):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return group_label(names)

    tags = [tag(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, tags)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "sgd"  # 'sgd' | 'adam'
    lr0: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    nesterov: bool = True
    warmup_bias_lr: float = 0.1
    warmup_momentum: float = 0.8
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8


def init_opt_state(params: PyTree, cfg: OptimConfig) -> Dict[str, PyTree]:
    zeros = jax.tree.map(jnp.zeros_like, params)
    state = {"mu": zeros}
    if cfg.optimizer == "adam":
        state["nu"] = jax.tree.map(jnp.zeros_like, params)
        state["count"] = jnp.zeros((), jnp.int32)
    return state


def apply_updates(
    params: PyTree,
    grads: PyTree,
    opt_state: Dict[str, PyTree],
    groups: PyTree,
    cfg: OptimConfig,
    lr_scale,  # scalar: lf(epoch) cosine factor
    warmup_t,  # scalar in [0,1]: warmup progress (1 after warmup)
):
    """One optimizer step. Returns (new_params, new_opt_state).

    Per-group LR: bias group ramps warmup_bias_lr -> lr0*lr_scale; others ramp
    0 -> lr0*lr_scale. Momentum ramps warmup_momentum -> momentum.
    """
    lr_main = cfg.lr0 * lr_scale
    lr_bias_w = cfg.warmup_bias_lr + (lr_main - cfg.warmup_bias_lr) * warmup_t
    lr_other_w = lr_main * warmup_t
    mom = cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * warmup_t

    if cfg.optimizer == "sgd":

        def upd(p, g, buf, tag):
            g = g.astype(jnp.float32)
            g = jnp.where(tag == WEIGHT, g + cfg.weight_decay * p, g)
            buf_new = mom * buf + g
            d = g + mom * buf_new if cfg.nesterov else buf_new
            lr = jnp.where(tag == BIAS, lr_bias_w, lr_other_w)
            return p - lr * d, buf_new

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_b = treedef.flatten_up_to(opt_state["mu"])
        flat_t = treedef.flatten_up_to(groups)
        out = [upd(p, g, b, t) for p, g, b, t in zip(flat_p, flat_g, flat_b, flat_t)]
        new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        new_b = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        return new_p, {"mu": new_b}

    # Adam (train.py:160-162: betas=(momentum, 0.999)); torch Adam applies
    # wd as grad += wd*p (non-decoupled)
    count = opt_state["count"] + 1
    b1, b2 = cfg.momentum, cfg.adam_beta2
    bc1 = 1 - b1 ** count.astype(jnp.float32)
    bc2 = 1 - b2 ** count.astype(jnp.float32)

    def upd_adam(p, g, m, v, tag):
        g = g.astype(jnp.float32)
        g = jnp.where(tag == WEIGHT, g + cfg.weight_decay * p, g)
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        step = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.adam_eps)
        lr = jnp.where(tag == BIAS, lr_bias_w, lr_other_w)
        return p - lr * step, m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state["mu"])
    flat_v = treedef.flatten_up_to(opt_state["nu"])
    flat_t = treedef.flatten_up_to(groups)
    out = [
        upd_adam(p, g, m, v, t)
        for p, g, m, v, t in zip(flat_p, flat_g, flat_m, flat_v, flat_t)
    ]
    new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
    return new_p, {"mu": new_m, "nu": new_v, "count": count}
