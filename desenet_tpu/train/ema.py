"""Model EMA — reference ModelEMA semantics (torch_utils.py:304-342):

decay(updates) = base * (1 - exp(-updates / tau)),  base=0.9999, tau=2000
ema <- d * ema + (1 - d) * value

The reference EMAs the *full* fp32 state_dict including BN running stats
(torch_utils.py:327-338); here that means both params and batch_stats trees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(updates, base: float = 0.9999, tau: float = 2000.0):
    return base * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_tree, new_tree, updates, base: float = 0.9999,
               tau: float = 2000.0):
    """One EMA step (call after each optimizer step, with post-step values)."""
    d = ema_decay(updates, base, tau)
    return jax.tree.map(
        lambda e, v: d * e + (1.0 - d) * v.astype(e.dtype), ema_tree, new_tree
    )
