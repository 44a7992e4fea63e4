"""Device mesh + sharding helpers — the framework's entire "distributed
backend".

Replaces the reference's NCCL/DDP machinery (train.py:555-561, DDP wrap at
:254-255, loss x WORLD_SIZE at :356-358, DistributedSampler, SyncBN opt-in)
with the SPMD recipe: one mesh with a 'data' axis, batch arrays sharded over
it, parameters replicated, and XLA inserting the gradient all-reduces over
ICI from the sharding annotations. BatchNorm statistics are computed over the
global (sharded) batch inside jit, so cross-replica SyncBN semantics hold by
construction — stronger than the reference's opt-in --sync-bn.

Multi-host: call jax.distributed.initialize() before make_mesh() and feed
per-host shards via jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch dict with its leading dim on 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def pad_batch_for_mesh(batch, mesh: Mesh):
    """Pad a (possibly uneven) final batch up to a multiple of the mesh's
    data-axis size by repeating the last element; returns (padded_batch,
    n_valid). The reference sidesteps this with drop_last on train loaders
    (mixed_datasets.py:106-117) and single-device val; here multi-device
    eval over an arbitrary dataset length stays static-shaped — consumers
    mask reductions with n_valid.
    """
    n_dev = mesh.devices.size
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % n_dev
    if pad == 0:
        return batch, n

    def _pad(x):
        reps = np.repeat(np.asarray(x)[-1:], pad, axis=0)
        return np.concatenate([np.asarray(x), reps], axis=0)

    return jax.tree.map(_pad, batch), n


def replicate_tree(tree, mesh: Mesh):
    r = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
