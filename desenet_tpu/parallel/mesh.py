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

Spatial partitioning (the conv-net analog of tensor parallelism): pass
``spatial=k`` to :func:`make_mesh` to get a 2D ``(data, spatial)`` mesh and
:func:`shard_batch` additionally splits the image/label HEIGHT dim over the
spatial axis. The jitted step is unchanged — GSPMD propagates the input
shardings through every conv and inserts the halo exchanges (and the
cross-shard BN reductions) over ICI. Use when per-device batch would drop
below 1 (huge images / many chips), i.e. when pure DP runs out of batch.

Validity constraint (:func:`check_spatial`): every sharded feature map must
keep >= 2 rows per shard — at exactly 1 row the 3x3 halo equals the shard
and GSPMD's conv backward mis-accumulates (measured on the CPU backend:
rel grad error up to 3x at H=2/spatial=2; exact at H=4/spatial=2). Deeper
pathologies (select_and_scatter) are avoided structurally: max_pool_same
ships a shifted-compare VJP (ops/resize.py) because GSPMD miscompiles
spatially-sharded select_and_scatter at ANY shard size.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"

# batch keys whose dim-1 is image height, shardable over SPATIAL_AXIS
_SPATIAL_KEYS = ("image", "seg_labels")


def make_mesh(n_devices: Optional[int] = None, devices=None,
              spatial: int = 1) -> Mesh:
    """1D ('data',) mesh, or — with spatial>1 — a 2D ('data','spatial') mesh
    of n_devices//spatial × spatial devices. Adjacent device ids land on the
    spatial axis so halo exchanges ride nearest-neighbor ICI links."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if spatial <= 1:
        return Mesh(np.asarray(devs), (DATA_AXIS,))
    if len(devs) % spatial:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"spatial={spatial}")
    grid = np.asarray(devs).reshape(len(devs) // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def check_spatial(mesh: Mesh, img_size: int, max_stride: int = 32) -> None:
    """Raise if a spatially-partitioned run would shard the deepest feature
    map below 2 rows per device (the GSPMD conv-backward validity floor —
    see module docstring)."""
    if SPATIAL_AXIS not in mesh.axis_names:
        return
    sp = mesh.shape[SPATIAL_AXIS]
    deepest = img_size // max_stride
    if deepest // sp < 2:
        raise ValueError(
            f"spatial={sp} shards the deepest feature map "
            f"({img_size}px / stride {max_stride} = {deepest} rows) below "
            f"2 rows per device; use img_size >= {2 * sp * max_stride} or "
            f"spatial <= {max(deepest // 2, 1)}"
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, height, ...) sharding: batch over 'data', height over
    'spatial'. Falls back to batch-only on a 1D mesh."""
    if SPATIAL_AXIS not in mesh.axis_names:
        return batch_sharding(mesh)
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch dict with its leading dim on 'data';
    on a ('data','spatial') mesh, image/seg_labels additionally split their
    height dim over 'spatial'."""
    s = batch_sharding(mesh)
    sp = spatial_sharding(mesh)

    def place(key, x):
        use_sp = key in _SPATIAL_KEYS and np.ndim(x) >= 3
        return jax.device_put(x, sp if use_sp else s)

    if isinstance(batch, dict):
        return {k: jax.tree.map(lambda x, k=k: place(k, x), v)
                for k, v in batch.items()}
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def pad_batch_for_mesh(batch, mesh: Mesh):
    """Pad a (possibly uneven) final batch up to a multiple of the mesh's
    data-axis size by repeating the last element; returns (padded_batch,
    n_valid). The reference sidesteps this with drop_last on train loaders
    (mixed_datasets.py:106-117) and single-device val; here multi-device
    eval over an arbitrary dataset length stays static-shaped — consumers
    mask reductions with n_valid.
    """
    n_dev = mesh.shape[DATA_AXIS]
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
