"""Multi-host (multi-process) SPMD glue.

Replaces the reference's torchrun multi-node path — dist.init_process_group
with the nccl/gloo backend, RANK/WORLD_SIZE env plumbing and the
DistributedSampler per-rank data split (/root/reference/scripts/train.py:60-62,
555-561) — with the JAX multi-controller recipe:

  1. every process calls :func:`init_multihost` (jax.distributed.initialize)
     before touching any backend;
  2. a global :class:`~jax.sharding.Mesh` is built over ``jax.devices()``
     (all hosts' devices — the ICI/DCN fabric on real pods);
  3. each host loads only its slice of the global batch
     (:func:`local_batch_slice`, the DistributedSampler analog) and promotes
     it to a global sharded array with
     :func:`global_batch_from_local` (jax.make_array_from_process_local_data);
  4. the ordinary jitted train step runs unchanged — XLA inserts the
     cross-host collectives from the sharding annotations.

On CPU the same code path is exercised with gloo collectives and
``jax_num_cpu_devices`` virtual devices per process, which is how
``tests/test_multihost.py`` proves step-parity between a 2-process run and a
single-process run on the identical global batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from desenet_tpu.parallel.mesh import DATA_AXIS, batch_sharding

__all__ = [
    "init_multihost",
    "local_batch_slice",
    "global_batch_from_local",
    "sync_hosts",
    "broadcast_str",
]


def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    *,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for this process.

    Must run before any JAX backend is touched (device queries, jit, ...).
    On TPU pods the three arguments normally come from the scheduler
    environment and ``jax.distributed.initialize()`` could auto-detect them;
    they are explicit here so the CPU test path and single-binary launches
    (the torchrun analog) share one entry point.

    ``cpu_devices_per_process``: when set, force the CPU platform with that
    many virtual devices and gloo cross-process collectives — the
    multi-host simulation used by the test-suite. Leave ``None`` on real
    TPU hardware.
    """
    if cpu_devices_per_process is not None:
        # Force through jax.config, not os.environ: the container may have
        # registered a TPU plugin at interpreter startup (sitecustomize),
        # after which env vars are no longer consulted.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        cluster_detection_method="deactivate",
    )


def local_batch_slice(
    global_batch_size: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """Rows of the global batch this host is responsible for loading.

    The DistributedSampler analog (reference train.py:60-62 RANK plumbing):
    a contiguous, equal split of the leading axis. The global batch size
    must divide evenly — the data loader pads the final batch to a fixed
    shape before this point (fixed-shape collate), so no remainder handling
    is needed here.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pc} processes"
        )
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def global_batch_from_local(local_batch, mesh: Mesh):
    """Promote per-host batch arrays to global arrays sharded over 'data'.

    Each host passes only its local rows (from :func:`local_batch_slice`);
    the result is a dict of global jax.Arrays whose addressable shards are
    exactly the local data — no cross-host transfer happens here.
    """
    sharding = batch_sharding(mesh)
    pc = jax.process_count()

    def promote(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree.map(promote, local_batch)


def broadcast_str(tag: str, value: Optional[str] = None,
                  timeout_s: float = 600.0) -> str:
    """Process 0 publishes a string under ``tag``; every other process
    blocks until it appears and returns it (distributed KV store — no
    device collective, so safe before any compile). Used e.g. to agree on
    the run's resolved save_dir (increment_path runs on process 0 only).

    Tags get a per-process sequence suffix (like sync_hosts) so the same
    tag may be broadcast again on a later train() call without a KV-key
    collision; all processes must make the same sequence of calls."""
    if jax.process_count() == 1:
        return value
    seq = _BCAST_SEQ["n"]
    _BCAST_SEQ["n"] = seq + 1
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        raise RuntimeError("broadcast_str needs jax.distributed.initialize")
    if jax.process_index() == 0:
        client.key_value_set(f"{tag}#{seq}", value)
        return value
    return client.blocking_key_value_get(f"{tag}#{seq}",
                                         int(timeout_s * 1000))


_BCAST_SEQ = {"n": 0}


_BARRIER_SEQ = {"n": 0}


def sync_hosts(tag: str = "sync", timeout_s: float = 900.0) -> None:
    """Barrier across processes (reference dist.barrier() analog).

    Implemented on the distributed-runtime KV store
    (``DistributedRuntimeClient.wait_at_barrier``), NOT on a device
    collective: a gloo all-gather barrier is itself subject to the ~30 s
    gloo context rendezvous window, which compile-time skew between
    processes can blow (observed when one process hit a stale host-keyed
    AOT cache while its peer recompiled cold — the peer arrived at the
    rendezvous minutes late and the early process died DEADLINE_EXCEEDED).
    The KV barrier has an explicit, generous timeout and touches no device.

    Barrier ids get a per-process sequence suffix so a tag may be reused;
    correctness requires every process to execute the same *sequence* of
    sync_hosts calls, which the barrier then enforces.
    """
    if jax.process_count() == 1:
        return
    seq = _BARRIER_SEQ["n"]
    _BARRIER_SEQ["n"] = seq + 1
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # distributed runtime not via jax.distributed
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"{tag}#{seq}")
        return
    client.wait_at_barrier(f"{tag}#{seq}",
                           timeout_in_ms=int(timeout_s * 1000))
