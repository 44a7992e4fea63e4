"""Worker process for the multi-host parity test.

Launched by tests/test_multihost.py as
    python tests/multihost_worker.py <coordinator> <nproc> <pid> <outdir>
Each process owns `CPU_DEVICES_PER_PROC` virtual CPU devices; together they
form one global mesh. Every process loads ONLY its rows of the global batch
(local_batch_slice) and promotes them with global_batch_from_local, then runs
one jitted train step. Process 0 writes the loss and a params digest to
<outdir>/result.json for the parent to compare against a single-process run.

This is the executable form of the reference's torchrun multi-node loop
(/root/reference/scripts/train.py:555-561, DistributedSampler split at :60-62).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

CPU_DEVICES_PER_PROC = 4


def main():
    coordinator, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from desenet_tpu.parallel.multihost import (
        init_multihost, local_batch_slice, global_batch_from_local)

    init_multihost(coordinator, nproc, pid,
                   cpu_devices_per_process=CPU_DEVICES_PER_PROC)

    import numpy as np

    from desenet_tpu.parallel import make_mesh
    from desenet_tpu.parallel.mesh import replicate_tree
    from desenet_tpu.train import create_train_state

    from tests.test_parallel import make_batch, make_setup

    model, variables, opt, step = make_setup()
    mesh = make_mesh()  # all devices across all processes
    assert len(mesh.devices.ravel()) == nproc * CPU_DEVICES_PER_PROC

    global_batch = make_batch(np.random.default_rng(0), b=8)
    rows = local_batch_slice(8)
    local = {k: v[rows] for k, v in global_batch.items()}
    batch = global_batch_from_local(local, mesh)

    state = replicate_tree(create_train_state(variables, opt), mesh)
    # compile first, THEN rendezvous: the first executed collective opens
    # the gloo communicator with a short window that compile-time skew
    # (e.g. one process warm-cached, the other cold) can blow — same
    # hardening as the engine (train/engine.py)
    from desenet_tpu.parallel.multihost import sync_hosts

    rng = jax.random.PRNGKey(3)
    step.lower(state, batch, rng).compile()
    sync_hosts("step_compiled")
    state, metrics = step(state, batch, rng)

    # fully-replicated outputs are addressable on every process
    loss = float(metrics["loss"])
    digest = float(sum(
        np.abs(np.asarray(p)).sum() for p in jax.tree.leaves(state.params)))
    bs_digest = float(sum(
        np.abs(np.asarray(p)).sum()
        for p in jax.tree.leaves(state.batch_stats)))

    if jax.process_index() == 0:
        with open(os.path.join(outdir, "result.json"), "w") as f:
            json.dump({"loss": loss, "param_digest": digest,
                       "bs_digest": bs_digest,
                       "process_count": jax.process_count(),
                       "n_devices": len(jax.devices())}, f)
    else:
        with open(os.path.join(outdir, f"result_p{pid}.json"), "w") as f:
            json.dump({"loss": loss, "param_digest": digest}, f)


if __name__ == "__main__":
    main()
