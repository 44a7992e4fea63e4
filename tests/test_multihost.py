"""Multi-process (multi-host) data parallelism: 2 processes x 4 CPU devices
feeding per-host shards via jax.make_array_from_process_local_data must
produce the same step as a single process on the identical global batch.

This executes the multi-host recipe end to end (parallel/multihost.py) —
the JAX-native replacement for the reference's torchrun multi-node DDP
(/root/reference/scripts/train.py:555-561)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host; excluded from the smoke tier

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_process(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # workers size their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid),
             str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    with open(tmp_path / "result.json") as f:
        multi = json.load(f)
    assert multi["process_count"] == 2
    assert multi["n_devices"] == 8

    # both processes computed identical replicated results
    with open(tmp_path / "result_p1.json") as f:
        p1 = json.load(f)
    assert p1["loss"] == multi["loss"]
    assert p1["param_digest"] == multi["param_digest"]

    # single-process run on the same global batch (this process has the
    # conftest's 8 virtual CPU devices, but plain single-device jit is the
    # strictest comparison point)
    from desenet_tpu.train import create_train_state

    from tests.test_parallel import make_batch, make_setup

    model, variables, opt, step = make_setup()
    batch = make_batch(np.random.default_rng(0), b=8)
    state = create_train_state(variables, opt)
    state, metrics = step(state, jax.tree.map(jnp.asarray, batch),
                          jax.random.PRNGKey(3))

    assert np.isclose(float(metrics["loss"]), multi["loss"], rtol=1e-5)
    digest = float(sum(
        np.abs(np.asarray(p)).sum() for p in jax.tree.leaves(state.params)))
    bs_digest = float(sum(
        np.abs(np.asarray(p)).sum()
        for p in jax.tree.leaves(state.batch_stats)))
    # cross-host gloo collectives reduce in a different order — fp32 noise
    assert np.isclose(digest, multi["param_digest"], rtol=1e-5)
    assert np.isclose(bs_digest, multi["bs_digest"], rtol=1e-5)
