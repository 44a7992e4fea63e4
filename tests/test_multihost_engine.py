"""Engine-level multi-process training: 2 processes x 4 CPU devices running
the REAL `desenet-train` CLI (env-var launch, per-process loader shards,
host-0 artifact guards, ckpt-boundary syncs) must reproduce a single-process
run of the same global configuration.

This is the engine counterpart of tests/test_multihost.py's step-level
parity — the executable form of the reference's fully DDP-integrated
training loop (/root/reference/scripts/train.py:223-226 per-rank loaders,
:319/:393 rank-0 guards, :555-561 process-group init)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_fake_dataset import generate  # noqa: E402

pytestmark = pytest.mark.slow  # two subprocess JAX inits on a 1-core host

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
TINY_CFG = os.path.join(HERE, "configs", "tiny_psp2.yaml")

from tests.conftest import CPU_CACHE_DIR  # noqa: E402  (host-keyed)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _cli_args(data_yaml, project):
    return [
        "--data", data_yaml, "--cfg", TINY_CFG,
        "--epochs", "2", "--batch-size", "8", "--img-size", "64",
        "--workers", "2", "--project", project, "--name", "mh",
        "--exist-ok", "--dtype", "float32", "--nbs", "8",
        "--warmup-floor", "4", "--noautoanchor", "--no-tb",
        "--max-targets", "32", "--patience", "10", "--seed", "0",
    ]


def _param_digest(ckpt_dir):
    import jax

    from desenet_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt_dir)
    return {
        k: float(sum(np.abs(np.asarray(p, np.float64)).sum()
                     for p in jax.tree.leaves(payload[k])))
        for k in ("params", "batch_stats", "ema_params")
    }


def _read_results_csv(save_dir):
    with open(os.path.join(save_dir, "results.csv")) as f:
        lines = f.read().strip().splitlines()
    header = [h.strip() for h in lines[0].split(",")]
    rows = [dict(zip(header, (float(v) if v else np.nan
                              for v in ln.split(",")))) for ln in lines[1:]]
    return rows


@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_micro")
    generate(str(root), n_train=16, n_val=4, size=96, seed=11)
    return str(root)


def test_engine_two_process_matches_single(micro_root, tmp_path):
    data_yaml = os.path.join(micro_root, "data.yaml")
    coordinator = f"localhost:{_free_port()}"
    projects = [str(tmp_path / f"proj_p{pid}") for pid in range(2)]

    procs = []
    for pid in range(2):
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
            PALLAS_AXON_POOL_IPS="",
            # share the suite's persistent compile cache (both workers and
            # the in-process baseline compile the same tiny programs); the
            # dir is keyed by host CPU features (conftest.CPU_CACHE_DIR) so
            # a cache carried from another machine type is a clean cold
            # miss for BOTH workers, never an asymmetric recompile
            JAX_COMPILATION_CACHE_DIR=CPU_CACHE_DIR,
            DESENET_COORDINATOR=coordinator,
            DESENET_NUM_PROCESSES="2",
            DESENET_PROCESS_ID=str(pid),
            DESENET_CPU_DEVICES_PER_PROC="4",
        )
        env.pop("XLA_FLAGS", None)  # workers size their own device count
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "desenet_tpu.cli.train",
             *_cli_args(data_yaml, projects[pid])],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-6000:]}"

    # --- host-0 artifact ownership ------------------------------------
    sd0 = os.path.join(projects[0], "mh")
    assert os.path.isdir(sd0), outs[0][-2000:]
    for name in ("results.csv", "hyp.yaml", "opt.yaml"):
        assert os.path.exists(os.path.join(sd0, name))
    assert os.path.exists(os.path.join(sd0, "last", "meta.json"))
    assert os.path.exists(os.path.join(sd0, "best_stripped", "meta.json"))
    # worker 1 must not have written anything (rank-0 guards)
    assert not os.path.exists(projects[1]), os.listdir(projects[1])

    # both processes ran the full loop and reported the same fitness
    assert "done:" in outs[0] and "done:" in outs[1]
    fit = [ln for ln in outs[1].splitlines() if "best_fitness=" in ln]
    assert fit, outs[1][-2000:]
    bf_p1 = float(fit[0].split("best_fitness=")[1].split()[0])

    # --- single-process baseline (same global batch/seed/epochs) -------
    from desenet_tpu.train.engine import TrainConfig, train

    cfg = TrainConfig(
        data=data_yaml, cfg=TINY_CFG, epochs=2, batch_size=8, imgsz=64,
        workers=2, project=str(tmp_path / "single"), name="mh",
        exist_ok=True, dtype="float32", nbs=8, warmup_floor=4,
        noautoanchor=True, use_tb=False, max_targets=32, patience=10,
        seed=0,
    )
    single = train(cfg)

    # the broadcast fitness every process acted on == the single-run one
    assert np.isclose(bf_p1, single["best_fitness"], atol=1e-3)

    # per-epoch metrics agree (identical global batches; fp reduce-order
    # noise from gloo cross-host collectives only)
    rows_multi = _read_results_csv(sd0)
    rows_single = _read_results_csv(single["save_dir"])
    assert len(rows_multi) == len(rows_single) == 2
    for rm, rs in zip(rows_multi, rows_single):
        for k in ("train/box_loss", "train/obj_loss", "train/seg_loss",
                  "metrics/mIoU", "metrics/mAP_0.5"):
            assert np.isclose(rm[k], rs[k], rtol=1e-3, atol=1e-4), (k, rm, rs)

    # trained weights agree
    dm = _param_digest(os.path.join(sd0, "last"))
    ds = _param_digest(os.path.join(single["save_dir"], "last"))
    for k in dm:
        assert np.isclose(dm[k], ds[k], rtol=1e-4), (k, dm, ds)


def _launch_engine(data_yaml, projects, nproc, devices_per_proc, extra=()):
    coordinator = f"localhost:{_free_port()}"
    procs = []
    for pid in range(nproc):
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
            PALLAS_AXON_POOL_IPS="",
            JAX_COMPILATION_CACHE_DIR=CPU_CACHE_DIR,
            DESENET_COORDINATOR=coordinator,
            DESENET_NUM_PROCESSES=str(nproc),
            DESENET_PROCESS_ID=str(pid),
            DESENET_CPU_DEVICES_PER_PROC=str(devices_per_proc),
        )
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "desenet_tpu.cli.train",
             *_cli_args(data_yaml, projects[pid]), *extra],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-6000:]}"
    return outs


def _best_fitness(out):
    fit = [ln for ln in out.splitlines() if "best_fitness=" in ln]
    assert fit, out[-2000:]
    return float(fit[0].split("best_fitness=")[1].split()[0])


@pytest.fixture(scope="module")
def uneven_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_uneven")
    generate(str(root), n_train=23, n_val=4, size=96, seed=13)
    return str(root)


def test_engine_two_process_uneven_shards(uneven_root, tmp_path):
    """23 train imgs / 2 procs -> ranks own 12 and 11 samples; local bs 4
    -> one rank's loader yields 3 drop_last batches, the other's 2, while
    nb = (23//2)//4 = 2. The spare-batch break (train/engine.py `i >= nb`)
    MUST fire on the long rank each epoch or its extra step's collectives
    deadlock against a rank that already left the loop — exactly the
    uneven-shard hang this test exists to catch (reference analog:
    DistributedSampler keeps ranks step-aligned, train.py:223-226)."""
    data_yaml = os.path.join(uneven_root, "data.yaml")
    projects = [str(tmp_path / f"proj_p{pid}") for pid in range(2)]
    outs = _launch_engine(data_yaml, projects, nproc=2, devices_per_proc=4)

    # completion (not hanging) is the core assertion; then consistency:
    assert "done:" in outs[0] and "done:" in outs[1]
    assert _best_fitness(outs[0]) == pytest.approx(_best_fitness(outs[1]))
    sd0 = os.path.join(projects[0], "mh")
    rows = _read_results_csv(sd0)
    assert len(rows) == 2  # both epochs ran on process 0
    assert os.path.exists(os.path.join(sd0, "last", "meta.json"))
    assert not os.path.exists(projects[1])  # rank-0 artifact guards held


def test_engine_four_process_smoke(micro_root, tmp_path):
    """4 processes x 2 CPU devices: the same engine path at a process count
    where pairwise gloo cliques and the KV barriers genuinely fan out."""
    data_yaml = os.path.join(micro_root, "data.yaml")
    projects = [str(tmp_path / f"proj_p{pid}") for pid in range(4)]
    outs = _launch_engine(data_yaml, projects, nproc=4, devices_per_proc=2,
                          extra=("--epochs", "1"))
    fits = [_best_fitness(out) for out in outs]
    assert all("done:" in out for out in outs)
    assert all(f == pytest.approx(fits[0]) for f in fits[1:])
    sd0 = os.path.join(projects[0], "mh")
    assert os.path.exists(os.path.join(sd0, "last", "meta.json"))
    for pid in range(1, 4):
        assert not os.path.exists(projects[pid])
