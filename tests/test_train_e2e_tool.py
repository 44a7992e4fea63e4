"""End-to-end training throughput harness (tools/bench_train_e2e.py):
the loader+step composite the reference hot loop runs (train.py:322-376),
exercised at tiny scale. Marked slow: builds a dataset and compiles a
train step."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_e2e_tool_composite_and_loader(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_train_e2e.py"),
         "--root", str(tmp_path / "ds"), "--n-images", "16",
         "--batch-size", "4", "--img-size", "128", "--epochs", "2",
         "--cfg", os.path.join(REPO, "tests", "configs", "tiny_psp2.yaml"),
         "--mode", "all"],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    metrics = {l["metric"]: l for l in lines}
    assert "train_loader_only_img_s" in metrics
    assert "train_e2e_loader_plus_step_img_s" in metrics
    for m in metrics.values():
        assert m["value"] > 0
    # the composite includes real device steps, so it cannot exceed the
    # loader-only rate by more than measurement noise
    assert (metrics["train_e2e_loader_plus_step_img_s"]["value"]
            <= metrics["train_loader_only_img_s"]["value"] * 3)
