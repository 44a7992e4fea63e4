"""Regression: the driver-facing ``__graft_entry__.dryrun_multichip`` must
survive an environment where the axon TPU PJRT plugin is registered (the
driver's process), by forcing the CPU platform + virtual devices itself
before any JAX backend is touched.

Round-1 failure mode: MULTICHIP_r01.json ok=false — backend init crashed on a
libtpu client/terminal mismatch before any mesh was created.
"""

import pytest
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_survives_tpu_plugin_env():
    env = dict(os.environ)
    # Simulate the driver's environment: axon plugin selected, none of the
    # CPU-forcing vars that tests/conftest.py sets for this process.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "dryrun_multichip(8): ok" in r.stdout
