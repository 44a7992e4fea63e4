"""XLA flag sweep on the PRODUCTION INFERENCE program (the train-side sweep
in probe_xla_flags.py measured negative; inference has a different
compute/traffic mix — fwd runs at 77% of its HBM floor with an 8 ms
scheduling+stem residual, PERF.md round 3).

Each flag set runs in a fresh subprocess (XLA_FLAGS is read once at backend
init) using bench.py with a reduced ITERS and the shared compile cache
DISABLED (different flags must not cross-pollinate cached executables).

Run ALONE on the chip. Usage: python tools/probe_infer_xla_flags.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "input_fusion_downcast": "--xla_tpu_enable_conv_input_fusion_with_downcast=true",
    "aggressive_fusion": "--xla_tpu_rwb_fusion=true",
}


def main():
    results = {}
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["DESENET_BENCH_ITERS"] = "16"
        env["DESENET_BENCH_NO_CACHE"] = "1"  # no cross-flag executable reuse
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")], env=env,
            capture_output=True, text=True, timeout=3000)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"{name:24s} FAILED\n{proc.stderr[-500:]}")
            continue
        import json

        val = json.loads(line[-1])["value"]
        results[name] = val
        base = results.get("baseline")
        rel = f"  ({val / base - 1:+.1%})" if base and name != "baseline" else ""
        print(f"{name:24s} {val:8.1f} img/s{rel}", flush=True)


if __name__ == "__main__":
    main()
