"""End-to-end bench of DESENET_SPLIT_MIN_PART values (b128 inference).

The implicit-concat (split-conv) gate trades concat pad+max materialization
against MXU contraction depth (PERF.md "Split-conv machinery"). 128 is the
shipped gate; 64 measured 2539 vs 2656 img/s (regression). 96 — which
admits the seg-head PyramidPooling parts — was never measured end to end.

Usage: python tools/probe_split_gate.py [gate ...]   (default: 128 96)
Each gate runs bench.py's program in-process sequentially.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    gates = [int(g) for g in sys.argv[1:]] or [128, 96]
    for g in gates:
        env = dict(os.environ, DESENET_SPLIT_MIN_PART=str(g))
        print(f"== DESENET_SPLIT_MIN_PART={g}", flush=True)
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, check=False)


if __name__ == "__main__":
    main()
