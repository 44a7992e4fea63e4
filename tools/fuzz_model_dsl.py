"""Fuzz the yaml model-DSL compiler (models/build.py parse_config).

The reference eval()s module names and trusts the yaml shape entirely
(yolo.py:443-499); our compiler validates instead. This fuzzer mutates a
valid config with structural/type/value corruptions and asserts the
compiler's contract: parse_config either returns a ModelSpec or raises a
clean ValueError/TypeError/KeyError — never an internal error
(IndexError/AttributeError/Assertion/ZeroDivision/Recursion) and never
hangs.

Usage: python tools/fuzz_model_dsl.py [N] [--seed S] [--verbose]
Exit code 1 if any unclean failure is found (each printed with the repro
config).
"""

import argparse
import copy
import os
import random
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml

from desenet_tpu.models import config_path
from desenet_tpu.models.build import parse_config

CLEAN = (ValueError, TypeError, KeyError)


class ParseHang(Exception):
    """parse_config exceeded the per-config alarm — treated as a finding."""


def _alarm(signum, frame):
    raise ParseHang("parse_config exceeded 5s")


signal_installed = False

JUNK = [None, True, -1, 0, 3.7, "x", "Conv", [], [[]], {}, {"a": 1},
        [1, 2, 3], "nan", float("nan"), -0.5, 10**9, [-1], ["Conv"], b"b"]


def _rand_row(rng):
    return [rng.choice([-1, 0, 1, [2, 3], "x"]),
            rng.choice([0, 1, 3, -2, "n"]),
            rng.choice(["Conv", "C3", "Focus", "Nope", 7, None, "Detect"]),
            rng.choice([[], [64], [64, 3], ["anchors"], [None], "args", 5])]


def mutate(cfg, rng):
    """Apply 1-3 random corruptions to a deep copy of cfg."""
    c = copy.deepcopy(cfg)
    for _ in range(rng.randint(1, 3)):
        op = rng.randrange(9)
        if op == 0 and c:  # drop a top-level key
            c.pop(rng.choice(list(c)), None)
        elif op == 1 and c:  # junk a top-level value
            c[rng.choice(list(c))] = rng.choice(JUNK)
        elif op == 2:  # junk/new key
            c[rng.choice(["de_nc", "se_nc", "anchors", "zzz",
                          "depth_multiple", "width_multiple"])] = \
                rng.choice(JUNK)
        else:
            sect = rng.choice(["backbone", "head"])
            rows = c.get(sect)
            if not isinstance(rows, list) or not rows:
                c[sect] = rng.choice(JUNK)
                continue
            k = rng.randrange(len(rows))
            if op == 3:  # replace a row wholesale
                rows[k] = rng.choice(JUNK + [_rand_row(rng)])
            elif op == 4:  # corrupt one element of a row
                if isinstance(rows[k], list) and rows[k]:
                    rows[k] = list(rows[k])
                    rows[k][rng.randrange(len(rows[k]))] = rng.choice(
                        JUNK + [rng.randint(-30, 30)])
            elif op == 5:  # truncate the section
                del rows[k:]
            elif op == 6:  # duplicate a row
                rows.insert(k, copy.deepcopy(rows[k]))
            elif op == 7:  # random from-index
                if isinstance(rows[k], list) and rows[k]:
                    rows[k] = list(rows[k])
                    rows[k][0] = rng.choice(
                        [rng.randint(-30, 60),
                         [rng.randint(-30, 60), rng.randint(-30, 60)]])
            elif op == 8:  # corrupt the args list elementwise
                if (isinstance(rows[k], list) and len(rows[k]) == 4
                        and isinstance(rows[k][3], list) and rows[k][3]):
                    rows[k] = list(rows[k])
                    a = list(rows[k][3])
                    a[rng.randrange(len(a))] = rng.choice(JUNK)
                    rows[k][3] = a
    return c


def run(n, seed, verbose=False):
    with open(config_path("yolov5s_seg"), encoding="utf-8") as f:
        base = yaml.safe_load(f)
    signal.signal(signal.SIGALRM, _alarm)
    rng = random.Random(seed)
    ok = raised = 0
    failures = []
    for i in range(n):
        cfg = mutate(base, rng)
        try:
            signal.alarm(5)  # a parse must be instant; a hang is a finding
            parse_config(copy.deepcopy(cfg))
            ok += 1
        except CLEAN:
            raised += 1
        except Exception as e:  # noqa: BLE001 - the point of the fuzzer
            failures.append((type(e).__name__, str(e)[:200], cfg))
            if verbose:
                import traceback
                print(f"[{i}] UNCLEAN {type(e).__name__}: {e}")
                traceback.print_exc()
        finally:
            signal.alarm(0)
    print(f"fuzz: {n} configs — {ok} parsed, {raised} clean-rejected, "
          f"{len(failures)} UNCLEAN")
    for name, msg, cfg in failures[:10]:
        print(f"\n== {name}: {msg}\n{yaml.safe_dump(cfg)[:1500]}")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", action="store_true")
    a = ap.parse_args()
    sys.exit(1 if run(a.n, a.seed, a.verbose) else 0)


if __name__ == "__main__":
    main()
