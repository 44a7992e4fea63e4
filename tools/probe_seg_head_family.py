"""Measure the SegMaskPSP2 head — XLA module vs the fused Pallas kernel —
at the family scales (s/m/l) on the real chip.

Round-2 measured the s shapes a wash (17.7 vs 16.1 ms standalone,
PERF.md "Fused SegMaskPSP2 head kernel — NEGATIVE"); the round-4 m-scale
attribution put the head at 14.3 ms (17% of the m forward) at 74 TF/s /
0.57 TB/s — neither-roofline economics the s verdict doesn't cover. This
probe settles it per scale.

Usage:  PROBE_CFG=yolov5m_seg PROBE_B=128 python tools/probe_seg_head_family.py
Prints steady ms/iter for both implementations on identical inputs, plus a
numeric agreement check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("PROBE_B", "128"))
SIZE = int(os.environ.get("PROBE_SIZE", "640"))
ITERS = int(os.environ.get("PROBE_ITERS", "16"))
CFG = os.environ.get("PROBE_CFG", "yolov5m_seg")

from desenet_tpu.models import heads as H  # noqa: E402
from desenet_tpu.models.build import parse_config  # noqa: E402
from desenet_tpu.models import config_path  # noqa: E402
from desenet_tpu.ops.seg_head_pallas import fused_psp2_eval  # noqa: E402
from desenet_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    spec = parse_config(config_path(CFG))
    seg_ls = next(ls for ls in spec.layers if ls.name == "SegMaskPSP2")
    c_hid = seg_ls.args[2]
    se_nc = seg_ls.args[0]
    h8 = SIZE // 8
    print(f"{CFG}: c_hid={c_hid} se_nc={se_nc} taps at {h8}x{h8}")

    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.normal(0, 1, (B, h8, h8, c_hid)), jnp.bfloat16),
        jnp.asarray(rng.normal(0, 1, (B, h8 // 2, h8 // 2, 2 * c_hid)),
                    jnp.bfloat16),
        jnp.asarray(rng.normal(0, 1, (B, h8 // 4, h8 // 4, 4 * c_hid)),
                    jnp.bfloat16),
    ]
    head = H.SegMaskPSP2(n_segcls=se_nc, c_hid=c_hid, dtype=jnp.bfloat16,
                         upsample=False)
    v = head.init(jax.random.PRNGKey(0),
                  [x.astype(jnp.float32) for x in xs], train=False)

    def xla_head(xs):
        return head.apply(v, xs, train=False)

    def pallas_head(xs):
        return fused_psp2_eval(xs, v["params"], v["batch_stats"], se_nc)

    def chain(fn):
        def run(xs_stack):
            def body(c, inp):
                y = fn(list(inp))
                return c + jnp.sum(y.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0.0), xs_stack)
            return s
        return jax.jit(run)

    def mk(key):
        ks = jax.random.split(key, 3)
        return tuple(
            jax.random.normal(k, (ITERS,) + tuple(x.shape), jnp.bfloat16)
            for k, x in zip(ks, xs))

    # agreement (single call)
    ya = np.asarray(xla_head(xs), np.float32)
    yb = np.asarray(pallas_head(xs), np.float32)
    agree = float((ya.argmax(-1) == yb.argmax(-1)).mean())
    print(f"argmax agreement: {agree:.4f}")

    for name, fn in (("xla", xla_head), ("pallas", pallas_head)):
        c = chain(fn)
        warm = mk(jax.random.PRNGKey(3))
        float(c(warm))
        args = mk(jax.random.PRNGKey(7))
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        float(c(args))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt * 1e3:.2f} ms/iter  (b{B} {SIZE}px)", flush=True)


if __name__ == "__main__":
    main()
