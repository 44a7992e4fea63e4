"""Tally HBM traffic per optimized-HLO op for the train-mode forward/grad.

`compiled.cost_analysis()` only gives program totals; this walks the
optimized HLO module text and attributes bytes (operand + output buffer
sizes) to each top-level instruction, aggregated by op kind. Fusions are
one op each — their internal intermediates stay in registers/VMEM, so
summing materialized buffer edges is the right traffic model on TPU.

Usage: python tools/profile_hlo.py [fwd|grad|infer] [--top 30]
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SIZE = 640
B_TRAIN = 64
B_INFER = 128

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2,
               "u16": 2}

SHAPE_RE = re.compile(r"\(?([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(sig: str) -> int:
    """Sum buffer bytes over every tensor in an HLO type signature."""
    total = 0
    for dt, dims in SHAPE_RE.findall(sig):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


INSTR_RE = re.compile(r"(?:ROOT )?(%[\w.-]+) = (.+?) ([\w-]+)\((.*)$")
NAME_RE = re.compile(r"%[\w.-]+")


def analyze(hlo_text: str, top: int):
    """Traffic = operand + output buffer bytes of every ENTRY instruction.

    Instructions inside fusion bodies stay in registers/VMEM and are not
    counted; a fusion call's traffic is its operands + outputs.
    """
    # build name -> bytes over all computations (operands of entry ops may
    # be defined anywhere)
    sizes = {}
    entry_lines = []
    in_entry = False
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line == "}":
            in_entry = False
        m = INSTR_RE.match(line)
        if not m:
            continue
        name, sig, op, rest = m.groups()
        sizes[name] = shape_bytes(sig)
        if in_entry:
            entry_lines.append((name, sig, op, rest, line))

    by_kind = defaultdict(lambda: [0, 0])
    by_layer = defaultdict(lambda: [0, 0])
    rows = []
    for name, sig, op, rest, line in entry_lines:
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast", "copy-start", "copy-done"):
            continue
        # operand names = %refs before any attribute section
        args = rest.split("), ")[0]
        traffic = sizes.get(name, 0) + sum(
            sizes.get(a, 0) for a in NAME_RE.findall(args))
        label = op
        fm = re.search(r"kind=(\w+)", line)
        if op == "fusion" and fm:
            label = f"fusion.{fm.group(1)}"
        by_kind[label][0] += traffic
        by_kind[label][1] += 1
        lm = re.search(r'op_name="[^"]*?(l\d+|Detect|Seg\w*|loss\w*)[/"]',
                       line)
        layer = lm.group(1) if lm else "other"
        by_layer[layer][0] += traffic
        by_layer[layer][1] += 1
        rows.append((traffic, label, line[:200]))

    total = sum(b for b, _ in by_kind.values())
    print(f"entry traffic total: {total/1e9:.2f} GB")
    print(f"\n{'kind':24s} {'GB':>8s} {'count':>6s}")
    for k, (b, c) in sorted(by_kind.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"{k:24s} {b/1e9:8.2f} {c:6d}")
    print(f"\n{'layer':24s} {'GB':>8s} {'count':>6s}")
    for k, (b, c) in sorted(by_layer.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{k:24s} {b/1e9:8.2f} {c:6d}")
    print("\ntop single entry ops by traffic:")
    for b, label, line in sorted(rows, key=lambda r: -r[0])[:top]:
        print(f"{b/1e9:7.3f} GB  {label:20s} {line}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["fwd", "grad", "infer"])
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from desenet_tpu.losses import DetectionLoss, segmentation_loss
    from desenet_tpu.models import build_model, config_path, init_model
    from desenet_tpu.models.heads import Detect

    model, spec = build_model(config_path("yolov5s_seg"), dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=SIZE,
                           batch=1)
    det = spec.layers[spec.det_layer]
    head = Detect(nc=spec.de_nc, anchors=det.args[1],
                  strides=spec.det_strides)
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in head.anchors_grid_units())
    det_loss = DetectionLoss(anchors=anchors, nc=spec.de_nc)
    params0, bs0 = variables["params"], variables["batch_stats"]

    tgt = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.4, 0.3]], jnp.float32),
                   (B_TRAIN, 8, 1))
    msk = jnp.tile(jnp.asarray([[True] * 4 + [False] * 4]), (B_TRAIN, 1))

    def loss_full(params, x, seg_i):
        x = x.astype(jnp.bfloat16) / 255.0
        out, mut = model.apply(
            {"params": params, "batch_stats": bs0}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        det_feats, seg_out = out
        dt, _ = det_loss(det_feats, tgt, msk)
        return 0.14 * dt + segmentation_loss(seg_out, seg_i)

    z_x = jnp.zeros((B_TRAIN, SIZE, SIZE, 3), jnp.uint8)
    z_s = jnp.zeros((B_TRAIN, SIZE, SIZE), jnp.int32)

    if args.mode == "fwd":
        f = loss_full
        lowered = jax.jit(f).lower(params0, z_x, z_s)
    elif args.mode == "grad":
        def g(p, x, s):
            gr = jax.grad(lambda q: loss_full(q, x, s))(p)
            return sum(l.sum().astype(jnp.float32)
                       for l in jax.tree.leaves(gr))
        lowered = jax.jit(g).lower(params0, z_x, z_s)
    else:
        def inf(v, x):
            (dec, feats), seg = model.apply(v, x, train=False)
            return dec.sum().astype(jnp.float32) + seg.sum(dtype=jnp.float32)
        lowered = jax.jit(inf).lower(
            variables, jnp.zeros((B_INFER, SIZE, SIZE, 3), jnp.bfloat16))

    cache = f"/tmp/hlo_{args.mode}.txt"
    if os.path.exists(cache):
        texts = open(cache).read()
    else:
        compiled = lowered.compile()
        texts = compiled.as_text()
        with open(cache, "w") as f:
            f.write(texts)
    analyze(texts, args.top)


if __name__ == "__main__":
    main()
