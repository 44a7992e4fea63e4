"""Model ensembling — reference Ensemble / attempt_load multi-checkpoint
path (experimental.py:58-108): each model's decoded predictions are
concatenated along the anchor axis and NMS'd jointly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from desenet_tpu.models import build_model, config_path
from desenet_tpu.utils.checkpoint import load_inference_variables


def load_ensemble(weight_dirs: Sequence[str], dtype=jnp.bfloat16):
    """Load N checkpoints -> list of (model, variables, meta). All members
    must share de_nc (class space)."""
    members = []
    for w in weight_dirs:
        variables, meta = load_inference_variables(w)
        assert meta is not None, f"{w}: checkpoint missing meta.json"
        model, _ = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                               se_nc=meta["se_nc"], dtype=dtype)
        members.append((model, variables, meta))
    ncs = {m[2]["de_nc"] for m in members}
    assert len(ncs) == 1, f"ensemble members disagree on de_nc: {ncs}"
    return members


def ensemble_forward(members, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run every member; cat decoded det outputs (B, sum_A, no) for one NMS
    pass; average seg logits (softer than the reference, which only
    ensembles detection)."""
    decs: List = []
    segs: List = []
    for model, variables, _ in members:
        (dec, _), seg = model.apply(variables, x, train=False)
        decs.append(dec)
        segs.append(seg.astype(jnp.float32))
    dec = jnp.concatenate(decs, axis=1)
    seg = sum(segs) / len(segs)
    return dec, seg
