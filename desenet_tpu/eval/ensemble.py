"""Model ensembling — reference Ensemble / attempt_load multi-checkpoint
path (experimental.py:58-108): each model's decoded predictions are
concatenated along the anchor axis and NMS'd jointly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from desenet_tpu.models import build_model, config_path
from desenet_tpu.utils.checkpoint import load_inference_variables


def load_ensemble(weight_dirs: Sequence[str], dtype=jnp.bfloat16,
                  **build_kw):
    """Load N checkpoints -> list of (model, variables, meta). All members
    must share de_nc and se_nc (the joint NMS pass and the seg-logit mean
    both need one class space). ``build_kw`` forwards to ``build_model``
    (e.g. ``seg_upsample=False`` for the detect CLI's fused tail)."""
    members = []
    for w in weight_dirs:
        variables, meta = load_inference_variables(w)
        assert meta is not None, f"{w}: checkpoint missing meta.json"
        model, _ = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                               se_nc=meta["se_nc"], dtype=dtype, **build_kw)
        members.append((model, variables, meta))
    for key in ("de_nc", "se_nc"):
        vals = {m[2][key] for m in members}
        assert len(vals) == 1, f"ensemble members disagree on {key}: {vals}"
    return members


class EnsembleModel:
    """Duck-types a single built model for Validator / Predictor / TTA.

    ``apply(variables, x, train=False)`` takes a tuple of member variable
    pytrees (jit-traceable) and returns ``((dec_cat, None), seg_mean)`` —
    decoded detections concatenated along the anchor axis for one joint NMS
    pass (the reference Ensemble cats y, experimental.py:58-70) and seg
    logits averaged (softer than the reference, which only ensembles
    detection). ``spec`` comes from the max-stride member (the reference
    takes the ensemble max stride, experimental.py:105)."""

    def __init__(self, models: Sequence):
        assert models, "empty ensemble"
        self.models = tuple(models)
        self.dtype = self.models[0].dtype
        self.spec = max((m.spec for m in self.models),
                        key=lambda s: max(s.det_strides))

    def apply(self, variables, x, train: bool = False):
        assert not train, "EnsembleModel is inference-only"
        decs, segs = [], []
        for m, v in zip(self.models, variables):
            (dec, _), seg = m.apply(v, x, train=False)
            decs.append(dec)
            segs.append(seg.astype(jnp.float32))
        return (jnp.concatenate(decs, axis=1), None), sum(segs) / len(segs)


def ensemble_forward(members, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run every member; cat decoded det outputs (B, sum_A, no) for one NMS
    pass; average seg logits."""
    model = EnsembleModel([m for m, _, _ in members])
    (dec, _), seg = model.apply(tuple(v for _, v, _ in members), x)
    return dec, seg
