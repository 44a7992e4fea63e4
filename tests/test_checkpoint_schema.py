"""Checkpoint schema versioning: meta.json version stamp + migration
registry (VERDICT r1 #10). The Focus (v1->v2) and C3 (layout) migrations are
formalized; loading an old-version checkpoint after a schema bump must
reproduce the current layout exactly.

Reference ckpt contract being mirrored: scripts/train.py:426-443."""

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from desenet_tpu.models import build_model, init_model
from desenet_tpu.utils import checkpoint as ckpt

CFG = os.path.join(os.path.dirname(__file__), "configs", "tiny_psp2.yaml")


def defuse_focus(variables):
    """Test-only inverse of migrate_focus_params: rebuild the v1 layout
    (space-to-depth 4c 3x3 kernel under l{i}/conv/{conv,bn})."""
    out = {}
    for col, tree in variables.items():
        tree = {k: v for k, v in tree.items()}
        sub = tree["l0"]
        inner = {}
        if "conv" in sub:
            w6 = np.asarray(sub["conv"]["conv2d"]["kernel"])
            k2, _, c, o = w6.shape
            k = k2 // 2
            w4 = np.zeros((k, k, 4 * c, o), w6.dtype)
            for oy in range(2):
                for ox in range(2):
                    s = oy + 2 * ox
                    w4[:, :, c * s:c * (s + 1), :] = w6[oy::2, ox::2]
            inner["conv"] = {"conv2d": {"kernel": w4}}
        if "bn" in sub:
            inner["bn"] = sub["bn"]
        tree["l0"] = {"conv": inner}
        out[col] = tree
    return out


def save_raw(path, params, batch_stats, meta):
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path),
        {"params": params, "batch_stats": batch_stats}, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


@pytest.mark.slow
def test_v1_checkpoint_loads_exactly(tmp_path):
    """A v1-layout tree stamped schema_version=1 migrates through the
    registry to the current fused layout bit-exactly."""
    model, _ = build_model(CFG, fused_csp=True)
    v_cur = init_model(model, jax.random.PRNGKey(5), img_size=64, batch=1)
    v_cur = {"params": v_cur["params"], "batch_stats": v_cur["batch_stats"]}

    v1 = defuse_focus(ckpt.defuse_c3(v_cur))
    p = str(tmp_path / "v1ckpt")
    save_raw(p, v1["params"], v1["batch_stats"],
             {"cfg": "tiny_psp2", "schema_version": 1})

    loaded, meta = ckpt.load_inference_variables(p)
    assert meta["schema_version"] == 1
    flat_cur = jax.tree_util.tree_leaves_with_path(v_cur)
    flat_new = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_cur) == len(flat_new)
    for (pa, a), (pb, b) in zip(flat_cur, flat_new):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_future_version_refuses():
    with pytest.raises(ValueError, match="newer than this code"):
        ckpt.migrate_to_version({"params": {}}, ckpt.SCHEMA_VERSION + 1)


def test_save_stamps_version_and_layout(tmp_path):
    from desenet_tpu.train import create_train_state
    from desenet_tpu.train.optim import OptimConfig

    model, _ = build_model(CFG, fused_csp=False)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64, batch=1)
    state = create_train_state(variables, OptimConfig(lr0=0.01))
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, epoch=0, best_fitness=0.0,
                         meta={"cfg": "tiny_psp2", "de_nc": 3, "se_nc": 2})
    with open(os.path.join(p, "meta.json")) as f:
        meta = json.load(f)
    assert meta["schema_version"] == ckpt.SCHEMA_VERSION
    assert meta["layout"] == {"focus": "fused", "c3": "unfused"}

    # loading applies the C3 inference fusion to the unfused training tree
    loaded, _ = ckpt.load_inference_variables(p)
    assert ckpt._has_key(loaded["params"], "cv12")


def test_strip_preserves_version(tmp_path):
    from desenet_tpu.train import create_train_state
    from desenet_tpu.train.optim import OptimConfig

    model, _ = build_model(CFG, fused_csp=False)
    variables = init_model(model, jax.random.PRNGKey(1), img_size=64, batch=1)
    state = create_train_state(variables, OptimConfig(lr0=0.01))
    p = str(tmp_path / "full")
    q = str(tmp_path / "stripped")
    ckpt.save_checkpoint(p, state, 0, 0.0, meta={"cfg": "tiny_psp2"})
    ckpt.strip_checkpoint(p, q)
    with open(os.path.join(q, "meta.json")) as f:
        meta = json.load(f)
    assert meta["schema_version"] == ckpt.SCHEMA_VERSION
    loaded, _ = ckpt.load_inference_variables(q)
    assert ckpt._has_key(loaded["params"], "cv12")
