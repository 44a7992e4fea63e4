"""Checkpoint save/restore (orbax) + inference export.

Reference semantics (train.py:426-444, general.py:753-766): checkpoint holds
{epoch, best_fitness, model, ema, updates, optimizer}; `strip` finalizes a
checkpoint for inference by promoting EMA weights and dropping train state.
Here a checkpoint is an orbax PyTree of numpy arrays plus a JSON meta file
(model config name / class names / hyp) so restore needs no pickled code.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


# ---------------------------------------------------------------------------
# Checkpoint schema versions. The version is stamped into meta.json at save
# and drives the migration registry at load; unversioned checkpoints (round-1
# era) fall back to structural sniffing (migrate_legacy).
#
#   v1: unfused Focus stem — params at l{i}/conv/{conv,bn} (commit 06adf72
#       replaced it with a fused 6x6 space-to-depth conv).
#   v2: fused Focus; C3 blocks stored in the unfused training layout
#       (separate cv1/cv2 — commit a74d1e3 made inference fuse them to cv12).
#   v3: v2 tree + explicit "layout" metadata ({focus, c3}) so loaders don't
#       have to sniff which graph the tree feeds. Current.
#
# MIGRATIONS[v] upgrades a v-layout variables tree to v+1. Each entry must be
# exact (bit-preserving up to dtype) and idempotent on already-migrated trees.
# ---------------------------------------------------------------------------
SCHEMA_VERSION = 3


def _to_numpy_tree(tree):
    """Batched device->host pull. jax.device_get starts every leaf's
    transfer asynchronously before blocking; a per-leaf np.asarray pays a
    full round trip PER LEAF, which on a remote-tunneled device turns each
    checkpoint save into minutes (~1500 leaves x ~70 ms RTT measured on the
    axon tunnel — the round-5 2-min/epoch regression)."""
    return jax.device_get(tree)


def _checkpointer() -> ocp.Checkpointer:
    """Checkpointer with PROCESS-LOCAL coordination. The default orbax
    Checkpointer barriers across every jax process on save AND restore;
    here only process 0 saves (the engine's host-0 artifact guard,
    reference train.py:393) while restores happen either on all processes
    (resume) or on process 0 alone (strip) — mismatched global barriers
    would deadlock. Payloads are plain host-numpy trees (no distributed
    arrays), so each process can act alone; the engine inserts its own
    explicit sync_hosts barriers at checkpoint boundaries."""
    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me}),
        )
    return ocp.PyTreeCheckpointer()


def _has_key(tree, key: str) -> bool:
    if not isinstance(tree, dict):
        return False
    return key in tree or any(_has_key(v, key) for v in tree.values())


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    best_fitness: float,
    meta: Optional[Dict[str, Any]] = None,
):
    """Write a full training checkpoint to `path` (a directory)."""
    path = os.path.abspath(path)
    # one batched pull across ALL state trees (see _to_numpy_tree)
    state = jax.device_get(state)
    payload = {
        "params": _to_numpy_tree(state.params),
        "batch_stats": _to_numpy_tree(state.batch_stats),
        "ema_params": _to_numpy_tree(state.ema_params),
        "ema_batch_stats": _to_numpy_tree(state.ema_batch_stats),
        "opt_state": _to_numpy_tree(state.opt_state),
        "accum_grads": _to_numpy_tree(state.accum_grads),
        "counters": {
            "ema_updates": np.asarray(state.ema_updates),
            "step": np.asarray(state.step),
            "last_opt_step": np.asarray(state.last_opt_step),
            "epoch": np.asarray(epoch),
            "best_fitness": np.asarray(best_fitness, np.float32),
        },
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    if meta is not None:
        meta = dict(meta)
        meta.setdefault("schema_version", SCHEMA_VERSION)
        meta.setdefault("layout", {
            "focus": "fused",
            "c3": "fused" if _has_key(payload["params"], "cv12")
            else "unfused",
        })
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    payload = ckptr.restore(path)
    meta_path = os.path.join(path, "meta.json")
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    payload["meta"] = meta
    return payload


def strip_checkpoint(path: str, out_path: str):
    """Finalize for inference: EMA -> model weights, drop optimizer/accum
    (general.py:753-766 strip_optimizer)."""
    payload = load_checkpoint(path)
    slim = {
        "params": payload["ema_params"] or payload["params"],
        "batch_stats": payload["ema_batch_stats"] or payload["batch_stats"],
    }
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(out_path), slim, force=True)
    if payload.get("meta") is not None:
        meta = dict(payload["meta"])
        meta.setdefault("schema_version", SCHEMA_VERSION)
        meta.setdefault("layout", {
            "focus": "fused",
            "c3": "fused" if _has_key(slim["params"], "cv12") else "unfused",
        })
        with open(os.path.join(os.path.abspath(out_path), "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)


def migrate_focus_params(variables):
    """Upgrade checkpoints saved with an unfused Focus stem (params under
    l{i}/conv/{conv,bn}) to the fused-conv layout (l{i}/{conv,bn}) via the
    exact space-to-depth weight rearrangement. Migration candidates are
    identified from the params tree (a nested ConvBnAct whose kernel input
    channels are 4x the raw image channels), then applied to every
    collection."""
    params = variables.get("params", {})
    migrate = set()
    for lname, sub in params.items():
        try:
            w = np.asarray(sub["conv"]["conv"]["conv2d"]["kernel"])
        except (KeyError, TypeError):
            continue
        if set(sub) == {"conv"} and w.ndim == 4 and w.shape[2] % 4 == 0:
            migrate.add(lname)
    if not migrate:
        return variables

    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for lname in migrate:
            if lname not in tree:
                continue
            inner = tree[lname]["conv"]  # Focus ConvBnAct: {conv:{conv2d},bn}
            new = {}
            if "conv" in inner:
                w4 = np.asarray(inner["conv"]["conv2d"]["kernel"])
                k, _, c4, o = w4.shape
                c = c4 // 4
                w6 = np.zeros((2 * k, 2 * k, c, o), w4.dtype)
                for oy in range(2):
                    for ox in range(2):
                        s = oy + 2 * ox
                        w6[oy::2, ox::2] = w4[:, :, c * s:c * (s + 1), :]
                new["conv"] = {"conv2d": {"kernel": w6}}
            if "bn" in inner:
                new["bn"] = inner["bn"]
            tree[lname] = new
        out[col] = tree
    return out


def migrate_unfused_c3(variables):
    """Upgrade checkpoints with the unfused C3 layout (separate cv1/cv2
    ConvBnActs) to the fused cv12/bn12 layout (models/layers.py C3) by
    concatenating kernels along O and BN params per channel — exact."""
    params = variables.get("params", {})

    def is_bottleneck(m):
        # C3's inner stack is Bottleneck (cv1 1x1 -> cv2 3x3). C3Ghost/C3TR
        # share the cv1/cv2/cv3/m_0 outer layout but their m_0 is a
        # GhostBottleneck/TransformerBlock with no fused-cv12 target — they
        # must NOT be migrated.
        if not isinstance(m, dict):
            return False
        try:
            k1 = m["cv1"]["conv"]["conv2d"]["kernel"]
            k2 = m["cv2"]["conv"]["conv2d"]["kernel"]
        except (TypeError, KeyError):
            return False
        return (tuple(np.shape(k1)[:2]) == (1, 1)
                and tuple(np.shape(k2)[:2]) == (3, 3))

    def find_sites(d, path=()):
        for k, v in d.items():
            if isinstance(v, dict):
                if ("cv1" in v and "cv2" in v and "cv3" in v and "m_0" in v
                        and "cv4" not in v
                        and isinstance(v.get("cv1"), dict)
                        and "conv" in v["cv1"]
                        and isinstance(v.get("cv2"), dict)
                        and "conv" in v["cv2"]
                        and is_bottleneck(v["m_0"])):
                    yield path + (k,)
                yield from find_sites(v, path + (k,))

    sites = list(find_sites(params))
    if not sites:
        return variables

    def deep_copy(d):
        return {k: deep_copy(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    out = {col: deep_copy(tree) for col, tree in variables.items()}
    for col, tree in out.items():
        for site in sites:
            sub = tree
            ok = True
            for s in site:
                if not isinstance(sub, dict) or s not in sub:
                    ok = False
                    break
                sub = sub[s]
            if not ok or "cv1" not in sub or "cv2" not in sub:
                continue
            cv1 = sub.pop("cv1")
            cv2 = sub.pop("cv2")
            if col == "params" and "conv" in cv1:
                k = np.concatenate(
                    [np.asarray(cv1["conv"]["conv2d"]["kernel"]),
                     np.asarray(cv2["conv"]["conv2d"]["kernel"])], axis=-1,
                )
                sub["cv12"] = {"conv2d": {"kernel": k}}
            if "bn" in cv1:
                bn = {
                    kk: np.concatenate(
                        [np.asarray(cv1["bn"]["bn"][kk]),
                         np.asarray(cv2["bn"]["bn"][kk])], axis=0,
                    )
                    for kk in cv1["bn"]["bn"]
                }
                sub["bn12"] = {"bn": bn}
    return out


def defuse_c3(variables):
    """Inverse of migrate_unfused_c3: split fused cv12/bn12 C3 blocks back
    into cv1/cv2 ConvBnActs (the layout the training graph prefers)."""
    params = variables.get("params", {})

    def find_sites(d, path=()):
        for k, v in d.items():
            if isinstance(v, dict):
                if "cv12" in v and "bn12" in v:
                    yield path + (k,)
                yield from find_sites(v, path + (k,))

    sites = list(find_sites(params))
    if not sites:
        return variables

    def deep_copy(d):
        return {k: deep_copy(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    out = {col: deep_copy(tree) for col, tree in variables.items()}
    for col, tree in out.items():
        for site in sites:
            sub = tree
            ok = True
            for s in site:
                if not isinstance(sub, dict) or s not in sub:
                    ok = False
                    break
                sub = sub[s]
            if not ok:
                continue
            if col == "params" and "cv12" in sub:
                w = np.asarray(sub.pop("cv12")["conv2d"]["kernel"])
                half = w.shape[-1] // 2
                sub.setdefault("cv1", {})["conv"] = {
                    "conv2d": {"kernel": w[..., :half]}
                }
                sub.setdefault("cv2", {})["conv"] = {
                    "conv2d": {"kernel": w[..., half:]}
                }
            if "bn12" in sub:
                bn = sub.pop("bn12")["bn"]
                h = {k: np.asarray(v).shape[0] // 2 for k, v in bn.items()}
                sub.setdefault("cv1", {})["bn"] = {
                    "bn": {k: np.asarray(v)[: h[k]] for k, v in bn.items()}
                }
                sub.setdefault("cv2", {})["bn"] = {
                    "bn": {k: np.asarray(v)[h[k]:] for k, v in bn.items()}
                }
    return out


def migrate_legacy(variables):
    """All checkpoint-layout migrations (fused Focus stem, fused C3)."""
    return migrate_unfused_c3(migrate_focus_params(variables))


# version v -> upgrade fn producing a (v+1)-layout tree. v2->v3 added only
# the meta "layout" field; the tree is unchanged.
MIGRATIONS = {
    1: migrate_focus_params,
    2: lambda variables: variables,
}


def migrate_to_version(variables, from_version: int,
                       to_version: int = SCHEMA_VERSION):
    """Upgrade a versioned variables tree through the migration registry."""
    v = int(from_version)
    if v > SCHEMA_VERSION:
        raise ValueError(
            f"checkpoint schema v{v} is newer than this code "
            f"(v{SCHEMA_VERSION}); upgrade desenet_tpu to load it")
    while v < to_version:
        if v not in MIGRATIONS:
            raise ValueError(f"no migration registered for schema v{v}")
        variables = MIGRATIONS[v](variables)
        v += 1
    return variables


def load_inference_variables(path: str):
    """Load variables for model.apply from either a stripped or full ckpt,
    preferring EMA weights (experimental.py:85-108 attempt_load
    semantics). Versioned checkpoints upgrade through the migration
    registry; unversioned (round-1) layouts are sniffed structurally. The
    C3 train->inference fusion then runs on the upgraded tree (it is a
    graph-layout transform, not a schema migration, and is a no-op on
    already-fused trees)."""
    payload = load_checkpoint(path)
    params = payload.get("ema_params") or payload.get("params")
    stats = payload.get("ema_batch_stats") or payload.get("batch_stats")
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    meta = payload.get("meta")
    version = (meta or {}).get("schema_version")
    if version is None:
        return migrate_legacy(variables), meta
    variables = migrate_to_version(variables, version)
    if ((meta or {}).get("layout", {}).get("c3") or "unfused") == "unfused":
        variables = migrate_unfused_c3(variables)
    return variables, meta


def intersect_trees(src, dst):
    """Transfer-learning weight intersection by path+shape
    (torch_utils.py:151-157): take src leaves whose path exists in dst with a
    matching shape, else keep dst's."""
    from flax import traverse_util

    fsrc = traverse_util.flatten_dict(src)
    fdst = traverse_util.flatten_dict(dst)
    n = 0
    out = {}
    for k, v in fdst.items():
        sv = fsrc.get(k)
        if sv is not None and tuple(np.shape(sv)) == tuple(np.shape(v)):
            out[k] = np.asarray(sv, dtype=np.asarray(v).dtype)
            n += 1
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out), n
