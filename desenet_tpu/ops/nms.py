"""Fixed-shape, on-device non-max suppression.

Replaces the reference's host-side dynamic-shape ``torchvision.ops.nms`` path
(core/utils/general.py:659-750) with an XLA/Pallas-compilable formulation:

- candidates are reduced to a static ``pre_topk`` set by score (the reference
  caps at max_nms=30000; at conf>thresh the live candidate count is far below
  our default cap — raise ``pre_topk`` for exact val parity runs)
- the class-offset trick (cls * 4096 added to coords, general.py:732) makes one
  class-agnostic pass equivalent to per-class NMS
- greedy suppression is exact (same keep-set as torchvision's sequential
  kernel) with two backends:
    'pallas' — one Mosaic kernel advancing the whole batch per iteration
               with early exit (ops/nms_pallas.py); default on TPU
    'xla'    — a lax.fori_loop of argmax-pick / mask-suppress steps; default
               elsewhere (and reference semantics oracle in tests)
- output is a fixed (max_det, 6) [xyxy, conf, cls] block plus a validity mask,
  so decode+NMS lives inside the same jit as the forward pass.

Merge-NMS (general.py:737-743) is dead code in the reference (merge=False
hard-coded) and is not implemented.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from desenet_tpu.ops.boxes import box_iou, xywh2xyxy

MAX_WH = 4096  # class-offset multiplier (general.py:675)

# Shipped pre_topk values — ONE source of truth for every production surface
# (__graft_entry__.entry, bench.py, api.Predictor). At detect-time
# conf_thres (0.25) the live candidate count is far below 1024 for any
# realistic scene (tests/test_ops_nms.py pins zero recall loss on a
# 600-candidate dense scene, where 512 measurably loses detections).
PRE_TOPK_PRODUCTION = 1024
# Val runs at conf_thres=0.001 with multi_label=True, so the candidate set is
# much denser: a trained yolov5s_seg at 640px produces ~7-8k multi-label
# pairs above 0.001 on synthetic scenes — 4096 measurably truncated the
# low-conf tail vs the reference's max_nms=30000 cap (general.py:659-750)
# and moved mAP50 by ~1.5% at s-scale. 16384 restores headroom; the val
# greedy loop still runs on the top-`max_det` slice cost-wise.
PRE_TOPK_VAL = 16384


class NMSOutput(NamedTuple):
    boxes: jax.Array  # (B, max_det, 4) xyxy
    scores: jax.Array  # (B, max_det)
    classes: jax.Array  # (B, max_det) float class ids
    valid: jax.Array  # (B, max_det) bool
    num: jax.Array  # (B,) int32 number of valid detections


def _greedy_nms(boxes, scores, iou_thres, max_det):
    """Sequential greedy NMS on a fixed-size candidate set (XLA backend).

    boxes: (K,4) xyxy (already class-offset), scores: (K,) with invalid
    candidates at -1. Returns indices (max_det,) into the candidate set and a
    keep mask (max_det,).
    """
    k = boxes.shape[0]

    def body(i, state):
        live_scores, keep_idx, keep_ok = state
        j = jnp.argmax(live_scores)
        best = live_scores[j]
        ok = best > 0.0
        keep_idx = keep_idx.at[i].set(j)
        keep_ok = keep_ok.at[i].set(ok)
        # IoU of the chosen box vs every candidate
        iou = box_iou(boxes[j][None, :], boxes)[0]  # (K,)
        suppress = (iou > iou_thres) | (jnp.arange(k) == j)
        live_scores = jnp.where(ok & suppress, -1.0, live_scores)
        return live_scores, keep_idx, keep_ok

    keep_idx = jnp.zeros((max_det,), dtype=jnp.int32)
    keep_ok = jnp.zeros((max_det,), dtype=bool)
    _, keep_idx, keep_ok = jax.lax.fori_loop(
        0, max_det, body, (scores, keep_idx, keep_ok)
    )
    return keep_idx, keep_ok


def _prep_candidates(pred, conf_thres, pre_topk, multi_label, nc,
                     classes=None):
    """Per-image candidate selection: (A, 5+nc) -> top (K,4)/(K,)/(K,)."""
    obj = pred[:, 4]
    cand = obj > conf_thres  # general.py:668
    box = xywh2xyxy(pred[:, :4])  # (A,4)
    cls_conf = pred[:, 5:] * obj[:, None]  # conf = obj * cls (general.py:703)
    # class filter BEFORE suppression like the reference (general.py:712):
    # multi-label drops the (anchor, class) pair; single-label drops the row
    # when its best class is excluded (best is computed over ALL classes)
    allowed = None
    if classes is not None:
        allowed = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)

    if multi_label and nc > 1:
        keep = cand[:, None] & (cls_conf > conf_thres)
        if allowed is not None:
            keep = keep & allowed[None, :]
        scores_mat = jnp.where(keep, cls_conf, -1.0)  # (A, nc)
        flat_scores = scores_mat.reshape(-1)
        # approx_max_k(recall=1.0) returns the exact top-k SET via TPU
        # PartialReduce, ~15% faster than the sort-based top_k (keep-set
        # equality fuzz-verified in tests/test_ops_nms.py)
        top_scores, top_flat = jax.lax.approx_max_k(flat_scores, pre_topk,
                                                    recall_target=1.0)
        anchor_idx = top_flat // nc
        cls_idx = (top_flat % nc).astype(jnp.float32)
        top_boxes = box[anchor_idx]
    else:
        best_conf = jnp.max(cls_conf, axis=1)
        best_cls_i = jnp.argmax(cls_conf, axis=1)
        best_cls = best_cls_i.astype(jnp.float32)
        row_ok = cand & (best_conf > conf_thres)
        if allowed is not None:
            row_ok = row_ok & allowed[best_cls_i]
        scores = jnp.where(row_ok, best_conf, -1.0)
        top_scores, anchor_idx = jax.lax.approx_max_k(scores, pre_topk,
                                                      recall_target=1.0)
        cls_idx = best_cls[anchor_idx]
        top_boxes = box[anchor_idx]
    return top_boxes, top_scores, cls_idx


def _merge_scale_candidates(per_scale, pre_topk):
    """Merge per-scale candidate sets into the global top-pre_topk.

    per_scale: list of (boxes (B,k,4), scores (B,k), cls (B,k)). Because each
    scale contributed its own exact top-min(pre_topk, A_s) set, the union is
    a superset of the global top-pre_topk — the final top_k is EXACT while
    never materializing the concatenated (B, sum_s A_s, 5+nc) decode tensor
    (the reference concatenates all scales before NMS, yolo.py:277)."""
    boxes = jnp.concatenate([p[0] for p in per_scale], axis=1)
    scores = jnp.concatenate([p[1] for p in per_scale], axis=1)
    cls = jnp.concatenate([p[2] for p in per_scale], axis=1)
    k = min(pre_topk, scores.shape[1])
    top_scores, idx = jax.lax.approx_max_k(scores, k, recall_target=1.0)
    take = jax.vmap(lambda a, i: a[i])
    return take(boxes, idx), top_scores, take(cls, idx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_thres",
        "iou_thres",
        "max_det",
        "pre_topk",
        "multi_label",
        "agnostic",
        "backend",
    ),
)
def non_max_suppression(
    prediction,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_topk: int = PRE_TOPK_PRODUCTION,
    multi_label: bool = False,
    agnostic: bool = False,
    classes=None,  # static sequence of allowed class ids (general.py:712)
    backend: str = "auto",
) -> NMSOutput:
    """Batched fixed-shape NMS.

    prediction: (B, A, 5+nc) decoded predictions in pixel xywh + obj + cls
    (the Detect head's flattened inference output, yolo.py:275-277), OR a
    LIST of per-scale (B, A_s, 5+nc) arrays — then candidate selection runs
    scale-locally and only tiny top-k sets are merged (exact same candidate
    set; skips the big decode concat the reference materializes).
    """
    preds = prediction if isinstance(prediction, (list, tuple)) else [prediction]
    nc = preds[0].shape[2] - 5
    total = sum(p.shape[1] for p in preds)
    pre_topk = min(pre_topk, total * (nc if multi_label else 1))
    if backend == "auto":
        # single-label single-array predictions take the fused Pallas
        # select+NMS kernel: no top-k cap (exacter than pre_topk — matches
        # the reference's max_nms=30000 which never binds at A=25200) and
        # ~6 ms faster at b128 (ops/nms_fused.py). Multi-label (val) keeps
        # the top-k path: per-(anchor,class) pairs don't fit one-score-
        # per-anchor planes.
        if (jax.default_backend() == "tpu" and not multi_label
                and len(preds) == 1):
            backend = "fused"
        else:
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if backend == "fused":
        from desenet_tpu.ops.nms_fused import fused_select_nms

        out_boxes, out_scores, out_cls, keep_ok = fused_select_nms(
            preds[0], conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, agnostic=agnostic,
            classes=tuple(classes) if classes is not None else None,
            max_wh=MAX_WH,
        )
        num = jnp.sum(keep_ok, axis=1).astype(jnp.int32)
        return NMSOutput(out_boxes, out_scores, out_cls, keep_ok, num)

    per_scale = []
    for p in preds:
        k_s = min(pre_topk, p.shape[1] * (nc if multi_label else 1))
        prep = functools.partial(
            _prep_candidates, conf_thres=conf_thres, pre_topk=k_s,
            multi_label=multi_label, nc=nc,
            classes=tuple(classes) if classes is not None else None,
        )
        per_scale.append(jax.vmap(prep)(p.astype(jnp.float32)))
    if len(per_scale) == 1:
        top_boxes, top_scores, cls_idx = per_scale[0]
    else:
        top_boxes, top_scores, cls_idx = _merge_scale_candidates(
            per_scale, pre_topk)

    offset = 0.0 if agnostic else MAX_WH
    nms_boxes = top_boxes + cls_idx[..., None] * offset

    if backend == "pallas":
        from desenet_tpu.ops.nms_pallas import greedy_nms_pallas

        keep_idx, keep_sc = greedy_nms_pallas(
            nms_boxes, top_scores, iou_thres, max_det
        )
        keep_ok = keep_sc > 0.0
    else:
        keep_idx, keep_ok = jax.vmap(
            functools.partial(_greedy_nms, iou_thres=iou_thres,
                              max_det=max_det)
        )(nms_boxes, top_scores)

    take = jax.vmap(lambda a, i: a[i])
    out_boxes = jnp.where(keep_ok[..., None], take(top_boxes, keep_idx), 0.0)
    out_scores = jnp.where(keep_ok, take(top_scores, keep_idx), 0.0)
    out_cls = jnp.where(keep_ok, take(cls_idx, keep_idx), -1.0)
    num = jnp.sum(keep_ok, axis=1).astype(jnp.int32)
    return NMSOutput(out_boxes, out_scores, out_cls, keep_ok, num)


def batched_nms(boxes, scores, classes, iou_thres=0.45, max_det=300, agnostic=False):
    """Class-aware greedy NMS on explicit (K,4)/(K,)/(K,) candidate arrays.

    Utility entry point (e.g. TTA ensembling). Invalid candidates should carry
    score <= 0.
    """
    offset = 0.0 if agnostic else MAX_WH
    nms_boxes = boxes + classes[:, None] * offset
    keep_idx, keep_ok = _greedy_nms(
        nms_boxes, jnp.where(scores > 0, scores, -1.0), iou_thres, max_det
    )
    return keep_idx, keep_ok
