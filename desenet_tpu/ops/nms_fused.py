"""Pallas TPU kernel: fused candidate-selection + greedy NMS over ALL anchors.

Why: the production NMS path (ops/nms.py) pays ~6.9 ms of its ~7.9 ms at
b128 in candidate *prep* — approx_max_k over (B, A) scores (~1.5 ms) and,
dominating, the (B, pre_topk) row gather (~4.4 ms; TPU gathers of small rows
are descriptor-bound regardless of formulation — vmap indexing,
take_along_axis and one-hot matmul all measured 4-6 ms). The greedy kernel
itself costs ~1 ms.

This kernel removes the top-k and the gather entirely: the decoded
predictions are laid out as six dense (B, A) f32 planes (x1/y1/x2/y2 with
the class offset applied, score, class) — dense lane-major layout, no
padding blowup — and ONE kernel per image runs greedy selection directly on
the full candidate set:

  pick = argmax(score) while score > 0 and picks < max_det
  extract the picked box via one-hot reduction (dynamic lane indexing is
  not supported by Mosaic), store an output row, vector-IoU suppress.

Cost is data-dependent: ~475 VPU cycles per pick plus a single streaming
pass over the planes (77 MB at b128 ≈ 0.12 ms). With no candidate above
conf_thres an image costs one reduction. This is also EXACTER than the
top-k path: no pre_topk cap — the keep-set equals torchvision greedy NMS
over all candidates (the reference caps at max_nms=30000,
general.py:659-750; A=25200 < 30000 so the cap never binds).

Used by the single-label production path (detect/bench/entry). The
multi-label val path keeps ops/nms.py (per-(anchor,class) candidate pairs
don't fit the one-score-per-anchor plane model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from desenet_tpu.ops.boxes import xywh2xyxy

LANES = 128


def _fused_kernel(x1_ref, y1_ref, x2_ref, y2_ref, sc_ref, cl_ref,
                  out_ref, scr_ref, area_ref,
                  max_det: int, iou_thres: float):
    x1 = x1_ref[0]
    y1 = y1_ref[0]
    x2 = x2_ref[0]
    y2 = y2_ref[0]
    r, l = x1.shape
    scr_ref[:] = sc_ref[0]
    area_ref[:] = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, l), 0)
    flat = row * l + lane
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    out_ref[0] = jnp.zeros((max_det, LANES), jnp.float32)

    def cond(state):
        i, any_live = state
        return (i < max_det) & any_live

    def body(state):
        i, _ = state
        sc = scr_ref[:]
        m = jnp.max(sc)
        # first-index-of-max (jnp.argmax tie order) as a one-hot plane
        jf = jnp.min(jnp.where(sc == m, flat, r * l))
        onehot = (flat == jf).astype(jnp.float32)

        bx1 = jnp.sum(x1 * onehot)
        by1 = jnp.sum(y1 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        by2 = jnp.sum(y2 * onehot)
        bcl = jnp.sum(cl_ref[0] * onehot)
        barea = jnp.sum(area_ref[:] * onehot)

        row_vec = (bx1 * (out_lane == 0) + by1 * (out_lane == 1)
                   + bx2 * (out_lane == 2) + by2 * (out_lane == 3)
                   + m * (out_lane == 4) + bcl * (out_lane == 5))
        out_ref[0, pl.ds(i, 1), :] = row_vec.astype(jnp.float32)

        iw = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0)
        inter = iw * ih
        iou = inter / (barea + area_ref[:] - inter + 1e-9)
        scr_ref[:] = jnp.where((iou > iou_thres) | (flat == jf), -1.0, sc)
        return i + 1, jnp.max(scr_ref[:]) > 0.0

    jax.lax.while_loop(cond, body, (0, jnp.max(scr_ref[:]) > 0.0))


@functools.partial(jax.jit, static_argnames=("max_det", "iou_thres",
                                             "interpret"))
def _run_kernel(planes, max_det: int, iou_thres: float,
                interpret: bool = False):
    b, r, l = planes[0].shape
    kernel = functools.partial(_fused_kernel, max_det=max_det,
                               iou_thres=iou_thres)
    spec = pl.BlockSpec((1, r, l), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, max_det, LANES), jnp.float32),
        in_specs=[spec] * 6,
        out_specs=pl.BlockSpec((1, max_det, LANES), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((r, l), jnp.float32),
                        pltpu.VMEM((r, l), jnp.float32)],
        interpret=interpret,
    )(*planes)


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "agnostic",
                     "classes", "max_wh", "interpret"),
)
def fused_select_nms(prediction, conf_thres: float, iou_thres: float,
                     max_det: int, agnostic: bool = False, classes=None,
                     max_wh: float = 4096.0, interpret: bool = False):
    """Single-label NMS over the full (B, A, 5+nc) decode, no top-k cap.

    Returns (boxes (B, max_det, 4) xyxy, scores (B, max_det),
    classes (B, max_det), valid (B, max_det) bool) with invalid rows zeroed
    (class -1), matching ops/nms.py output conventions.
    """
    p = prediction.astype(jnp.float32)
    b, a, _ = p.shape
    obj = p[..., 4]
    cls_conf = p[..., 5:] * obj[..., None]  # conf = obj * cls (general.py:703)
    best_conf = jnp.max(cls_conf, axis=-1)
    best_cls_i = jnp.argmax(cls_conf, axis=-1)
    best_cls = best_cls_i.astype(jnp.float32)
    ok = (obj > conf_thres) & (best_conf > conf_thres)  # general.py:668,707
    if classes is not None:
        nc = p.shape[-1] - 5
        allowed = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
        ok = ok & allowed[best_cls_i]
    score = jnp.where(ok, best_conf, -1.0)

    box = xywh2xyxy(p[..., :4])
    offset = jnp.where(agnostic, 0.0, best_cls * max_wh)
    x1 = box[..., 0] + offset
    y1 = box[..., 1] + offset
    x2 = box[..., 2] + offset
    y2 = box[..., 3] + offset

    # pad A to a lane multiple; padded candidates carry score -1
    ap = (a + LANES - 1) // LANES * LANES
    pad = ap - a

    def prep(v, fill):
        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=fill)
        return v.reshape(b, ap // LANES, LANES)

    planes = [prep(x1, 0.0), prep(y1, 0.0), prep(x2, 0.0), prep(y2, 0.0),
              prep(score, -1.0), prep(best_cls, 0.0)]
    out = _run_kernel(planes, max_det, iou_thres, interpret=interpret)

    out_scores = out[..., 4]
    valid = out_scores > 0.0
    out_cls_off = out[..., 5]
    off = jnp.where(agnostic, 0.0, out_cls_off * max_wh)
    out_boxes = jnp.where(valid[..., None], out[..., :4] - off[..., None],
                          0.0)
    out_cls = jnp.where(valid, out_cls_off, -1.0)
    out_scores = jnp.where(valid, out_scores, 0.0)
    return out_boxes, out_scores, out_cls, valid
