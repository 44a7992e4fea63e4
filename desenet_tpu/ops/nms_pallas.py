"""Pallas TPU kernel: batched greedy NMS.

Why a kernel: the XLA formulation (ops/nms.py) lowers the greedy loop to
max_det sequential HLO while-iterations; at batch 128 that costs ~29 ms per
batch — by far the hottest non-conv op in the inference program. Here the
whole selection runs inside ONE Mosaic kernel:

- all images advance together: every iteration does per-row argmax, one-hot
  box gather, a vectorized IoU row, and suppression on (B, K) VMEM arrays
  (pure VPU work, no per-iteration dispatch);
- early exit: a while-loop terminates when no image has a live candidate, so
  cost tracks the true detection count instead of always paying max_det;
- boxes live as four (B, K) planes (lane-major K), avoiding the (K, 4)
  layout's 32x lane waste.

Outputs (keep_idx, keep_scores) feed a plain XLA gather. Exact greedy
semantics — same keep-set as torchvision.ops.nms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, sc_ref,
                idx_ref, ksc_ref, live_ref, max_det: int, iou_thres: float):
    b, k = sc_ref.shape
    live_ref[:] = sc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    area = jnp.maximum(x2_ref[:] - x1_ref[:], 0.0) * jnp.maximum(
        y2_ref[:] - y1_ref[:], 0.0
    )

    def cond(state):
        i, any_live = state
        return (i < max_det) & any_live

    def body(state):
        i, _ = state
        s = live_ref[:]
        best = jnp.max(s, axis=1, keepdims=True)  # (B, 1)
        bidx = jnp.argmax(s, axis=1)[:, None]  # (B, 1)
        onehot = (lane == bidx).astype(jnp.float32)
        ok = best[:, 0] > 0.0  # (B,)

        bx1 = jnp.sum(x1_ref[:] * onehot, axis=1, keepdims=True)
        by1 = jnp.sum(y1_ref[:] * onehot, axis=1, keepdims=True)
        bx2 = jnp.sum(x2_ref[:] * onehot, axis=1, keepdims=True)
        by2 = jnp.sum(y2_ref[:] * onehot, axis=1, keepdims=True)
        barea = jnp.sum(area * onehot, axis=1, keepdims=True)

        iw = jnp.maximum(
            jnp.minimum(bx2, x2_ref[:]) - jnp.maximum(bx1, x1_ref[:]), 0.0
        )
        ih = jnp.maximum(
            jnp.minimum(by2, y2_ref[:]) - jnp.maximum(by1, y1_ref[:]), 0.0
        )
        inter = iw * ih
        iou = inter / (barea + area - inter + 1e-9)
        suppress = (iou > iou_thres) | (lane == bidx)

        # outputs are (max_det, B): row stores keep the dynamic index on the
        # sublane dim (dynamic *lane* indexing is not supported by Mosaic)
        idx_ref[i, :] = jnp.where(ok, bidx[:, 0], 0).astype(jnp.int32)
        ksc_ref[i, :] = jnp.where(ok, best[:, 0], -1.0)
        live_ref[:] = jnp.where(suppress & ok[:, None], -1.0, s)
        return i + 1, jnp.any(live_ref[:] > 0.0)

    idx_ref[:] = jnp.zeros((max_det, b), jnp.int32)
    ksc_ref[:] = jnp.full((max_det, b), -1.0, jnp.float32)
    jax.lax.while_loop(cond, body, (0, jnp.any(sc_ref[:] > 0.0)))


@functools.partial(
    jax.jit, static_argnames=("iou_thres", "max_det", "interpret")
)
def greedy_nms_pallas(boxes, scores, iou_thres: float, max_det: int,
                      interpret: bool = False):
    """boxes (B, K, 4) xyxy (class-offset applied), scores (B, K) with
    invalid candidates at <= 0. Returns (keep_idx (B, max_det) int32,
    keep_scores (B, max_det) — valid where > 0)."""
    b, k, _ = boxes.shape
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    planes = [boxes[:, :, i] for i in range(4)]

    kernel = functools.partial(_nms_kernel, max_det=max_det,
                               iou_thres=iou_thres)
    idx_t, ksc_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((max_det, b), jnp.int32),
            jax.ShapeDtypeStruct((max_det, b), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((b, k), jnp.float32)],
        interpret=interpret,
    )(*planes, scores)
    return idx_t.T, ksc_t.T
