"""YOLO detection loss, reformulated for fixed shapes under jit.

Semantics mirror the reference ComputeLoss (core/utils/loss.py:91-223):
anchor-ratio target assignment with +-0.5-cell neighbor expansion, CIoU box
loss, IoU-valued objectness BCE with per-scale balance [4.0, 1.0, 0.4],
label-smoothed cls BCE, loss scaled by batch size.

JIT reformulation: the reference builds variable-length target lists
(loss.py:170-223). Here every (target, anchor, neighbor-offset) triple is a
*fixed-capacity slot* with a validity mask:

    candidates per scale = B * MAX_T * na * 5      (5 = center + 4 neighbors)

masked means replace data-dependent filtering. One deliberate delta: when two
targets claim the same (cell, anchor), the reference's tobj write order is
nondeterministic (last CUDA write wins); we use a deterministic scatter-max of
the IoU score. Targets arrive padded: (B, MAX_T, 5) [cls,x,y,w,h normalized]
plus (B, MAX_T) bool mask.

Focal-loss wrappers (loss.py:35-88) are applied elementwise when
fl_gamma > 0.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.ops.boxes import bbox_iou


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """Positive/negative label-smoothing targets (loss.py:13-15)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise torch BCEWithLogitsLoss (no reduction)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_n = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_n)


def focal_bce_with_logits(logits, targets, gamma: float, alpha: float = 0.25,
                          pos_weight: float = 1.0):
    """FocalLoss wrapper around BCE, TF-style modulation (loss.py:35-62)."""
    loss = bce_with_logits(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * (1.0 - p_t) ** gamma


def qfocal_bce_with_logits(logits, targets, gamma: float, alpha: float = 0.25,
                           pos_weight: float = 1.0):
    """Quality focal loss wrapper (loss.py:65-88)."""
    loss = bce_with_logits(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * jnp.abs(targets - p) ** gamma


def bce_blur_with_logits(logits, targets, alpha: float = 0.05):
    """Missing-label-tolerant BCE (loss.py:18-32; unused by the default
    recipe but part of the loss library). Returns the mean."""
    loss = bce_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    dx = p - targets
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return jnp.mean(loss * alpha_factor)


@dataclasses.dataclass(frozen=True)
class DetectionLoss:
    """Functional ComputeLoss. Construct once per model; call inside jit.

    anchors: (nl, na, 2) in *grid units* (pixel anchors / stride, matching
    Detect.anchors_grid_units()).
    """

    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]
    nc: int
    box_gain: float = 0.05
    obj_gain: float = 0.7  # called with engine-adjusted gains (train.py:258-260)
    cls_gain: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    label_smoothing: float = 0.0
    fl_gamma: float = 0.0
    anchor_t: float = 4.0
    gr: float = 1.0
    balance: Tuple[float, ...] = (4.0, 1.0, 0.4)

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0])

    def _bce(self, logits, targets, pos_weight):
        if self.fl_gamma > 0:
            return focal_bce_with_logits(logits, targets, self.fl_gamma,
                                         pos_weight=pos_weight)
        return bce_with_logits(logits, targets, pos_weight)

    def __call__(self, preds: Sequence[jax.Array], targets: jax.Array,
                 target_mask: jax.Array):
        """preds: per-scale (B, na, ny, nx, no) raw logits.
        targets: (B, M, 5) [cls, x, y, w, h] normalized; target_mask: (B, M).
        Returns (total_loss, (lbox, lobj, lcls)) with total = sum * B
        (loss.py:166-168 convention)."""
        B, M = targets.shape[:2]
        na = self.na
        cp, cn = smooth_bce(self.label_smoothing)

        # flatten batch targets and attach image indices
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M)).reshape(-1)
        t_cls = targets[..., 0].reshape(-1)
        t_xywh = targets[..., 1:5].reshape(-1, 4)
        t_valid = target_mask.reshape(-1)
        n_flat = B * M

        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        lcls = jnp.zeros((), jnp.float32)

        g = 0.5
        # candidate offsets: center, left, up, right, down (loss.py:179-182)
        offs = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]],
                        np.float32) * g

        for i, pi in enumerate(preds):
            pi = pi.astype(jnp.float32)
            _, _, ny, nx, no = pi.shape
            anchors_i = jnp.asarray(self.anchors[i], jnp.float32)  # (na,2)

            gxy = t_xywh[:, :2] * jnp.asarray([nx, ny], jnp.float32)  # (N,2)
            gwh = t_xywh[:, 2:] * jnp.asarray([nx, ny], jnp.float32)

            # anchor-ratio filter (loss.py:192-195): (N, na)
            r = gwh[:, None, :] / anchors_i[None]  # (N, na, 2)
            ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < self.anchor_t
            ratio_ok &= t_valid[:, None]

            # neighbor conditions (loss.py:198-204): (N,)
            frac = gxy % 1.0
            inv = jnp.asarray([nx, ny], jnp.float32) - gxy
            j_m = (frac[:, 0] < g) & (gxy[:, 0] > 1.0)
            k_m = (frac[:, 1] < g) & (gxy[:, 1] > 1.0)
            l_m = (inv[:, 0] % 1.0 < g) & (inv[:, 0] > 1.0)
            m_m = (inv[:, 1] % 1.0 < g) & (inv[:, 1] > 1.0)
            off_ok = jnp.stack(
                [jnp.ones_like(j_m), j_m, k_m, l_m, m_m], axis=1
            )  # (N, 5)

            # full candidate grid: (N, na, 5)
            valid = ratio_ok[:, :, None] & off_ok[:, None, :]
            K = n_flat * na * 5
            valid_f = valid.reshape(K).astype(jnp.float32)

            cand_xy = jnp.broadcast_to(
                gxy[:, None, None, :] - offs[None, None, :, :], (n_flat, na, 5, 2)
            )
            gij = jnp.floor(cand_xy).astype(jnp.int32)
            gi = jnp.clip(gij[..., 0], 0, nx - 1).reshape(K)
            gj = jnp.clip(gij[..., 1], 0, ny - 1).reshape(K)
            a_idx = jnp.broadcast_to(
                jnp.arange(na)[None, :, None], (n_flat, na, 5)
            ).reshape(K)
            bb = jnp.broadcast_to(b_idx[:, None, None], (n_flat, na, 5)).reshape(K)
            cc = jnp.broadcast_to(
                t_cls[:, None, None], (n_flat, na, 5)
            ).reshape(K).astype(jnp.int32)

            # regression targets: xy relative to assigned cell (loss.py:219)
            txy = (
                jnp.broadcast_to(gxy[:, None, None, :], (n_flat, na, 5, 2)).reshape(
                    K, 2
                )
                - jnp.stack([gi, gj], axis=-1).astype(jnp.float32)
            )
            twh = jnp.broadcast_to(
                gwh[:, None, None, :], (n_flat, na, 5, 2)
            ).reshape(K, 2)
            anc = anchors_i[a_idx]  # (K, 2)

            # gather predictions at assigned cells
            flat_idx = ((bb * na + a_idx) * ny + gj) * nx + gi
            ps = pi.reshape(-1, no)[flat_idx]  # (K, no)

            pxy = jax.nn.sigmoid(ps[:, :2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * anc
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            tbox = jnp.concatenate([txy, twh], axis=-1)
            iou = bbox_iou(pbox, tbox, x1y1x2y2=False, CIoU=True)  # (K,)

            n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
            lbox += jnp.sum((1.0 - iou) * valid_f) / n_valid

            # objectness target: deterministic scatter-max of detached IoU
            score = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
            score = (1.0 - self.gr) + self.gr * score
            score = jnp.where(valid_f > 0, score, -1.0)
            tobj = (
                jnp.full((B * na * ny * nx,), -1.0, jnp.float32)
                .at[flat_idx]
                .max(score)
            )
            tobj = jnp.clip(tobj, 0.0, None).reshape(B, na, ny, nx)
            obji = jnp.mean(self._bce(pi[..., 4], tobj, self.obj_pw))
            lobj += obji * self.balance[i]

            if self.nc > 1:
                t = jnp.full((K, self.nc), cn, jnp.float32)
                t = t.at[jnp.arange(K), cc].set(cp)
                cls_l = self._bce(ps[:, 5:], t, self.cls_pw)  # (K, nc)
                lcls += jnp.sum(cls_l * valid_f[:, None]) / (n_valid * self.nc)

        lbox *= self.box_gain
        lobj *= self.obj_gain
        lcls *= self.cls_gain
        total = (lbox + lobj + lcls) * B
        return total, (lbox, lobj, lcls)
