"""Loss parity: fixed-capacity JAX detection loss vs reference golden;
seg CE vs torch oracle."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from desenet_tpu.losses import DetectionLoss, segmentation_loss

HERE = os.path.dirname(os.path.abspath(__file__))

torch = pytest.importorskip("torch")


def pad_targets(tg, batch, max_t=32):
    """(n,6) [img,cls,xywh] -> padded (B, M, 5) + mask."""
    out = np.zeros((batch, max_t, 5), np.float32)
    mask = np.zeros((batch, max_t), bool)
    for b in range(batch):
        rows = tg[tg[:, 0] == b][:, 1:6]
        out[b, : len(rows)] = rows
        mask[b, : len(rows)] = True
    return out, mask


def test_detection_loss_matches_reference_golden():
    z = np.load(os.path.join(HERE, "goldens", "det_loss.npz"))
    preds = [jnp.asarray(z[f"p{i}"]) for i in range(3)]
    anchors = tuple(tuple(tuple(float(v) for v in a) for a in scale)
                    for scale in z["anchors"])
    loss_fn = DetectionLoss(anchors=anchors, nc=3)
    tg, mask = pad_targets(z["targets"], batch=4)
    total, (lbox, lobj, lcls) = loss_fn(preds, jnp.asarray(tg), jnp.asarray(mask))
    np.testing.assert_allclose(float(lbox), z["comps"][0], rtol=2e-5, atol=1e-6)
    # lobj tolerance is looser: when several targets claim one (cell, anchor)
    # the reference keeps an arbitrary writer (CUDA last-write), we keep the
    # max IoU — on this deliberately tiny 2x2-grid golden the collisions are
    # frequent; on real 80x80 grids they are rare.
    np.testing.assert_allclose(float(lobj), z["comps"][1], rtol=5e-4)
    np.testing.assert_allclose(float(lcls), z["comps"][2], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(total), float(z["total"]), rtol=5e-4)


def test_detection_loss_no_targets():
    anchors = (((1.25, 1.625), (2.0, 3.75), (4.125, 2.875)),
               ((1.875, 3.8125), (3.875, 2.8125), (3.6875, 7.4375)),
               ((3.625, 2.8125), (4.875, 6.1875), (11.65625, 10.1875)))
    loss_fn = DetectionLoss(anchors=anchors, nc=3)
    rng = np.random.default_rng(0)
    preds = [jnp.asarray(rng.standard_normal((2, 3, s, s, 8)).astype(np.float32))
             for s in (8, 4, 2)]
    tg = jnp.zeros((2, 8, 5))
    mask = jnp.zeros((2, 8), bool)
    total, (lbox, lobj, lcls) = loss_fn(preds, tg, mask)
    assert float(lbox) == 0.0  # no valid targets -> no box loss
    assert float(lcls) == 0.0
    assert float(lobj) > 0.0  # background obj BCE still applies
    assert np.isfinite(float(total))


@pytest.mark.parametrize("ignore", [False, True])
def test_seg_ce_matches_torch(rng, ignore):
    import torch.nn.functional as F

    B, H, W, C = 2, 16, 16, 3
    logits = rng.standard_normal((B, H, W, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, H, W))
    if ignore:
        labels[0, :4] = -1
    got = float(segmentation_loss(jnp.asarray(logits), jnp.asarray(labels)))
    exp = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
        ignore_index=-1,
    ).item()
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_seg_ce_aux_combo(rng):
    import torch.nn.functional as F

    B, H, W, C = 2, 8, 8, 3
    ps = [rng.standard_normal((B, H, W, C)).astype(np.float32) for _ in range(3)]
    labels = rng.integers(0, C, (B, H, W))
    got = float(segmentation_loss([jnp.asarray(p) for p in ps],
                                  jnp.asarray(labels), aux_weight=0.1))
    ce = lambda p: F.cross_entropy(
        torch.from_numpy(np.transpose(p, (0, 3, 1, 2))),
        torch.from_numpy(labels.astype(np.int64)),
    ).item()
    exp = ce(ps[0]) + 0.15 * ce(ps[1]) + 0.05 * ce(ps[2])
    np.testing.assert_allclose(got, exp, rtol=1e-6)
