"""Fused select+NMS Pallas kernel (ops/nms_fused.py) vs the top-k + greedy
oracle path (ops/nms.py XLA backend), interpret mode on CPU. The fused path
has no pre_topk cap, so with pre_topk >= candidate count the keep-sets must
be identical."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.ops.nms import non_max_suppression
from desenet_tpu.ops.nms_fused import fused_select_nms


def make_pred(rng, b=3, a=512, nc=6, dense=False):
    """Synthetic (B, A, 5+nc) decode: xywh pixel boxes + obj + cls logits."""
    cxy = rng.uniform(50, 600, (b, a, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (b, a, 2)).astype(np.float32)
    obj = rng.uniform(0, 1, (b, a, 1)).astype(np.float32)
    if not dense:
        obj[obj < 0.6] *= 0.05  # sparsify: most below conf
    cls = rng.uniform(0, 1, (b, a, nc)).astype(np.float32)
    return np.concatenate([cxy, wh, obj, cls], axis=-1)


def run_fused(pred, **kw):
    return fused_select_nms(jnp.asarray(pred), interpret=True, **kw)


def run_oracle(pred, conf_thres, iou_thres, max_det, agnostic=False,
               classes=None):
    return non_max_suppression(
        jnp.asarray(pred), conf_thres=conf_thres, iou_thres=iou_thres,
        max_det=max_det, pre_topk=pred.shape[1], agnostic=agnostic,
        classes=classes, backend="xla")


def assert_same(fused, oracle):
    fb, fs, fc, fv = [np.asarray(v) for v in fused]
    for b in range(fb.shape[0]):
        ov = np.asarray(oracle.valid[b])
        fvb = fv[b]
        assert fvb.sum() == ov.sum(), (b, fvb.sum(), ov.sum())
        n = int(ov.sum())
        np.testing.assert_allclose(fb[b][:n], np.asarray(oracle.boxes[b])[:n],
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(fs[b][:n],
                                   np.asarray(oracle.scores[b])[:n],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(fc[b][:n],
                                      np.asarray(oracle.classes[b])[:n])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    pred = make_pred(rng)
    fused = run_fused(pred, conf_thres=0.25, iou_thres=0.45, max_det=64)
    oracle = run_oracle(pred, 0.25, 0.45, 64)
    assert_same(fused, oracle)


def test_fused_dense_scene_max_det_cap():
    rng = np.random.default_rng(3)
    pred = make_pred(rng, a=1024, dense=True)
    fused = run_fused(pred, conf_thres=0.25, iou_thres=0.45, max_det=32)
    oracle = run_oracle(pred, 0.25, 0.45, 32)
    assert_same(fused, oracle)
    assert np.asarray(fused[3]).sum(axis=1).max() <= 32


def test_fused_empty():
    rng = np.random.default_rng(4)
    pred = make_pred(rng)
    pred[..., 4] = 0.0  # no candidate above conf
    boxes, scores, cls, valid = run_fused(pred, conf_thres=0.25,
                                          iou_thres=0.45, max_det=16)
    assert np.asarray(valid).sum() == 0
    assert np.all(np.asarray(boxes) == 0)
    assert np.all(np.asarray(cls) == -1)


def test_fused_agnostic_and_classes():
    rng = np.random.default_rng(5)
    pred = make_pred(rng, dense=True)
    for kw in ({"agnostic": True}, {"classes": (1, 3)}):
        fused = run_fused(pred, conf_thres=0.25, iou_thres=0.45, max_det=32,
                          **kw)
        oracle = run_oracle(pred, 0.25, 0.45, 32, **kw)
        assert_same(fused, oracle)
        if "classes" in kw:
            c = np.asarray(fused[2])[np.asarray(fused[3])]
            assert set(np.unique(c)) <= {1.0, 3.0}


def test_auto_backend_selects_fused_only_on_tpu():
    # on CPU the auto backend must NOT pick the compiled fused kernel
    rng = np.random.default_rng(6)
    pred = make_pred(rng, b=1, a=128)
    out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                              iou_thres=0.45, max_det=8)
    assert out.boxes.shape == (1, 8, 4)
