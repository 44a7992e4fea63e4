"""Metric parity: mAP machinery and seg metrics vs reference semantics
(torch/numpy oracles in-test)."""

import numpy as np
import pytest

from desenet_tpu.utils.metrics import (
    ap_per_class,
    batch_intersection_union,
    batch_pix_accuracy,
    compute_ap,
    ConfusionMatrix,
    fitness,
    fitness_det_seg,
    match_predictions,
    SegMetrics,
)


def test_fitness_weights():
    x = np.array([[0.5, 0.6, 0.7, 0.4]])
    np.testing.assert_allclose(fitness(x), 0.1 * 0.7 + 0.9 * 0.4)
    np.testing.assert_allclose(
        fitness_det_seg(x, 0.8), 0.1 * 0.7 + 0.2 * 0.4 + 0.7 * 0.8
    )


def test_compute_ap_perfect_detector():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    ap, _, _ = compute_ap(recall, precision)
    np.testing.assert_allclose(ap, 1.0, atol=0.01)


def test_ap_per_class_simple():
    # 2 classes; class 0: 2 TPs of 2 labels; class 1: 1 TP 1 FP of 2 labels
    tp = np.array([[1], [1], [1], [0]], dtype=float)
    conf = np.array([0.9, 0.8, 0.7, 0.6])
    pred_cls = np.array([0.0, 0.0, 1.0, 1.0])
    target_cls = np.array([0.0, 0.0, 1.0, 1.0])
    p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap.shape == (2, 1)
    np.testing.assert_allclose(ap[0, 0], 1.0, atol=0.01)
    assert 0.4 < ap[1, 0] < 0.7  # 1 of 2 found (101-pt interp of the envelope)
    np.testing.assert_array_equal(classes, [0, 1])


def test_match_predictions_iou_thresholds():
    labels = np.array([[0, 0, 0, 10, 10]], dtype=float)
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9, 0],    # IoU 1.0 right class
            [0, 0, 10, 10, 0.8, 1],    # right box wrong class
            [5, 5, 15, 15, 0.7, 0],    # IoU ~0.19
        ],
        dtype=float,
    )
    iouv = np.linspace(0.5, 0.95, 10)
    correct = match_predictions(dets, labels, iouv)
    assert correct[0].all()
    assert not correct[1].any()
    assert not correct[2].any()


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(nc=2, conf=0.25, iou_thres=0.45)
    labels = np.array([[0, 0, 0, 10, 10], [1, 20, 20, 30, 30]], dtype=float)
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9, 0],      # correct class 0
            [20, 20, 30, 30, 0.9, 0],    # wrong class (pred 0, gt 1)
            [50, 50, 60, 60, 0.9, 1],    # background FN
        ],
        dtype=float,
    )
    cm.process_batch(dets, labels)
    assert cm.matrix[0, 0] == 1
    assert cm.matrix[0, 1] == 1
    assert cm.matrix[1, 2] == 1  # background FN for stray det
    assert cm.matrix.sum() == 3


def _torch_seg_oracle(logits_nchw, target, nclass):
    import torch

    out = torch.from_numpy(logits_nchw)
    t = torch.from_numpy(target)
    pred = out.max(1)[1].numpy().astype("int32")
    tnp = target.astype("int32")
    pixel_labeled = np.sum(tnp > 0)
    pixel_correct = np.sum((pred == tnp) * (tnp > 0))
    inter = pred * (pred == tnp)
    nbins = nclass - 1
    ai = np.histogram(inter, bins=nbins, range=(1, nclass))[0]
    ap_ = np.histogram(pred, bins=nbins, range=(1, nclass))[0]
    al = np.histogram(tnp, bins=nbins, range=(1, nclass))[0]
    return pixel_correct, pixel_labeled, ai, ap_ + al - ai


def test_seg_metrics_vs_oracle(rng):
    nclass = 3
    logits = rng.standard_normal((2, nclass, 32, 32)).astype(np.float32)
    target = rng.integers(0, nclass, (2, 32, 32)).astype(np.int64)
    pred_cls = logits.argmax(1)
    c, l = batch_pix_accuracy(pred_cls, target)
    i, u = batch_intersection_union(pred_cls, target, nclass)
    ec, el, ei, eu = _torch_seg_oracle(logits, target, nclass)
    assert (c, l) == (ec, el)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_array_equal(u, eu)

    m = SegMetrics(nclass)
    m.update(pred_cls, target)
    m.update(pred_cls, target)
    assert m.total_label == 2 * el
    assert 0 <= m.miou <= 1
    assert 0 <= m.pix_acc <= 1
