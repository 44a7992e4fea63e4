"""Vendored COCO bbox evaluator (eval/coco.py) vs hand-computed protocol
results (pycocotools is absent from this image; these cases are analytic
consequences of the published COCO protocol, matching what
pycocotools.cocoeval produces — reference usage: scripts/val.py:312-335)."""

import numpy as np
import pytest

from desenet_tpu.eval.coco import COCOGt, evaluate_coco


def make_gt(anns, imgs=(1,), cats=(1,)):
    return COCOGt({
        "images": [{"id": i} for i in imgs],
        "categories": [{"id": c} for c in cats],
        "annotations": [
            dict(id=k + 1, **a) for k, a in enumerate(anns)
        ],
    })


def det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(map(float, bbox)),
            "score": float(score)}


def test_perfect_detection():
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50])])
    stats = evaluate_coco(gt, [det(1, 1, [10, 10, 50, 50], 0.9)], quiet=True)
    assert stats[0] == pytest.approx(1.0)   # mAP@0.5:0.95
    assert stats[1] == pytest.approx(1.0)   # mAP@0.5
    assert stats[8] == pytest.approx(1.0)   # AR@100


def test_miss_is_zero():
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[10, 10, 50, 50])])
    stats = evaluate_coco(gt, [det(1, 1, [200, 200, 10, 10], 0.9)], quiet=True)
    assert stats[0] == pytest.approx(0.0)
    assert stats[1] == pytest.approx(0.0)


def test_partial_iou_counts_per_threshold():
    # det IoU vs gt = 0.6 exactly: matched at thresholds 0.50/0.55/0.60 only
    # -> mAP@0.5:0.95 = 3/10, AP@0.5 = 1, AP@0.75 = 0
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 100, 60])])
    stats = evaluate_coco(gt, [det(1, 1, [0, 0, 100, 100], 0.9)], quiet=True)
    # IoU = 6000 / (6000+10000-6000) = 0.6
    assert stats[0] == pytest.approx(0.3)
    assert stats[1] == pytest.approx(1.0)
    assert stats[2] == pytest.approx(0.0)


def test_fp_after_full_recall_does_not_hurt():
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10])])
    preds = [det(1, 1, [0, 0, 10, 10], 0.9),
             det(1, 1, [100, 100, 10, 10], 0.1)]
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[1] == pytest.approx(1.0)  # COCO quirk: trailing FPs ignored


def test_fp_before_tp_halves_ap():
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10])])
    preds = [det(1, 1, [100, 100, 10, 10], 0.9),   # FP first (higher score)
             det(1, 1, [0, 0, 10, 10], 0.1)]
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[1] == pytest.approx(0.5)


def test_crowd_match_is_ignored_not_fp():
    gt = make_gt([
        dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10]),
        dict(image_id=1, category_id=1, bbox=[50, 50, 100, 100], iscrowd=1),
    ])
    preds = [det(1, 1, [0, 0, 10, 10], 0.9),
             det(1, 1, [60, 60, 20, 20], 0.8)]  # inside crowd: ignored
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[1] == pytest.approx(1.0)


def test_category_mean():
    gt = make_gt(
        [dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10]),
         dict(image_id=1, category_id=2, bbox=[50, 50, 10, 10])],
        cats=(1, 2),
    )
    preds = [det(1, 1, [0, 0, 10, 10], 0.9)]  # cat 2 entirely missed
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[1] == pytest.approx(0.5)


def test_area_ranges():
    # 16x16 = 256 px^2 -> small; 200x200 -> large
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 16, 16]),
                  dict(image_id=1, category_id=1, bbox=[300, 300, 200, 200])])
    preds = [det(1, 1, [0, 0, 16, 16], 0.9),
             det(1, 1, [300, 300, 200, 200], 0.8)]
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[3] == pytest.approx(1.0)   # AP small
    assert stats[4] == pytest.approx(-1.0)  # AP medium: no gt in range
    assert stats[5] == pytest.approx(1.0)   # AP large


def test_maxdets_recall():
    # 2 gts, both detected; AR@1 can only count one of them
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10]),
                  dict(image_id=1, category_id=1, bbox=[50, 50, 10, 10])])
    preds = [det(1, 1, [0, 0, 10, 10], 0.9),
             det(1, 1, [50, 50, 10, 10], 0.8)]
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[6] == pytest.approx(0.5)  # AR@1
    assert stats[8] == pytest.approx(1.0)  # AR@100


def test_score_order_beats_insertion_order():
    # the higher-score det must win the gt even if listed second
    gt = make_gt([dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10])])
    preds = [det(1, 1, [1, 1, 10, 10], 0.3),   # decent IoU, low score
             det(1, 1, [0, 0, 10, 10], 0.9)]   # exact, high score
    stats = evaluate_coco(gt, preds, quiet=True)
    assert stats[2] == pytest.approx(1.0)  # AP@0.75 -> exact det matched


def test_img_ids_filter():
    gt = make_gt(
        [dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10]),
         dict(image_id=2, category_id=1, bbox=[0, 0, 10, 10])],
        imgs=(1, 2),
    )
    preds = [det(1, 1, [0, 0, 10, 10], 0.9)]  # image 2 missed
    full = evaluate_coco(gt, preds, quiet=True)
    only1 = evaluate_coco(gt, preds, img_ids=[1], quiet=True)
    assert full[8] == pytest.approx(0.5)
    assert only1[1] == pytest.approx(1.0)


def test_detection_in_gtless_category():
    """A detection for a category with no gt anywhere must count as a pure
    FP (regression: empty gt list produced a float g_ignore and crashed)."""
    gt = make_gt([{"image_id": 1, "category_id": 1,
                   "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0}],
                 cats=(1, 2))
    stats = evaluate_coco(gt, [
        det(1, 1, [0, 0, 10, 10], 0.9),   # perfect for cat 1
        det(1, 2, [20, 20, 5, 5], 0.8),   # cat 2 has no gt at all
    ], quiet=True)
    assert np.isclose(stats[1], 1.0)  # cat 2 has no gt -> excluded from mean
