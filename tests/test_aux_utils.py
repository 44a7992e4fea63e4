"""Auxiliary utilities: autoanchor, converters, profiling, checkpoint
intersection, callbacks, early stopping."""

import json
import os

import numpy as np
import pytest

from desenet_tpu.utils.autoanchor import (
    check_anchor_order,
    check_anchors,
    kmean_anchors,
)
from desenet_tpu.data.converters import labelme_json_to_txt, voc_xml_to_txt
from desenet_tpu.utils.callbacks import Callbacks
from desenet_tpu.utils.general import EarlyStopping, increment_path
from desenet_tpu.utils.profiling import fold_conv_bn, prune, sparsity


class FakeDS:
    def __init__(self, rng, n=200):
        self.shapes = rng.uniform(300, 700, (n, 2)).astype(np.float32)
        self.det_labels = [
            np.concatenate(
                [
                    rng.integers(0, 3, (4, 1)).astype(np.float32),
                    rng.uniform(0.3, 0.7, (4, 2)).astype(np.float32),
                    rng.uniform(0.05, 0.4, (4, 2)).astype(np.float32),
                ],
                axis=1,
            )
            for _ in range(n)
        ]


def test_anchor_order_flip():
    anchors = np.array([[[100, 100]], [[50, 50]], [[10, 10]]], np.float32)
    fixed = check_anchor_order(anchors, (8, 16, 32))
    assert fixed[0, 0, 0] == 10 and fixed[2, 0, 0] == 100


def test_kmeans_anchors_fitness(rng):
    ds = FakeDS(rng)
    k = kmean_anchors(ds.shapes, ds.det_labels, n=9, img_size=640, gen=100,
                      seed=0)
    assert k.shape == (9, 2)
    assert (k[:-1].prod(1) <= k[1:].prod(1)).all()  # sorted by area
    assert (k >= 2).all()


def test_check_anchors_keeps_good(rng):
    ds = FakeDS(rng)
    good = kmean_anchors(ds.shapes, ds.det_labels, n=9, img_size=640,
                         gen=50, seed=0).reshape(3, 3, 2)
    out, changed = check_anchors(ds, good, (8, 16, 32), imgsz=640)
    assert not changed


def test_check_anchors_fixes_bad(rng):
    ds = FakeDS(rng)
    bad = np.full((3, 3, 2), 2.5, np.float32)  # absurd tiny anchors
    out, changed = check_anchors(ds, bad, (8, 16, 32), imgsz=640)
    assert changed
    assert out.mean() > 10


def test_voc_converter(tmp_path):
    xml = """<annotation><size><width>100</width><height>200</height></size>
    <object><name>car</name><bndbox><xmin>10</xmin><ymin>20</ymin>
    <xmax>50</xmax><ymax>120</ymax></bndbox></object>
    <object><name>unknown</name><bndbox><xmin>1</xmin><ymin>1</ymin>
    <xmax>2</xmax><ymax>2</ymax></bndbox></object></annotation>"""
    src = tmp_path / "xml"
    src.mkdir()
    (src / "a.xml").write_text(xml)
    out = tmp_path / "txt"
    n = voc_xml_to_txt(str(src), str(out), {"car": 1})
    assert n == 1
    line = (out / "a.txt").read_text().strip().split()
    assert line[0] == "1"
    np.testing.assert_allclose(
        [float(v) for v in line[1:]], [0.3, 0.35, 0.4, 0.5], atol=1e-5
    )


def test_labelme_converter(tmp_path):
    data = {
        "imageWidth": 100,
        "imageHeight": 50,
        "shapes": [
            {"label": "road", "points": [[0, 0], [100, 0], [100, 50]]},
            {"label": "skip", "points": [[0, 0], [1, 1], [2, 2]]},
        ],
    }
    src = tmp_path / "json"
    src.mkdir()
    (src / "b.json").write_text(json.dumps(data))
    out = tmp_path / "txt"
    n = labelme_json_to_txt(str(src), str(out), {"road": 1})
    assert n == 1
    vals = (out / "b.txt").read_text().split()
    assert vals[0] == "1"
    assert float(vals[1]) == 0.0 and float(vals[4]) == 0.0
    assert float(vals[5]) == 1.0 and float(vals[6]) == 1.0


def test_fold_conv_bn_matches_composition(rng):
    k = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    gamma = rng.uniform(0.5, 2, 8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = rng.uniform(0.5, 2, 8).astype(np.float32)
    kf, bf = fold_conv_bn(k, None, gamma, beta, mean, var, eps=1e-3)
    # y = BN(conv(x)): check on a random conv output value decomposition
    z = rng.standard_normal(8).astype(np.float32)  # pretend conv output
    want = (z - mean) / np.sqrt(var + 1e-3) * gamma + beta
    got = z * (kf[0, 0, 0] / k[0, 0, 0]) + bf
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_prune_sparsity(rng):
    params = {"a": {"kernel": rng.standard_normal((4, 4, 8, 8)).astype(
        np.float32), "bias": rng.standard_normal(8).astype(np.float32)}}
    pruned = prune(params, 0.5)
    s = sparsity(pruned)
    assert 0.4 < s < 0.6
    assert (np.asarray(pruned["a"]["bias"]) == params["a"]["bias"]).all()


def test_callbacks_and_early_stopping():
    cb = Callbacks()
    calls = []
    cb.register_action("on_train_end", "t", lambda: calls.append(1))
    cb.run("on_train_end")
    assert calls == [1]
    with pytest.raises(AssertionError):
        cb.run("bogus_hook")

    es = EarlyStopping(patience=2)
    assert not es(0, 0.5)
    assert not es(1, 0.4)
    assert es(2, 0.3)  # 2 epochs without improvement


def test_increment_path(tmp_path):
    p1 = increment_path(tmp_path / "exp", mkdir=True)
    p2 = increment_path(tmp_path / "exp", mkdir=True)
    assert p1.name == "exp" and p2.name == "exp2"


def test_apply_classifier_filters_mismatches():
    """Second-stage classifier filter (reference general.py:808-840): keeps
    only detections whose classifier argmax equals the detector class; crop
    geometry is square + 1.3x + 30px pad, clipped to the image."""
    import numpy as np
    from desenet_tpu.utils.general import apply_classifier

    im0 = np.zeros((200, 300, 3), np.uint8)
    im0[40:120, 50:150] = (0, 0, 255)     # red-ish region (BGR)
    im0[130:190, 180:280] = (255, 0, 0)   # blue region
    boxes = np.array([[50, 40, 150, 120], [180, 130, 280, 190],
                      [0, 0, 20, 20]], np.float32)
    classes = np.array([1, 0, 1])
    seen = {}

    def classifier(batch):  # NHWC float RGB 0-1 -> scores over 2 classes
        seen["shape"] = batch.shape
        red = batch[..., 0].mean(axis=(1, 2))
        blue = batch[..., 2].mean(axis=(1, 2))
        return np.stack([blue, red], 1)  # class1 = red, class0 = blue

    keep = apply_classifier(boxes, classes, im0, classifier, size=64)
    assert seen["shape"] == (3, 64, 64, 3)
    # det0 says class1 over the red region (classifier agrees), det1 says
    # class0 over blue (agrees), det2 claims class1 over black (classifier
    # sees nothing red there -> argmax is a coin decided by zeros; blue==red
    # ties argmax to 0 -> mismatch with claimed 1)
    assert keep.tolist() == [True, True, False]
    assert apply_classifier(np.zeros((0, 4)), [], im0, classifier).shape == (0,)


def test_set_matmul_precision():
    """--matmul-precision plumbing (cli/val.py, cli/detect.py): `highest`
    flips jax's default matmul precision so TPU f32 matmuls run true-f32
    passes (PARITY.md §2b drift escape hatch); `default` is a no-op."""
    import jax

    from desenet_tpu.utils.general import set_matmul_precision

    before = jax.config.jax_default_matmul_precision
    try:
        set_matmul_precision("default")
        assert jax.config.jax_default_matmul_precision == before
        set_matmul_precision("highest")
        assert jax.config.jax_default_matmul_precision == "highest"
        with pytest.raises(AssertionError):
            set_matmul_precision("bogus")
    finally:
        jax.config.update("jax_default_matmul_precision", before)


def test_val_cli_accepts_matmul_precision_flag():
    from desenet_tpu.cli.val import parse_opt

    o = parse_opt(["--data", "d.yaml", "--weights", "w",
                   "--matmul-precision", "highest"])
    assert o.matmul_precision == "highest"
