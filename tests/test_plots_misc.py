"""Plots / misc general utilities smoke coverage."""

import os

import numpy as np
import pytest

from desenet_tpu.utils.general import (
    Timeout,
    check_suffix,
    check_yaml,
    coco80_to_coco91_class,
    print_mutation,
    save_one_box,
    try_except,
    user_config_dir,
)
from desenet_tpu.utils.plots import (
    Annotator,
    SegAnnotator,
    label_colormap,
    output_to_target,
    plot_images,
    plot_labels,
    plot_lr_scheduler,
    plot_results,
    segoutput_to_target,
)


def test_annotators(rng, tmp_path):
    im = np.ascontiguousarray(
        rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    )
    ann = Annotator(im)
    ann.box_label((10, 10, 60, 80), "car 0.91", (255, 0, 0))
    out = ann.result()
    assert out.shape == (120, 160, 3)

    seg = SegAnnotator()
    mask = np.zeros((120, 160), np.int32)
    mask[40:80, 40:120] = 1
    over = seg.overlay(out, mask)
    assert over.shape == out.shape
    p = str(tmp_path / "m.png")
    seg.save_mask(mask, p)
    assert os.path.exists(p)


def test_label_colormap_known_values():
    cm = label_colormap()
    assert tuple(cm[0]) == (0, 0, 0)
    assert tuple(cm[1]) == (128, 0, 0)  # VOC class 1 color
    assert tuple(cm[2]) == (0, 128, 0)


def test_plot_images_and_results(rng, tmp_path):
    imgs = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    targets = np.array([[0, 1, 0.5, 0.5, 0.4, 0.4], [2, 0, 0.3, 0.3, 0.2, 0.2]])
    segs = rng.integers(0, 3, (4, 64, 64))
    f = str(tmp_path / "grid.jpg")
    sf = str(tmp_path / "grid_seg.jpg")
    plot_images(imgs, targets, segs, ["a.jpg"] * 4, f, sf)
    assert os.path.exists(f) and os.path.exists(sf)

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,a,b\n0,1.0,2.0\n1,0.5,1.5\n")
    plot_results(str(csv))
    assert (tmp_path / "results.png").exists()


def test_plot_labels_and_lr(tmp_path, rng):
    labels = [np.array([[0, 0.5, 0.5, 0.2, 0.3], [1, 0.3, 0.4, 0.1, 0.1]])]
    out = plot_labels(labels, ["a", "b"], str(tmp_path))
    assert os.path.exists(out)
    out = plot_lr_scheduler(lambda e: 0.01 * (1 - e / 10), 10, str(tmp_path))
    assert os.path.exists(out)


def test_segoutput_to_target(rng):
    logits = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    out = segoutput_to_target(logits, (16, 16))
    assert out.shape == (2, 16, 16)
    assert set(np.unique(out)) <= {0, 1, 2}


def test_misc_general(tmp_path, rng):
    assert len(coco80_to_coco91_class()) == 80
    check_suffix("a.yaml", (".yaml",))
    with pytest.raises(AssertionError):
        check_suffix("a.txt", (".yaml",))

    with Timeout(1):
        pass  # no-op fast path

    calls = []

    @try_except
    def boom():
        calls.append(1)
        raise RuntimeError("x")

    boom()
    assert calls == [1]

    im = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    f = tmp_path / "crop.jpg"
    crop = save_one_box([10, 10, 50, 50], im, file=str(f))
    assert f.exists() and crop.size > 0

    d = user_config_dir(env_var="_DESENET_TEST_CFG_DIR")
    assert d.exists()

    print_mutation({"fitness": 0.5, "map50": 0.4}, {"lr0": 0.01},
                   str(tmp_path))
    print_mutation({"fitness": 0.7, "map50": 0.5}, {"lr0": 0.02},
                   str(tmp_path))
    assert (tmp_path / "evolve.csv").exists()
    assert (tmp_path / "hyp_evolve.yaml").exists()
    import yaml

    best = yaml.safe_load((tmp_path / "hyp_evolve.yaml").read_text())
    assert best["lr0"] == 0.02  # higher fitness row wins


def test_quad_collate(rng):
    from desenet_tpu.data.dataset import collate_quad

    samples = []
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        det = np.array([[0, 0.5, 0.5, 0.2, 0.2]], np.float32)
        seg = rng.integers(0, 2, (32, 32)).astype(np.int32)
        samples.append((img, det, seg, f"p{i}", None))
    b = collate_quad(samples, max_targets=8, rng=np.random.default_rng(3))
    assert b["image"].shape == (1, 64, 64, 3)
    assert b["seg_labels"].shape == (1, 64, 64)
    # the upscale-vs-tile coin must follow the caller's rng: different seeds
    # must eventually produce both branches (upscale keeps only sample 0's
    # labels at full scale; tiling halves the box sizes)
    widths = {
        float(collate_quad(samples, max_targets=8,
                           rng=np.random.default_rng(s))["det_targets"][0, 0, 3])
        for s in range(8)
    }
    assert len(widths) == 2  # saw both the 0.2 (upscale) and 0.1 (tile) branch
    assert ((b["det_targets"][b["det_mask"]][:, 1:] >= 0)
            & (b["det_targets"][b["det_mask"]][:, 1:] <= 1)).all()


def test_augment_extras(rng):
    from desenet_tpu.data.augment import (
        cutout, hist_equalize, mixup, replicate_labels,
    )

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    det = np.array([[0, 10, 10, 30, 30], [1, 40, 40, 60, 60]], np.float32)
    out, det2 = cutout(img.copy(), det.copy(), rng)
    assert out.shape == img.shape and len(det2) <= len(det)

    eq = hist_equalize(img.copy())
    assert eq.shape == img.shape

    img2, det3 = replicate_labels(img.copy(), det.copy(), rng)
    assert len(det3) == len(det) + len(det) // 2

    seg = [(1, np.array([[5, 5], [20, 5], [20, 20]], np.float32))]
    mi, md, ms = mixup(img, det, seg, img, det, seg, rng)
    assert mi.shape == img.shape and len(md) == 2 * len(det)
    assert len(ms) == 2


def test_mosaic9(rng, tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from make_fake_dataset import generate
    from desenet_tpu.data import MixedDataset

    generate(str(tmp_path), n_train=10, n_val=2, size=96, seed=9)
    hyp = dict(mosaic=1.0, degrees=0, translate=0.1, scale=0.1, shear=0,
               perspective=0.0)
    ds = MixedDataset(os.path.join(str(tmp_path), "Images", "train"),
                      img_size=96, batch_size=4, augment=True, hyp=hyp)
    img, det, seg = ds._load_mosaic9(0, np.random.default_rng(0))
    assert img.shape == (96, 96, 3)
    if len(det):
        assert (det[:, 1:] >= 0).all() and (det[:, 1:] <= 96).all()
