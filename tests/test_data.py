"""Data pipeline: listing/caching/augmentation/collate on a synthetic dataset."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_fake_dataset import generate  # noqa: E402

from desenet_tpu.data import MixedDataset, create_mixed_dataloader
from desenet_tpu.data.augment import letterbox
from desenet_tpu.data.rasterize import rasterize_polygons


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fakedata")
    generate(str(root), n_train=12, n_val=6, size=160, seed=1)
    return str(root)


def test_letterbox_geometry(rng):
    img = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
    out, ratio, (dw, dh) = letterbox(img, 160, auto=False)
    assert out.shape == (160, 160, 3)
    assert ratio == (1.0, 1.0)
    assert dw == 0 and dh == 32
    assert (out[:31] == 114).all() and (out[-31:] == 114).all()


def test_rasterize_overwrite_order():
    tri1 = (1, np.array([[1, 1], [30, 1], [30, 30]], np.float32))
    tri2 = (2, np.array([[1, 1], [30, 1], [1, 30]], np.float32))
    m = rasterize_polygons([tri1, tri2], (32, 32))
    assert set(np.unique(m)) <= {0, 1, 2}
    assert (m == 2).sum() > 0 and (m == 1).sum() > 0
    # later polygon wins on the overlap diagonal
    assert m[1, 15] == 2


def test_dataset_basic(fake_root):
    ds = MixedDataset(os.path.join(fake_root, "Images", "train"),
                      img_size=160, batch_size=4)
    assert len(ds) == 12
    img, det, seg, path, shapes = ds.get_sample(0)
    assert img.shape == (160, 160, 3) and img.dtype == np.uint8
    assert det.ndim == 2 and det.shape[1] == 5
    assert ((det[:, 1:] >= 0) & (det[:, 1:] <= 1)).all()
    assert seg.shape == (160, 160)
    assert set(np.unique(seg)) <= {0, 1, 2}
    # cache file created and reused
    ds2 = MixedDataset(os.path.join(fake_root, "Images", "train"),
                       img_size=160, batch_size=4)
    assert ds2.img_files == ds.img_files


def test_dataset_determinism(fake_root):
    hyp = dict(mosaic=1.0, degrees=5, translate=0.1, scale=0.2, shear=2,
               perspective=0.0, hsv_h=0.05, hsv_s=0.2, hsv_v=0.1,
               flipud=0.2, fliplr=0.5)
    ds = MixedDataset(os.path.join(fake_root, "Images", "train"),
                      img_size=160, batch_size=4, augment=True, hyp=hyp, seed=3)
    ds.set_epoch(2)
    a = ds.get_sample(1)
    b = ds.get_sample(1)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[2], b[2])
    ds.set_epoch(3)
    c = ds.get_sample(1)
    assert not np.array_equal(a[0], c[0])  # different epoch -> different aug


def test_mosaic_sample(fake_root):
    hyp = dict(mosaic=1.0, degrees=0, translate=0.1, scale=0.2, shear=0,
               perspective=0.0)
    ds = MixedDataset(os.path.join(fake_root, "Images", "train"),
                      img_size=160, batch_size=4, augment=True, hyp=hyp)
    img, det, seg, path, shapes = ds.get_sample(0)
    # 2s x 2s canvas cropped back to s x s by random_perspective's border
    assert img.shape == (160, 160, 3)
    assert seg.shape == (160, 160)
    assert shapes is None
    if len(det):
        assert ((det[:, 1:] >= 0) & (det[:, 1:] <= 1)).all()


def test_loader_batches(fake_root):
    hyp = dict(mosaic=0.0)
    loader, ds = create_mixed_dataloader(
        os.path.join(fake_root, "Images", "train"), img_size=160,
        batch_size=4, augment=True, hyp=hyp, workers=2, max_targets=16,
    )
    batches = list(loader)
    assert len(batches) == 3  # 12 / 4, drop_last
    b = batches[0]
    assert b["image"].shape == (4, 160, 160, 3)
    assert b["det_targets"].shape == (4, 16, 5)
    assert b["det_mask"].shape == (4, 16)
    assert b["seg_labels"].shape == (4, 160, 160)
    assert b["det_mask"].sum() > 0
    # only valid rows are nonzero
    assert (b["det_targets"][~b["det_mask"]] == 0).all()


def test_loader_distributed_shard(fake_root):
    loader0, _ = create_mixed_dataloader(
        os.path.join(fake_root, "Images", "train"), img_size=160,
        batch_size=2, augment=False, rank=0, world_size=2, shuffle=False,
    )
    loader1, _ = create_mixed_dataloader(
        os.path.join(fake_root, "Images", "train"), img_size=160,
        batch_size=2, augment=False, rank=1, world_size=2, shuffle=False,
    )
    p0 = [p for b in loader0 for p in b["paths"]]
    p1 = [p for b in loader1 for p in b["paths"]]
    assert not set(p0) & set(p1)
    assert len(p0) + len(p1) == 12


def test_rect_mode(fake_root):
    ds = MixedDataset(os.path.join(fake_root, "Images", "val"),
                      img_size=160, batch_size=4, rect=True, pad=0.5)
    img, det, seg, path, shapes = ds.get_sample(0)
    h, w = img.shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert shapes is not None


def test_image_cache_equivalence(fake_root):
    """cache_images ram/disk produce byte-identical samples to no cache,
    for both the mosaic-augment and the plain val path; the disk cache
    persists and is reused (reference datasets.py:57-86 analog)."""
    train = os.path.join(fake_root, "Images", "train")
    hyp = dict(mosaic=1.0, degrees=5, translate=0.1, scale=0.2, shear=2,
               hsv_h=0.05, hsv_s=0.2, hsv_v=0.1, flipud=0.2, fliplr=0.5)

    def samples(**kw):
        ds = MixedDataset(train, img_size=160, batch_size=4, seed=3, **kw)
        ds.set_epoch(1)
        return [ds.get_sample(i) for i in range(4)]

    for kw in (dict(augment=True, hyp=hyp), dict(augment=False)):
        base = samples(**kw)
        for mode in ("ram", "disk"):
            got = samples(cache_images=mode, **kw)
            for a, b in zip(base, got):
                np.testing.assert_array_equal(a[0], b[0])
                np.testing.assert_array_equal(a[1], b[1])
                np.testing.assert_array_equal(a[2], b[2])
                assert a[4] == b[4]  # shapes tuple incl. (h0, w0)

    # disk cache directory exists and a second construction reuses it
    import pathlib
    ds = MixedDataset(train, img_size=160, batch_size=4,
                      cache_images="disk")
    cdir = pathlib.Path(ds.de_label_files[0]).parent.with_suffix(".imgcache")
    files = sorted(cdir.glob("*.npy"))
    assert len(files) == len(ds)
    mtimes = [f.stat().st_mtime_ns for f in files]
    ds2 = MixedDataset(train, img_size=160, batch_size=4,
                       cache_images="disk")
    assert [f.stat().st_mtime_ns for f in files] == mtimes  # not rewritten
    a = ds.get_sample(2)
    b = ds2.get_sample(2)
    np.testing.assert_array_equal(a[0], b[0])


def test_quad_loader(fake_root):
    """--quad collate: batches of bs//4 images at 2x size, epoch-varying
    upscale-vs-tile choices (reference collate_fn4)."""
    from desenet_tpu.data.loader import create_mixed_dataloader
    hyp = dict(mosaic=0.0, fliplr=0.0)
    loader, ds = create_mixed_dataloader(
        os.path.join(fake_root, "Images", "train"), img_size=160,
        batch_size=8, augment=True, hyp=hyp, quad=True, workers=2, seed=0)
    loader.set_epoch(0)
    batches = list(loader)
    assert batches, "no batches"
    for b in batches:
        assert b["image"].shape[0] == 2  # 8 // 4
        assert b["image"].shape[1:3] == (320, 320)
        assert b["seg_labels"].shape[1:] == (320, 320)


def test_corrupt_samples_skipped(tmp_path):
    """Corrupt images/labels are skipped with a message, never crash the
    pipeline, and the usable subset trains/loads (verify_image_label
    semantics, mixed_datasets.py:921-973)."""
    root = tmp_path / "corrupt"
    generate(str(root), n_train=8, n_val=2, size=96, seed=7)
    tr = root / "Images" / "train"
    de = root / "DeLabels" / "train"
    se = root / "SeLabels" / "train"

    # 1: truncated JPEG
    p = tr / "img_0000.jpg"
    p.write_bytes(p.read_bytes()[:200])
    # 2: not an image at all
    (tr / "img_0001.jpg").write_bytes(b"definitely not a jpeg")
    # 3: det row with 6 columns
    (de / "img_0002.txt").write_text("0 0.5 0.5 0.2 0.2 0.9\n")
    # 4: unnormalized det coords
    (de / "img_0003.txt").write_text("0 50 50 20 20\n")
    # 5: negative det value
    (de / "img_0004.txt").write_text("0 -0.1 0.5 0.2 0.2\n")
    # 6: duplicate det rows
    (de / "img_0005.txt").write_text("1 0.5 0.5 0.2 0.2\n1 0.5 0.5 0.2 0.2\n")
    # 7: odd-length polygon
    (se / "img_0006.txt").write_text("1 0.1 0.1 0.9\n")

    ds = MixedDataset(str(tr), img_size=96, augment=False)
    assert len(ds) == 1  # only img_0007 survives
    img, det, seg, path, shapes = ds.get_sample(0)
    assert img.shape[-1] == 3 and "img_0007" in path

    # empty det txt is 'empty', not corrupt: image stays usable (the size
    # change invalidates the label cache via get_hash, no manual delete)
    (de / "img_0007.txt").write_text("")
    ds2 = MixedDataset(str(tr), img_size=96, augment=False)
    assert len(ds2) == 1
    _, det2, _, _, _ = ds2.get_sample(0)
    assert len(det2) == 0  # no boxes, still usable


def test_loader_worker_count_invariance(fake_root):
    """Batches are bit-identical regardless of worker-thread count — the
    per-(seed, epoch, index) RNG means no hidden shared state races
    (replaces the reference's global random soup, SURVEY §5.2)."""
    hyp = dict(mosaic=1.0, degrees=5, translate=0.1, scale=0.2, shear=2,
               hsv_h=0.05, hsv_s=0.2, hsv_v=0.1, flipud=0.2, fliplr=0.5)

    def batches(workers):
        loader, _ = create_mixed_dataloader(
            os.path.join(fake_root, "Images", "train"), img_size=160,
            batch_size=4, augment=True, hyp=hyp, workers=workers,
            max_targets=16, seed=11,
        )
        loader.set_epoch(1)
        return list(loader)

    a, b = batches(1), batches(6)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert ba["paths"] == bb["paths"]
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["det_targets"], bb["det_targets"])
        np.testing.assert_array_equal(ba["seg_labels"], bb["seg_labels"])
