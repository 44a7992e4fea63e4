"""Native fastops library: build, assembler equality, PIL-exact rasterizer.

The C++ fill (native/fastops.cpp fill_polygon) reproduces Pillow's polygon
scanline algorithm bit-exactly for simple polygons — the reference's
label-truth definition (general.py:490-510 uses ImageDraw.polygon with
outline=1, fill=1; PIL skips the outline pass when outline ink == fill ink,
so fill-only IS the full semantics). Degenerate (self-intersecting or
duplicate-vertex) polygons are refused by the native path and fall back to
PIL inside rasterize_polygons, keeping the wrapper bit-identical always.
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw

from desenet_tpu.native import (
    assemble_batch,
    available,
    rasterize_polygons_native,
)
from desenet_tpu.data.rasterize import rasterize_polygons

needs_native = pytest.mark.skipif(not available(),
                                  reason="libfastops not built")


def pil_rasterize(seg, hw):
    cls = np.zeros(hw, dtype=np.int32)
    for cls_id, pts in seg:
        if len(pts) <= 2:
            continue
        m = Image.new("L", (hw[1], hw[0]), 0)
        ImageDraw.Draw(m).polygon([tuple(p) for p in pts], outline=1, fill=1)
        cls[np.asarray(m, dtype=bool)] = int(cls_id)
    return cls


def is_simple(P):
    n = len(P)
    if len({tuple(p) for p in P}) != n:
        return False

    def cr(o, p, q):
        return (p[0]-o[0])*(q[1]-o[1]) - (p[1]-o[1])*(q[0]-o[0])

    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            a, b = P[i], P[(i+1) % n]
            c, d = P[j], P[(j+1) % n]
            d1, d2, d3, d4 = cr(c, d, a), cr(c, d, b), cr(a, b, c), cr(a, b, d)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                return False
    return True


def test_assemble_matches_stack(rng):
    samples = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
               for _ in range(7)]
    out = assemble_batch(samples)
    np.testing.assert_array_equal(out, np.stack(samples, 0))


@needs_native
def test_native_raster_bit_identical_star_polygons(rng):
    """Realistic label-like polygons (star-convex, float coords): the
    wrapper is bit-identical to PIL always; the native path engages for the
    (vast) simple majority and is itself exact."""
    native_hits = 0
    for _ in range(30):
        n = int(rng.integers(3, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(8, 60, n)
        cx, cy = rng.uniform(-20, 270, 2)
        pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                       1).astype(np.float32)
        seg = [(1, pts), (2, pts + rng.uniform(-30, 30, 2))]
        m_pil = pil_rasterize(seg, (256, 256))
        m_nat = rasterize_polygons_native(seg, (256, 256))
        if m_nat is not None:  # truncation can create duplicate vertices
            native_hits += 1
            np.testing.assert_array_equal(m_nat, m_pil)
        np.testing.assert_array_equal(rasterize_polygons(seg, (256, 256)),
                                      m_pil)
    assert native_hits >= 20  # native path must cover the bulk


@needs_native
def test_native_raster_bit_identical_random_simple(rng):
    """Random simple polygons incl. negative/out-of-image coords: exact."""
    checked = 0
    for _ in range(600):
        n = int(rng.integers(3, 9))
        pts = rng.uniform(-6, 40, size=(n, 2)).astype(np.float32)
        if rng.random() < 0.4:
            pts = np.round(pts)
        P = [(int(x), int(y)) for x, y in pts]
        if not is_simple(P):
            continue
        checked += 1
        m_pil = pil_rasterize([(1, pts)], (32, 32))
        m_nat = rasterize_polygons_native([(1, pts)], (32, 32))
        assert m_nat is not None, P
        np.testing.assert_array_equal(m_nat, m_pil, err_msg=str(P))
    assert checked > 150


@needs_native
def test_native_raster_degenerate_falls_back_to_pil(rng):
    bowtie = np.array([[0, 0], [20, 20], [20, 0], [0, 20]], np.float32)
    assert rasterize_polygons_native([(1, bowtie)], (24, 24)) is None
    # the public wrapper must still render it (via PIL), identically
    np.testing.assert_array_equal(
        rasterize_polygons([(1, bowtie)], (24, 24)),
        pil_rasterize([(1, bowtie)], (24, 24)))


@needs_native
def test_native_raster_empty_and_degenerate():
    out = rasterize_polygons_native([], (16, 16))
    assert out.sum() == 0
    line = np.array([[0, 0], [10, 10]], np.float32)  # 2 points — ignored
    out = rasterize_polygons_native([(1, line)], (16, 16))
    assert out.sum() == 0


def test_wrapper_default_is_exact(rng):
    """rasterize_polygons (default path) == PIL on label-like polygons."""
    for _ in range(10):
        n = int(rng.integers(3, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 100, n)
        pts = np.stack([128 + r * np.cos(ang), 128 + r * np.sin(ang)],
                       1).astype(np.float32)
        np.testing.assert_array_equal(
            rasterize_polygons([(3, pts)], (256, 256)),
            pil_rasterize([(3, pts)], (256, 256)))


# ---------------------------------------------------------------------------
# scaled JPEG decode (decode_jpeg_scaled / MixedDataset fast_decode)

needs_jpeg = pytest.mark.skipif(
    not __import__("desenet_tpu.native", fromlist=["jpeg_available"]
                   ).jpeg_available(),
    reason="fastops built without libjpeg")


def _write_jpeg(tmp_path, w, h, name="t.jpg", quality=92, exif_orient=None):
    rng = np.random.default_rng(0)
    # low-frequency content so decode paths agree closely
    small = rng.integers(0, 255, (h // 16 + 1, w // 16 + 1, 3), np.uint8)
    arr = np.asarray(
        Image.fromarray(small).resize((w, h), Image.BILINEAR), np.uint8)
    img = Image.fromarray(arr)
    p = str(tmp_path / name)
    kw = {"quality": quality}
    if exif_orient is not None:
        exif = Image.Exif()
        exif[0x0112] = exif_orient
        kw["exif"] = exif
    img.save(p, **kw)
    return p, arr


@needs_jpeg
def test_decode_jpeg_scaled_dims_and_content(tmp_path):
    from desenet_tpu.native import decode_jpeg_scaled

    p, arr = _write_jpeg(tmp_path, 1280, 960)
    out = decode_jpeg_scaled(open(p, "rb").read(), 640)
    assert out is not None
    dec, (h0, w0) = out
    assert (h0, w0) == (960, 1280)
    # scale 4/8 lands exactly on 640x480, long side >= target
    assert dec.shape == (480, 640, 3)
    # content matches a PIL full decode + box resize to the same grid
    ref = np.asarray(Image.open(p).resize((640, 480), Image.BILINEAR),
                     np.float32)
    assert np.abs(dec.astype(np.float32) - ref).mean() < 8.0

    # image already smaller than target: full-res decode, no upscale
    p2, arr2 = _write_jpeg(tmp_path, 320, 240, "s.jpg")
    dec2, (h2, w2) = decode_jpeg_scaled(open(p2, "rb").read(), 640)
    assert dec2.shape == (240, 320, 3) and (h2, w2) == (240, 320)


@needs_jpeg
def test_decode_jpeg_scaled_rejects_non_jpeg(tmp_path):
    from desenet_tpu.native import decode_jpeg_scaled

    assert decode_jpeg_scaled(b"\x89PNG\r\n\x1a\n" + b"0" * 64, 640) is None
    assert decode_jpeg_scaled(b"\xff\xd8\xff\xe0" + b"\x00" * 16, 640) is None


@needs_jpeg
def test_dataset_fast_decode_matches_pil_geometry(tmp_path):
    """fast_decode load_image returns the exact reference output geometry
    and near-identical pixels; EXIF-rotated images fall back to PIL."""
    import shutil

    from desenet_tpu.data.dataset import MixedDataset

    ds_dir = tmp_path / "Images" / "train"
    ds_dir.mkdir(parents=True)
    (tmp_path / "DeLabels" / "train").mkdir(parents=True)
    (tmp_path / "SeLabels" / "train").mkdir(parents=True)
    _write_jpeg(ds_dir.parent.parent, 1280, 960, "src.jpg")
    for i in range(2):
        shutil.copy(str(tmp_path / "src.jpg"), str(ds_dir / f"i{i}.jpg"))
        (tmp_path / "DeLabels" / "train" / f"i{i}.txt").write_text(
            "0 0.5 0.5 0.2 0.2\n")
        (tmp_path / "SeLabels" / "train" / f"i{i}.txt").write_text(
            "1 0.1 0.1 0.9 0.1 0.5 0.9\n")

    kw = dict(img_size=640, batch_size=2, augment=False)
    ds_pil = MixedDataset(str(ds_dir), **kw)
    ds_fast = MixedDataset(str(ds_dir), fast_decode=True, **kw)
    a_pil, hw0_pil, hw_pil = ds_pil.load_image(0)
    a_fast, hw0_fast, hw_fast = ds_fast.load_image(0)
    assert hw0_pil == hw0_fast == (960, 1280)
    assert hw_pil == hw_fast == (480, 640)
    assert a_fast.shape == a_pil.shape
    # different decode/resample kernels: close, not bit-equal
    assert np.abs(a_fast.astype(np.float32) - a_pil.astype(np.float32)
                  ).mean() < 8.0

    # EXIF-rotated source must take the PIL transpose path
    p_rot, _ = _write_jpeg(tmp_path, 1280, 960, "rot.jpg", exif_orient=6)
    shutil.copy(p_rot, str(ds_dir / "i0.jpg"))
    ds_rot = MixedDataset(str(ds_dir), fast_decode=True, **kw)
    assert ds_rot._load_image_fast(str(ds_dir / "i0.jpg")) is None
    a_rot, (h0, w0), _ = ds_rot.load_image(0)
    assert (h0, w0) == (1280, 960)  # transposed by EXIF


def test_assemble_batch_s2d4_matches_numpy():
    """Native s2d4 batch assembler == numpy reference permutation, and the
    fallback path (DESENET_NATIVE=0 uses space_to_depth4_np) agrees."""
    from desenet_tpu.native import assemble_batch_s2d4
    from desenet_tpu.ops.s2d import space_to_depth4_np

    rng = np.random.default_rng(0)
    samples = [rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
               for _ in range(5)]
    out = assemble_batch_s2d4(samples)
    ref = space_to_depth4_np(np.stack(samples, 0))
    assert out.shape == (5, 16, 24, 48)
    np.testing.assert_array_equal(out, ref)

    with pytest.raises(ValueError):
        assemble_batch_s2d4([np.zeros((10, 8, 3), np.uint8)])
