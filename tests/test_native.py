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
