"""Native fastops library: build, assembler equality, rasterizer agreement."""

import numpy as np
import pytest

from desenet_tpu.native import (
    assemble_batch,
    available,
    rasterize_polygons_native,
)
from desenet_tpu.data.rasterize import rasterize_polygons

needs_native = pytest.mark.skipif(not available(),
                                  reason="libfastops not built")


def test_assemble_matches_stack(rng):
    samples = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
               for _ in range(7)]
    out = assemble_batch(samples)
    np.testing.assert_array_equal(out, np.stack(samples, 0))


@needs_native
def test_native_raster_close_to_pil(rng):
    agree = []
    for _ in range(10):
        n = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(10, 50)
        cx, cy = rng.uniform(60, 200, 2)
        pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                       1).astype(np.float32)
        seg = [(1, pts), (2, pts + 15)]
        m_pil = rasterize_polygons(seg, (256, 256))
        m_nat = rasterize_polygons_native(seg, (256, 256))
        agree.append((m_pil == m_nat).mean())
    assert min(agree) > 0.995, agree


@needs_native
def test_native_raster_empty_and_degenerate():
    out = rasterize_polygons_native([], (16, 16))
    assert out.sum() == 0
    line = np.array([[0, 0], [10, 10]], np.float32)  # 2 points — ignored
    out = rasterize_polygons_native([(1, line)], (16, 16))
    assert out.sum() == 0
