"""Polygon -> class-id mask rasterization.

Parity with the reference's PIL ImageDraw.polygon fill (general.py:490-510):
later polygons overwrite earlier ones; polygons with < 3 points are ignored.
(PIL skips the outline pass whenever outline ink == fill ink — the
reference's outline=1/fill=1 call is therefore pure fill.)

The C++ rasterizer (native/fastops.cpp) is DEFAULT-ON and bit-identical to
PIL: its fill reproduces Pillow's scanline algorithm exactly for simple
polygons (fuzz-verified in tests/test_native.py) and refuses degenerate
(self-intersecting / duplicate-vertex) polygons, for which this wrapper
falls back to PIL — so the output equals PIL's in every case. Disable with
DESENET_NATIVE_RASTER=0 (or DESENET_NATIVE=0 for all native kernels).
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw


def rasterize_polygons(
    seg: Sequence[Tuple[int, np.ndarray]], hw: Tuple[int, int]
) -> np.ndarray:
    """seg: list of (cls_id, (k,2) pixel polygon). Returns (H, W) int32."""
    if os.environ.get("DESENET_NATIVE_RASTER", "1") == "1":
        from desenet_tpu.native import rasterize_polygons_native

        out = rasterize_polygons_native(seg, hw)
        if out is not None:
            return out
    cls = np.zeros(hw, dtype=np.int32)
    for cls_id, pts in seg:
        if len(pts) <= 2:
            continue
        mask = Image.new("L", (hw[1], hw[0]), 0)
        draw = ImageDraw.Draw(mask)
        draw.polygon([tuple(p) for p in pts], outline=1, fill=1)
        cls[np.asarray(mask, dtype=bool)] = int(cls_id)
    return cls
