"""Pallas greedy-NMS kernel vs the XLA-loop backend (interpret mode on CPU;
the compiled kernel is exercised on TPU by bench.py / detect)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from desenet_tpu.ops.nms import _greedy_nms
from desenet_tpu.ops.nms_pallas import greedy_nms_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_keepset(seed):
    rng = np.random.default_rng(seed)
    B, K, MD = 4, 128, 64
    centers = rng.uniform(50, 2000, (B, K, 2)).astype(np.float32)
    wh = rng.uniform(20, 150, (B, K, 2)).astype(np.float32)
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    scores = rng.uniform(0, 1, (B, K)).astype(np.float32)
    scores[scores < 0.4] = -1.0

    idx_p, sc_p = greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, MD, interpret=True
    )
    xla = jax.vmap(functools.partial(_greedy_nms, iou_thres=0.45, max_det=MD))
    idx_x, ok_x = xla(jnp.asarray(boxes), jnp.asarray(scores))

    ok_p = np.asarray(sc_p) > 0
    for b in range(B):
        kp = np.asarray(idx_p[b])[ok_p[b]]
        kx = np.asarray(idx_x[b])[np.asarray(ok_x[b])]
        np.testing.assert_array_equal(kp, kx)


def test_pallas_empty_and_single():
    B, K, MD = 2, 64, 16
    boxes = np.zeros((B, K, 4), np.float32)
    boxes[..., 2:] = 10
    scores = np.full((B, K), -1.0, np.float32)
    scores[1, 5] = 0.9  # one valid candidate in image 1
    idx, sc = greedy_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, MD, interpret=True
    )
    ok = np.asarray(sc) > 0
    assert ok[0].sum() == 0
    assert ok[1].sum() == 1
    assert int(np.asarray(idx)[1][ok[1]][0]) == 5
