"""Multi-device data-parallel inference (api.Predictor n_devices): batches
shard over a 1D data mesh (8 virtual CPU devices via conftest) and results
must match the single-device Predictor exactly — including non-multiple
batch sizes, which pad to a device multiple and slice back."""

import os

import jax
import numpy as np
import pytest

from desenet_tpu.api import Predictor
from desenet_tpu.models import build_model, init_model
from desenet_tpu.train import create_train_state
from desenet_tpu.train.optim import OptimConfig
from desenet_tpu.utils import checkpoint as ckpt

CFG = os.path.join(os.path.dirname(__file__), "configs", "tiny_psp2.yaml")


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    model, spec = build_model(CFG, fused_csp=False)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64,
                           batch=1)
    state = create_train_state(variables, OptimConfig(lr0=0.01))
    p = str(tmp_path_factory.mktemp("md_ckpt") / "ck")
    ckpt.save_checkpoint(p, state, epoch=0, best_fitness=0.0,
                         meta={"cfg": CFG, "de_nc": spec.de_nc,
                               "se_nc": spec.se_nc})
    return p


def _imgs(n):
    rng = np.random.default_rng(5)
    return [rng.integers(0, 255, (70 + 2 * i, 90, 3), np.uint8)
            for i in range(n)]


def test_multidevice_matches_single(weights_dir):
    assert len(jax.devices()) == 8  # conftest virtual CPU mesh
    kw = dict(imgsz=64, half=False, conf_thres=1e-6, max_det=10)
    single = Predictor(weights_dir, **kw)
    multi = Predictor(weights_dir, n_devices=8, **kw)

    # batch of 3: NOT a multiple of 8 -> pads to 8, slices back to 3
    imgs = _imgs(3)
    r1, r8 = single(imgs), multi(imgs)
    assert len(r1) == len(r8) == 3
    for a, b in zip(r1.xyxy, r8.xyxy):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
    for a, b in zip(r1.masks, r8.masks):
        np.testing.assert_array_equal(a, b)


def test_multidevice_exact_multiple(weights_dir):
    kw = dict(imgsz=64, half=False, conf_thres=1e-6, max_det=10)
    single = Predictor(weights_dir, **kw)
    multi = Predictor(weights_dir, n_devices=8, **kw)
    imgs = _imgs(8)
    r1, r8 = single(imgs), multi(imgs)
    assert len(r8) == 8
    for a, b in zip(r1.xyxy, r8.xyxy):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_bake_weights_off_matches(weights_dir):
    """bake_weights=False (shared weight copy across compiled buckets,
    serve.py --no-bake-weights) must be numerically identical."""
    kw = dict(imgsz=64, half=False, conf_thres=1e-6, max_det=10)
    baked = Predictor(weights_dir, **kw)
    shared = Predictor(weights_dir, bake_weights=False, **kw)
    imgs = _imgs(2)
    r1, r2 = baked(imgs), shared(imgs)
    for a, b in zip(r1.xyxy, r2.xyxy):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
    for a, b in zip(r1.masks, r2.masks):
        np.testing.assert_array_equal(a, b)


def test_n_devices_over_available_raises(weights_dir):
    """Requesting more devices than visible must fail loudly, not silently
    truncate the mesh while padding batches to the requested multiple."""
    with pytest.raises(ValueError, match="devices"):
        Predictor(weights_dir, n_devices=16, imgsz=64, half=False)
