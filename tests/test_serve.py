"""Micro-batching inference server (desenet_tpu/serve.py): HTTP contract,
bucket padding, deterministic batching, and result parity with a direct
Predictor call. The reference has no serving surface (closest:
scripts/detect.py:36-62 file loop) — this is a TPU-deployment addition."""

import base64
import json
import os
import threading
import urllib.request

import cv2
import jax
import numpy as np
import pytest

from desenet_tpu.api import Predictor
from desenet_tpu.models import build_model, init_model
from desenet_tpu.serve import BatchRunner, InferenceServer, _Pending, _bucket
from desenet_tpu.train import create_train_state
from desenet_tpu.train.optim import OptimConfig
from desenet_tpu.utils import checkpoint as ckpt

CFG = os.path.join(os.path.dirname(__file__), "configs", "tiny_psp2.yaml")


@pytest.fixture(scope="module")
def predictor(tmp_path_factory):
    model, spec = build_model(CFG, fused_csp=False)
    variables = init_model(model, jax.random.PRNGKey(0), img_size=64,
                           batch=1)
    state = create_train_state(variables, OptimConfig(lr0=0.01))
    p = str(tmp_path_factory.mktemp("serve_ckpt") / "ck")
    ckpt.save_checkpoint(p, state, epoch=0, best_fitness=0.0,
                         meta={"cfg": CFG, "de_nc": spec.de_nc,
                               "se_nc": spec.se_nc})
    # near-zero conf so the random-init model still returns boxes
    return Predictor(p, imgsz=64, half=False, conf_thres=1e-6, max_det=10)


def _img(seed=0, h=80, w=96):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, 3), np.uint8)


def test_bucket():
    assert [_bucket(n, 16) for n in [1, 2, 3, 4, 5, 9, 16]] == \
        [1, 2, 4, 4, 8, 16, 16]
    assert _bucket(9, 12) == 12


def test_runner_batches_deterministically(predictor):
    """Three queued requests drain into ONE padded bucket-4 device call."""
    runner = BatchRunner(predictor, max_batch=8, max_wait_ms=1.0)
    pendings = [_Pending(_img(i), want_mask=False) for i in range(3)]
    for p in pendings:
        runner.submit(p)
    served = runner._drain_once()
    assert served == 3
    assert runner.stats == {"requests": 3, "batches": 1,
                            "max_batch_seen": 3, "padded": 1,
                            "shed": 0, "cancelled": 0}
    for p in pendings:
        assert p.done.is_set() and p.error is None
        assert isinstance(p.result["detections"], list)
        assert p.result["num"] == len(p.result["detections"])


def test_runner_result_parity_with_direct_call(predictor):
    """Padding to the bucket must not change a request's boxes."""
    img = _img(42)
    direct = predictor([img]).to_dicts()[0]
    runner = BatchRunner(predictor, max_batch=8, max_wait_ms=1.0)
    pendings = [_Pending(img, False), _Pending(_img(43), False),
                _Pending(_img(44), False)]
    for p in pendings:
        runner.submit(p)
    runner._drain_once()
    batched = pendings[0].result["detections"]
    assert len(batched) == len(direct)
    for a, b in zip(batched, direct):
        assert a["cls"] == b["cls"]
        np.testing.assert_allclose(
            [a["xmin"], a["ymin"], a["xmax"], a["ymax"], a["confidence"]],
            [b["xmin"], b["ymin"], b["xmax"], b["ymax"], b["confidence"]],
            rtol=1e-4, atol=1e-3)


@pytest.fixture(scope="module")
def server(predictor):
    srv = InferenceServer(predictor, port=0, max_batch=4, max_wait_ms=20.0)
    srv.start()
    yield srv
    srv.stop()


def _post(port, body, path="/predict"):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_healthz_info(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        assert r.status == 200 and json.loads(r.read())["ok"]
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/info", timeout=30) as r:
        info = json.loads(r.read())
    assert info["imgsz"] == 64 and info["max_batch"] == 4
    assert isinstance(info["names"], list)


def test_http_predict_concurrent_and_mask(server):
    img = _img(7, h=60, w=70)
    ok, png = cv2.imencode(".jpg", img)
    assert ok
    body = png.tobytes()

    results = {}

    def call(i, mask):
        path = "/predict?mask=1" if mask else "/predict"
        results[i] = _post(server.port, body, path)

    threads = [threading.Thread(target=call, args=(i, i == 0))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert set(results) == {0, 1, 2}
    for i, (status, payload) in results.items():
        assert status == 200, payload
        assert payload["num"] == len(payload["detections"])
    # mask round-trip: base64 PNG decodes to the native image shape
    masked = results[0][1]
    raw = base64.b64decode(masked["seg_png"])
    m = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (60, 70)
    assert isinstance(masked["seg_names"], list)
    # identical JPEG bytes through the batched server = direct call
    direct = server.runner.predictor(
        [cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)]
    ).to_dicts()[0]
    assert results[1][1]["num"] == len(direct)


def test_http_errors(server):
    status, payload = _post(server.port, b"not an image")
    assert status == 400 and "undecodable" in payload["error"]
    status, payload = _post(server.port, b"")
    assert status == 400
    status, payload = _post(server.port, b"x", path="/nope")
    assert status == 404


def test_body_size_cap(predictor):
    srv = InferenceServer(predictor, port=0, max_batch=2,
                          max_body_bytes=1024)
    srv.start()
    try:
        status, payload = _post(srv.port, b"\x00" * 2048)
        assert status == 413 and "too large" in payload["error"]
    finally:
        srv.stop()


def test_overload_sheds_with_503(predictor):
    """Queue bound: with the worker not draining, submits past max_queue are
    shed immediately instead of accumulating unboundedly."""
    runner = BatchRunner(predictor, max_batch=2, max_wait_ms=1.0,
                         max_queue=3)  # worker thread NOT started
    accepted = [runner.submit(_Pending(_img(i), False)) for i in range(5)]
    assert accepted == [True, True, True, False, False]
    assert runner.stats["shed"] == 2
    assert runner.queue.qsize() == 3  # bounded: nothing buffered past the cap


def test_cancelled_requests_skipped_at_assembly(predictor):
    """A request whose waiter timed out is skipped by the batch assembler —
    no device time is spent on abandoned work."""
    runner = BatchRunner(predictor, max_batch=8, max_wait_ms=1.0)
    live = _Pending(_img(1), False)
    dead = _Pending(_img(2), False)
    dead.cancelled = True
    runner.submit(dead)
    runner.submit(live)
    served = runner._drain_once()
    assert served == 1
    assert runner.stats["cancelled"] == 1
    assert dead.done.is_set() and dead.result is None
    assert live.result is not None and live.error is None


def test_per_item_mask_failure_isolated(predictor, monkeypatch):
    """One request's mask encode blowing up must not 500 its batch-mates."""
    runner = BatchRunner(predictor, max_batch=8, max_wait_ms=1.0)
    bad = _Pending(_img(3), want_mask=True)
    good = _Pending(_img(4), want_mask=False)
    import cv2 as _cv2

    def boom(*a, **k):
        raise RuntimeError("encode exploded")

    monkeypatch.setattr(_cv2, "imencode", boom)
    runner.submit(bad)
    runner.submit(good)
    runner._drain_once()
    assert bad.error is not None and "encode exploded" in bad.error
    assert good.error is None and good.result is not None


def test_stop_fails_queued_requests_immediately(predictor):
    """Shutdown drains the queue and unblocks waiters now, not after the
    full request timeout; stop() before start() must not hang."""
    runner = BatchRunner(predictor, max_batch=2)  # not started
    stranded = _Pending(_img(5), False)
    runner.submit(stranded)
    runner.stop()
    assert stranded.done.is_set() and "shutting down" in stranded.error
    assert runner.submit(_Pending(_img(6), False)) is False  # post-stop shed

    srv = InferenceServer(predictor, port=0)
    srv.stop()  # never started: must return, not hang on shutdown()


def test_sustained_overload_http(predictor):
    """N threads > queue+batch capacity: every request resolves promptly as
    either 200 or a 503 shed — no unbounded queueing, no hung clients."""
    srv = InferenceServer(predictor, port=0, max_batch=2, max_wait_ms=1.0,
                          max_queue=2, request_timeout_s=30.0)
    srv.start()
    try:
        ok, png = cv2.imencode(".jpg", _img(9))
        body = png.tobytes()
        results = {}

        def call(i):
            results[i] = _post(srv.port, body)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert set(results) == set(range(12))
        statuses = [s for s, _ in results.values()]
        assert all(s in (200, 503) for s in statuses), statuses
        assert statuses.count(200) >= 1  # the server kept serving
        info = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/info", timeout=30).read())
        assert info["latency"]["p50_ms"] is not None
        assert info["max_queue"] == 2
    finally:
        srv.stop()
