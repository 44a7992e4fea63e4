"""Engine smoke: 1-epoch end-to-end train -> checkpoint -> val -> predictor
API on a generated micro-dataset (CPU, tiny model, 64px)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_fake_dataset import generate  # noqa: E402

from desenet_tpu.train.engine import TrainConfig, train

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host; excluded from the smoke tier

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def micro_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("micro")
    generate(str(root), n_train=8, n_val=4, size=96, seed=5)
    return str(root)


@pytest.fixture(scope="module")
def train_run(micro_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("runs")
    cfg = TrainConfig(
        data=os.path.join(micro_root, "data.yaml"),
        cfg=os.path.join(HERE, "configs", "tiny_psp2.yaml"),
        epochs=2, batch_size=4, imgsz=64, workers=2,
        project=str(out), name="smoke", exist_ok=True,
        dtype="float32", patience=10, nbs=4, warmup_floor=4,
        noautoanchor=True, use_tb=False, max_targets=32,
    )
    return train(cfg)


def test_train_produces_artifacts(train_run):
    sd = train_run["save_dir"]
    assert os.path.exists(os.path.join(sd, "results.csv"))
    assert os.path.exists(os.path.join(sd, "last", "meta.json"))
    assert os.path.exists(os.path.join(sd, "hyp.yaml"))
    # inference-only finalized checkpoint (strip_optimizer analog)
    assert os.path.exists(os.path.join(sd, "best_stripped", "meta.json"))
    with open(os.path.join(sd, "results.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs
    vals = lines[-1].split(",")
    assert all(v == "" or np.isfinite(float(v)) for v in vals)


def test_resume_continues(train_run, micro_root):
    sd = train_run["save_dir"]
    cfg = TrainConfig(
        data=os.path.join(micro_root, "data.yaml"),
        cfg=os.path.join(HERE, "configs", "tiny_psp2.yaml"),
        epochs=3, batch_size=4, imgsz=64, workers=2,
        project=os.path.dirname(sd), name="smoke", exist_ok=True,
        dtype="float32", nbs=4, warmup_floor=4, noautoanchor=True,
        use_tb=False, max_targets=32,
        resume=os.path.join(sd, "last"),
    )
    out = train(cfg)
    with open(os.path.join(out["save_dir"], "results.csv")) as f:
        lines = f.read().strip().splitlines()
    # resumed from epoch 2 -> exactly one more epoch row appended
    assert lines[-1].startswith("2,")


def test_bare_resume_cli(train_run, micro_root, monkeypatch):
    """Bare --resume finds the most recent run under cwd and restores its
    opt.yaml (reference train.py:538-547 + general.py get_latest_run). The
    restored run is already at its final epoch, so this returns immediately
    with the original save_dir."""
    from desenet_tpu.cli import train as train_cli

    sd = train_run["save_dir"]
    monkeypatch.chdir(os.path.dirname(sd))
    results = train_cli.main([
        "--data", os.path.join(micro_root, "data.yaml"), "--resume"])
    assert os.path.abspath(results["save_dir"]) == os.path.abspath(sd)


def test_predictor_api(train_run, micro_root):
    from desenet_tpu.api import load_predictor

    pred = load_predictor(os.path.join(train_run["save_dir"], "last"),
                          imgsz=64, half=False)
    img = os.path.join(micro_root, "Images", "val", "img_0000.jpg")
    res = pred([img, img])
    assert len(res) == 2
    assert res.masks[0].shape == (96, 96)
    assert isinstance(res.to_dicts(), list)
    rendered = res.render()
    assert rendered[0].shape == (96, 96, 3)


def test_predictor_stem_s2d_geometry_parity(train_run, micro_root):
    """stem_s2d auto-enables on real TPUs; force it on CPU and check the
    Predictor returns the same boxes/masks as the plain path. Regression for
    the s2d4 batch layout (N, H/4, W/4, 48) leaking into the letterbox-undo
    math (boxes were scaled from H/4 instead of the network input size)."""
    from desenet_tpu.api import load_predictor

    w = os.path.join(train_run["save_dir"], "last")
    img = os.path.join(micro_root, "Images", "val", "img_0001.jpg")
    # near-zero conf: NMS returns real decoded boxes regardless of how well
    # the 2-epoch micro model trained, so the geometry comparison has signal
    kw = dict(imgsz=64, half=False, conf_thres=1e-6, max_det=20)
    plain = load_predictor(w, stem_s2d=False, **kw)
    s2d = load_predictor(w, stem_s2d=True, **kw)
    assert s2d.stem_s2d is True  # must not have fallen back
    r0, r1 = plain([img]), s2d([img])
    # non-vacuity: the comparison must have signal to catch geometry bugs
    assert len(r0.xyxy[0]) > 0
    assert r0.xyxy[0].shape == r1.xyxy[0].shape
    np.testing.assert_allclose(r0.xyxy[0], r1.xyxy[0], atol=0.5)
    assert r0.masks[0].shape == r1.masks[0].shape
    # exact stem rewrite: masks agree up to f32 summation-order argmax ties
    assert (r0.masks[0] != r1.masks[0]).mean() < 0.02


def test_validator_on_checkpoint(train_run, micro_root):
    from desenet_tpu.cli.val import run

    results = run(
        os.path.join(micro_root, "data.yaml"),
        os.path.join(train_run["save_dir"], "last"),
        batch_size=4, imgsz=64, half=False, workers=2,
    )
    assert results["seen"] == 4
    assert 0 <= results["miou"] <= 1
    assert np.isfinite(results["map50"])


def test_val_cli_act_store_fp8(train_run, micro_root):
    """--act-store fp8 (fp8 activation storage, bf16 compute) runs the full
    val path and lands near the bf16 result (PERF.md: a wash on v5e, kept
    for fp8-native TPUs)."""
    from desenet_tpu.cli.val import run

    kw = dict(batch_size=4, imgsz=64, half=True, workers=2)
    base = run(os.path.join(micro_root, "data.yaml"),
               os.path.join(train_run["save_dir"], "last"), **kw)
    res = run(os.path.join(micro_root, "data.yaml"),
              os.path.join(train_run["save_dir"], "last"),
              act_store="fp8", **kw)
    assert res["seen"] == 4
    assert abs(res["miou"] - base["miou"]) < 0.05
    assert np.isfinite(res["map50"])


def test_val_cli_ensemble(train_run, micro_root):
    """Multi-weights val: joint-NMS ensemble of last + best_stripped
    (reference --weights nargs + -> attempt_load Ensemble)."""
    from desenet_tpu.cli.val import run

    sd = train_run["save_dir"]
    results = run(
        os.path.join(micro_root, "data.yaml"),
        [os.path.join(sd, "last"), os.path.join(sd, "best_stripped")],
        batch_size=4, imgsz=64, half=False, workers=2,
    )
    assert results["seen"] == 4
    assert 0 <= results["miou"] <= 1
    assert np.isfinite(results["map50"])


def test_multiscale_and_image_weights(micro_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("runs_ms")
    cfg = TrainConfig(
        data=os.path.join(micro_root, "data.yaml"),
        cfg=os.path.join(HERE, "configs", "tiny_psp2.yaml"),
        epochs=2, batch_size=4, imgsz=64, workers=2,
        project=str(out), name="ms", exist_ok=True,
        dtype="float32", nbs=4, warmup_floor=4, noautoanchor=True,
        use_tb=False, max_targets=32, noval=True,
        multi_scale=True, image_weights=True,
    )
    res = train(cfg)
    with open(os.path.join(res["save_dir"], "results.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 3
    # losses finite through randomly-resized batches
    vals = [v for v in lines[-1].split(",") if v != ""]
    assert all(np.isfinite(float(v)) for v in vals)


def test_train_spatial_partitioned(micro_root, tmp_path_factory):
    """--spatial 2 end-to-end: the engine builds a (data x spatial) mesh,
    shards image/label height, and trains to finite losses. 128px is the
    floor for spatial=2 at stride 32 (check_spatial); 64px must be rejected
    up front."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    out = tmp_path_factory.mktemp("runs_sp")
    cfg = TrainConfig(
        data=os.path.join(micro_root, "data.yaml"),
        cfg=os.path.join(HERE, "configs", "tiny_psp2.yaml"),
        epochs=1, batch_size=4, imgsz=128, workers=2,
        project=str(out), name="sp", exist_ok=True,
        dtype="float32", nbs=4, warmup_floor=4, noautoanchor=True,
        use_tb=False, max_targets=32, noval=True, spatial=2,
    )
    res = train(cfg)
    with open(os.path.join(res["save_dir"], "results.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 2
    vals = [v for v in lines[-1].split(",") if v != ""]
    assert all(np.isfinite(float(v)) for v in vals)

    from dataclasses import replace
    with pytest.raises(ValueError, match="below"):
        train(replace(cfg, imgsz=64, name="sp_bad"))


def test_detect_cli_video(train_run, micro_root, tmp_path_factory):
    """End-to-end video path: LoadImages video iteration + detect CLI's
    cv2.VideoWriter output (reference scripts/detect.py:256-268)."""
    import cv2
    from desenet_tpu.cli.detect import run as detect_run

    src_dir = tmp_path_factory.mktemp("vidsrc")
    vid = str(src_dir / "clip.mp4")
    writer = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (96, 96))
    if not writer.isOpened():
        pytest.skip("cv2 build lacks mp4v encoder")
    img_dir = os.path.join(micro_root, "Images", "val")
    frames = sorted(os.listdir(img_dir))[:3]
    for name in frames:
        frame = cv2.imread(os.path.join(img_dir, name))
        for _ in range(2):  # 6 frames total
            writer.write(frame)
    writer.release()

    out = tmp_path_factory.mktemp("det_vid")
    save_dir = detect_run(
        os.path.join(train_run["save_dir"], "last"), vid,
        imgsz=64, conf_thres=0.1, half=False,
        project=str(out), name="v", exist_ok=True,
    )
    out_vid = os.path.join(save_dir, "clip.mp4")
    assert os.path.exists(out_vid)
    cap = cv2.VideoCapture(out_vid)
    n, ok = 0, True
    while ok:
        ok, _ = cap.read()
        n += ok
    cap.release()
    assert n == 6  # every source frame annotated and re-encoded


def test_detect_cli(train_run, micro_root, tmp_path_factory):
    from desenet_tpu.cli.detect import run as detect_run

    out = tmp_path_factory.mktemp("det")
    save_dir = detect_run(
        os.path.join(train_run["save_dir"], "last"),
        os.path.join(micro_root, "Images", "val"),
        imgsz=64, conf_thres=0.1, half=False, save_txt=True,
        project=str(out), name="d", exist_ok=True,
    )
    files = os.listdir(save_dir)
    assert any(f.endswith("_seg.jpg") for f in files)
    assert any(f.endswith(".jpg") and not f.endswith("_seg.jpg")
               for f in files)


def test_val_speed_task(train_run, micro_root):
    """--task speed: steady-state ms/image on the device (val.py:384-402
    analog); must run and report a finite positive latency."""
    from desenet_tpu.cli.val import run_speed

    dt = run_speed(os.path.join(micro_root, "data.yaml"),
                   os.path.join(train_run["save_dir"], "last"),
                   batch_size=2, imgsz=64, half=False)
    assert np.isfinite(dt) and dt > 0


def test_show_seg_miou_cli(train_run, micro_root):
    """Standalone seg-mIoU report (scripts/show_seg_mIoU.py analog)."""
    from desenet_tpu.cli.show_seg_miou import run

    miou = run(os.path.join(micro_root, "data.yaml"),
               os.path.join(train_run["save_dir"], "last"),
               batch_size=4, imgsz=64, half=False)
    assert 0 <= miou <= 1


def test_val_save_json_coco_end_to_end(train_run, micro_root, tmp_path):
    """--save-json + --coco: full chain from val predictions to the vendored
    COCOeval (reference val.py:312-335). Builds the ground-truth
    instances.json from the micro dataset's DeLabels."""
    import glob
    import json

    from PIL import Image

    from desenet_tpu.cli.val import run

    # dataset -> COCO gt (image_id = filename stem, like _append_json)
    images, annos = [], []
    aid = 1
    for p in sorted(glob.glob(os.path.join(micro_root, "Images", "val",
                                           "*.jpg"))):
        stem = os.path.splitext(os.path.basename(p))[0]
        w, h = Image.open(p).size
        images.append({"id": stem, "width": w, "height": h,
                       "file_name": os.path.basename(p)})
        lp = os.path.join(micro_root, "DeLabels", "val", stem + ".txt")
        for line in open(lp).read().split("\n"):
            if not line.strip():
                continue
            c, x, y, bw, bh = map(float, line.split())
            annos.append({
                "id": aid, "image_id": stem, "category_id": int(c),
                "bbox": [(x - bw / 2) * w, (y - bh / 2) * h, bw * w, bh * h],
                "area": bw * w * bh * h, "iscrowd": 0,
            })
            aid += 1
    gt = {"images": images, "annotations": annos,
          "categories": [{"id": i} for i in range(3)]}
    anno_path = str(tmp_path / "instances_val.json")
    with open(anno_path, "w") as f:
        json.dump(gt, f)

    save_dir = str(tmp_path / "valout")
    results = run(
        os.path.join(micro_root, "data.yaml"),
        os.path.join(train_run["save_dir"], "last"),
        batch_size=4, imgsz=64, half=False, workers=2,
        save_json=True, save_dir=save_dir, coco_anno=anno_path,
    )
    pred_json = os.path.join(save_dir, "predictions.json")
    assert os.path.isfile(pred_json)
    with open(pred_json) as f:
        preds = json.load(f)
    assert all({"image_id", "category_id", "bbox", "score"} <= set(r)
               for r in preds)
    # run() folds the COCO-protocol AP back into results
    assert np.isfinite(results["map50"]) and np.isfinite(results["map"])


def test_export_stablehlo_roundtrip(train_run, tmp_path):
    """Serving export (tools/export_model.py, the reference's ONNX/TF
    backend replacement): serialize the full inference program, deserialize
    it fresh, and check it reproduces the live model's outputs."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import export_model

    out = str(tmp_path / "model.stablehlo")
    export_model.main([
        os.path.join(train_run["save_dir"], "last"), out,
        "--batch", "1", "--img-size", "64", "--fp32",
    ])
    assert os.path.getsize(out) > 1000
    with open(out + ".json") as f:
        import json
        meta = json.load(f)
    assert meta["img_size"] == 64

    exp = jexport.deserialize(open(out, "rb").read())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    boxes, scores, classes, num, seg = exp.call(img)
    assert boxes.shape[0] == 1 and boxes.shape[2] == 4
    assert seg.shape == (1, 64, 64) and seg.dtype == jnp.uint8

    # parity with the live program
    from desenet_tpu.models import build_model, config_path
    from desenet_tpu.ops import non_max_suppression
    from desenet_tpu.utils.checkpoint import load_inference_variables

    variables, m = load_inference_variables(
        os.path.join(train_run["save_dir"], "last"))
    model, _ = build_model(config_path(m["cfg"]), nc=m["de_nc"],
                           se_nc=m["se_nc"], dtype=jnp.float32)
    (dec, _), segl = model.apply(variables, img.astype(jnp.float32) / 255.0,
                                 train=False)
    ref = non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                              max_det=300, pre_topk=1024, backend="xla")
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref.boxes),
                               atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(seg), np.asarray(jnp.argmax(segl, -1).astype(jnp.uint8)))


def test_export_consumed_outside_framework(train_run, tmp_path):
    """The exported artifact must be usable WITHOUT desenet_tpu: the
    examples/consume_exported_model.py script imports only jax/numpy/stdlib
    (AST-enforced here) and successfully runs the artifact in a fresh
    subprocess."""
    import ast
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    consumer = os.path.join(repo, "examples", "consume_exported_model.py")

    # static guarantee: no framework imports in the consumer
    tree = ast.parse(open(consumer).read())
    mods = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            mods.update(a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom) and node.module:
            mods.add(node.module.split(".")[0])
    assert "desenet_tpu" not in mods, mods
    assert mods <= {"json", "sys", "numpy", "jax", "PIL"}, mods

    sys.path.insert(0, os.path.join(repo, "tools"))
    import export_model

    out = str(tmp_path / "model.stablehlo")
    export_model.main([
        os.path.join(train_run["save_dir"], "last"), out,
        "--batch", "1", "--img-size", "64", "--fp32",
    ])
    img = np.random.default_rng(3).integers(0, 255, (50, 70, 3), np.uint8)
    img_path = str(tmp_path / "img.npy")
    np.save(img_path, img)
    # empty PALLAS_AXON_POOL_IPS or the sitecustomize re-registers the TPU
    # plugin and the cpu-lowered artifact refuses to run
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, consumer, out, img_path],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr
    assert "detections" in proc.stdout and "seg class histogram" in proc.stdout


def test_predictor_int8(train_run, micro_root):
    """int8 serving path (round 4): Predictor(int8=True) calibrates on
    caller images, runs the quantized graph (full-res seg argmax, no
    phase stem), and returns the same surface as the fp Predictor."""
    from desenet_tpu.api import load_predictor

    val_dir = os.path.join(micro_root, "Images", "val")
    imgs = [os.path.join(val_dir, f) for f in sorted(os.listdir(val_dir))[:3]]
    w = os.path.join(train_run["save_dir"], "last")
    kw = dict(imgsz=64, half=False, conf_thres=1e-6, max_det=20)
    q = load_predictor(w, int8=True, calib=imgs[:2], **kw)
    assert q.int8 and q.stem_s2d is False
    fp = load_predictor(w, stem_s2d=False, **kw)

    rq, rf = q([imgs[0]]), fp([imgs[0]])
    assert rq.masks[0].shape == rf.masks[0].shape == (96, 96)
    assert len(rq.xyxy[0]) > 0 and len(rf.xyxy[0]) > 0
    # quantized masks track fp (seg is at parity on real ckpts)
    assert (rq.masks[0] != rf.masks[0]).mean() < 0.1

    with pytest.raises(ValueError, match="calib"):  # survives python -O
        load_predictor(w, int8=True, **kw)
