"""General utilities: dataset/config checks, run-dir management, seeding,
class weighting — reference core/utils/general.py equivalents for the pieces
that are config/bookkeeping (geometry lives in ops/boxes.py; NMS in
ops/nms.py)."""

from __future__ import annotations

import glob
import logging
import math
import os
import random
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

LOGGER = logging.getLogger("desenet_tpu")


def set_logging(verbose: bool = True):
    logging.basicConfig(
        format="%(message)s",
        level=logging.INFO if verbose else logging.WARNING,
    )


def host_cache_tag() -> str:
    """8-hex digest of this host's CPU feature set (for cache-dir keying).

    XLA's persistent compilation cache stores CPU AOT executables whose
    cache key does NOT include host CPU features: after a container
    migrates to a different machine type, stale entries are *loaded* and
    then rejected at run time (cpu_aot_loader "+feature is not supported on
    the host machine"), turning a warm cache into an unbounded recompile —
    which in multi-process runs skews workers enough to blow the ~30 s
    gloo rendezvous window. Keying the cache DIRECTORY by the feature set
    turns that silent rot into a clean cold-cache miss on the new host.
    """
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo", encoding="utf-8", errors="ignore") as f:
            for ln in f:
                if ln.split(":")[0].strip() in ("flags", "Features"):
                    feats += " " + " ".join(sorted(ln.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:8]


def enable_compile_cache(root: Optional[str] = None):
    """Point JAX's persistent compilation cache at <repo>/.jax_cache-<host>.

    One shared helper for every bench/probe entry point (bench.py,
    tools/bench_family.py, tools/probe_bench_parts.py,
    tools/bench_train_e2e.py): warm reruns skip the multi-minute tunnel
    compile. Honors DESENET_BENCH_NO_CACHE=1 (flag-sweep probes must not
    cross-pollinate executables compiled under different options). The dir
    is keyed by :func:`host_cache_tag` so executables AOT-compiled on a
    different machine type are never loaded.
    """
    if os.environ.get("DESENET_BENCH_NO_CACHE"):
        return
    import jax

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, f".jax_cache-{host_cache_tag()}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def set_matmul_precision(name: str):
    """Set JAX's default matmul/conv precision for parity-grade eval.

    TPU f32 matmuls default to a bf16 multi-pass ("default"), which drifts
    val mAP ~1.5% rel vs CPU f32 (PARITY.md §2b). `highest` forces true-f32
    MXU passes so on-device numbers reproduce the CPU parity gate. Only
    meaningful with f32 params/inputs (``--no-half``): bf16 data has no
    extra bits for the MXU to keep.
    """
    if name in (None, "default"):
        return
    assert name in ("high", "highest"), name
    import jax

    jax.config.update("jax_default_matmul_precision", name)


def colorstr(*input):
    """colorstr('blue', 'hello world') — ANSI colored string."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bold": "\033[1m", "underline": "\033[4m", "end": "\033[0m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def init_seeds(seed: int = 0):
    """Seed python/numpy RNGs (general.py:104-112); JAX keys are explicit."""
    random.seed(seed)
    np.random.seed(seed)


def check_dataset(data) -> Dict:
    """Load + validate a dataset yaml with de/se class blocks
    (general.py:318-372). Returns the dict with absolute paths."""
    if isinstance(data, (str, Path)):
        with open(data, encoding="utf-8") as f:
            data = yaml.safe_load(f)
    for k in ("train", "val"):
        assert k in data, f"dataset yaml missing '{k}' key"
    for k in ("de", "se"):
        assert k in data, f"dataset yaml missing '{k}' block"
        assert "nc" in data[k] and "names" in data[k], (
            f"dataset '{k}' block needs nc + names"
        )
        assert len(data[k]["names"]) == int(data[k]["nc"]), (
            f"{k}: len(names) != nc"
        )
    for k in ("train", "val", "test"):
        if data.get(k):
            p = Path(data[k])
            assert p.exists(), f"dataset path does not exist: {p}"
    return data


def check_img_size(imgsz: int, s: int = 32, floor: int = 0) -> int:
    """Round image size to a stride multiple (general.py:256-264)."""
    new = max(make_divisible(int(imgsz), s), floor)
    if new != imgsz:
        LOGGER.warning("img size %d not a multiple of %d, using %d", imgsz, s,
                       new)
    return new


def make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent 'last' checkpoint dir under ``search_dir`` — the bare
    ``--resume`` target (reference general.py:115-118 globs last*.pt; our
    checkpoints are orbax dirs marked by meta.json)."""
    metas = glob.glob(os.path.join(search_dir, "**", "last", "meta.json"),
                      recursive=True)
    return os.path.dirname(max(metas, key=os.path.getmtime)) if metas else ""


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False):
    """runs/exp -> runs/exp2, exp3... (general.py:858-872)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() \
            else (path, "")
        dirs = glob.glob(f"{path}{sep}*")
        matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.stem), d)
                   for d in dirs]
        i = [int(m.groups()[0]) for m in matches if m]
        n = max(i) + 1 if i else 2
        path = Path(f"{path}{sep}{n}{suffix}")
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def labels_to_class_weights(labels: Sequence[np.ndarray], nc: int) -> np.ndarray:
    """Inverse-frequency class weights (general.py:451-467). labels: list of
    (n, 5) [cls, xywh]."""
    if not len(labels):
        return np.ones(nc) / nc
    classes = np.concatenate(
        [l[:, 0] for l in labels if len(l)] or [np.zeros(0)], 0
    ).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    weights /= weights.sum()
    return weights


def labels_to_image_weights(labels, nc: int, class_weights: np.ndarray):
    """Per-image sampling weights from class weights (general.py:470-475)."""
    counts = np.array(
        [np.bincount(l[:, 0].astype(int), minlength=nc) if len(l)
         else np.zeros(nc) for l in labels]
    )
    return (class_weights.reshape(1, nc) * counts).sum(1)


def one_cycle_np(y1=1.0, y2=1.0, steps=100):
    """Host-side one-cycle lambda (general.py:421-423)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def check_environment(min_python=(3, 10)) -> Dict:
    """Environment banner + sanity checks — the reference's
    check_python/check_requirements/check_git_status analog (general.py:
    187-316) reduced to what matters here: interpreter version, JAX backend,
    device inventory. No pip auto-install (offline builds)."""
    import platform
    import sys as _sys

    assert _sys.version_info >= min_python, (
        f"python {min_python} required, running {platform.python_version()}"
    )
    info = {"python": platform.python_version()}
    try:
        import jax

        info["jax"] = jax.__version__
        info["backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # noqa: BLE001
        info["jax_error"] = str(e)
    LOGGER.info("environment: %s", info)
    return info


class Timeout:
    """SIGALRM timeout context (general.py:56-74); seconds=0 disables."""

    def __init__(self, seconds: int, timeout_msg: str = "",
                 suppress_timeout_errors: bool = True):
        import signal

        self.seconds = int(seconds)
        self.msg = timeout_msg
        self.suppress = suppress_timeout_errors
        self._signal = signal

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg)

    def __enter__(self):
        if self.seconds > 0:
            self._signal.signal(self._signal.SIGALRM, self._handler)
            self._signal.alarm(self.seconds)

    def __exit__(self, exc_type, exc, tb):
        if self.seconds > 0:
            self._signal.alarm(0)
        if self.suppress and exc_type is TimeoutError:
            return True
        return False


def try_except(func):
    """Exception-swallowing decorator (general.py:77-85)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — by design
            LOGGER.warning("%s: %s", func.__name__, e)

    return wrapper


def check_suffix(file, suffix=(".ckpt",), msg=""):
    """Assert file(s) carry an accepted suffix (general.py check_suffix)."""
    if isinstance(suffix, str):
        suffix = (suffix,)
    for f in file if isinstance(file, (list, tuple)) else [file]:
        s = Path(f).suffix.lower()
        if s:
            assert s in suffix, f"{msg}{f} acceptable suffix is {suffix}"


def check_file(file: str) -> str:
    """Resolve a file locally (search cwd + package dirs); the reference also
    auto-downloads URLs (general.py check_file) — zero-egress here."""
    file = str(file)
    if os.path.isfile(file) or not file:
        return file
    if file.startswith(("http:/", "https:/")):
        raise FileNotFoundError(
            f"cannot download {file}: this build is offline; fetch it "
            "manually and pass a local path"
        )
    found = glob.glob(os.path.join("**", file), recursive=True)
    assert found, f"file not found: {file}"
    assert len(found) == 1, f"multiple matches for {file}: {found}"
    return found[0]


def check_yaml(file, suffix=(".yaml", ".yml")):
    check_suffix(file, suffix)
    return check_file(file)


def print_args(name: str, opt):
    LOGGER.info("%s: %s", colorstr(name + ": "),
                ", ".join(f"{k}={v}" for k, v in vars(opt).items()))


def user_config_dir(dir_name: str = "desenet_tpu", env_var: str =
                    "DESENET_CONFIG_DIR") -> Path:
    """Writable per-user config dir (general.py user_config_dir)."""
    env = os.getenv(env_var)
    if env:
        path = Path(env)
    else:
        path = Path.home() / ".config" / dir_name
    path.mkdir(parents=True, exist_ok=True)
    return path


def coco80_to_coco91_class() -> List[int]:
    """COCO 80-class index -> paper 91-class ids (general.py:478-487)."""
    return [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20,
        21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
        41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
        59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79,
        80, 81, 82, 84, 85, 86, 87, 88, 89, 90,
    ]


def save_one_box(xyxy, im, file="crop.jpg", gain=1.02, pad=10, square=False,
                 BGR=True, save=True):
    """Crop a (padded, optionally squared) box from an image and save it
    (general.py save_one_box)."""
    import cv2
    import numpy as _np

    b = _np.asarray(xyxy, _np.float32).reshape(4)
    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    bw, bh = (b[2] - b[0]), (b[3] - b[1])
    if square:
        bw = bh = max(bw, bh)
    bw, bh = bw * gain + pad, bh * gain + pad
    x1 = int(max(cx - bw / 2, 0))
    y1 = int(max(cy - bh / 2, 0))
    x2 = int(min(cx + bw / 2, im.shape[1]))
    y2 = int(min(cy + bh / 2, im.shape[0]))
    crop = im[y1:y2, x1:x2, :: (1 if BGR else -1)]
    if save:
        Path(file).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(file), crop)
    return crop


def apply_classifier(boxes_xyxy, classes, im0, classifier_fn, size=224):
    """Second-stage classifier filter (reference general.py:808-840): square
    each detection box, pad it 1.3x + 30 px, crop from the original image,
    resize to `size`, batch the RGB 0-1 float crops through classifier_fn
    (NHWC float32 -> class scores), and keep detections whose classifier
    argmax agrees with the detector class. Returns a boolean keep mask.

    The reference's detect.py ships this permanently disabled (classify =
    False hardcoded, detect.py:79, and it needs an external resnet50.pt);
    here it is a working library utility for any classifier, e.g. a model
    built with a `Classify` head (models/layers.py). Crops are clipped to
    the image like the reference's scale_coords-clipped boxes."""
    import cv2
    import numpy as _np

    boxes = _np.asarray(boxes_xyxy, _np.float32).reshape(-1, 4)
    classes = _np.asarray(classes).reshape(-1)
    if len(boxes) == 0:
        return _np.ones(0, bool)
    cx, cy = (boxes[:, 0] + boxes[:, 2]) / 2, (boxes[:, 1] + boxes[:, 3]) / 2
    side = _np.maximum(boxes[:, 2] - boxes[:, 0],
                       boxes[:, 3] - boxes[:, 1]) * 1.3 + 30  # square + pad
    h0, w0 = im0.shape[:2]
    x1 = _np.clip((cx - side / 2).astype(int), 0, w0 - 1)
    y1 = _np.clip((cy - side / 2).astype(int), 0, h0 - 1)
    x2 = _np.clip((cx + side / 2).astype(int), 1, w0)
    y2 = _np.clip((cy + side / 2).astype(int), 1, h0)
    ims = []
    for a1, b1, a2, b2 in zip(x1, y1, x2, y2):
        cut = im0[b1:max(b2, b1 + 1), a1:max(a2, a1 + 1)]
        im = cv2.resize(cut, (size, size))[:, :, ::-1]  # BGR -> RGB
        ims.append(_np.ascontiguousarray(im, _np.float32) / 255.0)
    pred_cls = _np.asarray(classifier_fn(_np.stack(ims))).argmax(1)
    return pred_cls == classes.astype(pred_cls.dtype)


def attempt_download(file, url: str = ""):
    """Reference google_utils.attempt_download fetches release assets; this
    build is zero-egress, so only local resolution is supported."""
    p = Path(str(file))
    if p.exists():
        return str(p)
    raise FileNotFoundError(
        f"{file} not found locally and downloads are disabled in this "
        f"offline build{' (wanted ' + url + ')' if url else ''}"
    )


def print_mutation(results: dict, hyp: dict, save_dir: str):
    """Hyperparameter-evolution bookkeeping (general.py:769-805): append the
    (metrics, hyp) row to evolve.csv and keep the best row in
    hyp_evolve.yaml. (The reference kept only this helper; the evolve loop
    itself was not ported from YOLOv5.)"""
    import csv

    os.makedirs(save_dir, exist_ok=True)
    csv_path = os.path.join(save_dir, "evolve.csv")
    keys = list(results.keys()) + list(hyp.keys())
    vals = list(results.values()) + list(hyp.values())
    new = not os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(keys)
        w.writerow([f"{float(v):.5g}" for v in vals])

    # keep best generation in yaml
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    fit_key = "fitness" if "fitness" in results else keys[0]
    best = max(rows, key=lambda r: float(r[fit_key]))
    with open(os.path.join(save_dir, "hyp_evolve.yaml"), "w") as f:
        f.write(f"# best of {len(rows)} generations "
                f"({fit_key}={best[fit_key]})\n")
        yaml.safe_dump({k: float(best[k]) for k in hyp}, f)


class EarlyStopping:
    """Fitness-plateau stopper (torch_utils.py:284-301)."""

    def __init__(self, patience: int = 30):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(
                "EarlyStopping: no improvement in last %d epochs "
                "(best epoch %d). Stopping.", self.patience, self.best_epoch,
            )
        return stop
