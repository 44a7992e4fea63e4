"""Validation CLI — reference scripts/val.py equivalent.

    python -m desenet_tpu.cli.val --data data.yaml --weights runs/train/exp/best

Tasks: val/test (metrics), speed (latency sweep), study (size sweep) —
mirroring val.py:384-402.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from desenet_tpu.data import create_mixed_dataloader
from desenet_tpu.eval.validator import Validator
from desenet_tpu.models import build_model, config_path
from desenet_tpu.utils.checkpoint import load_inference_variables
from desenet_tpu.utils.general import coco80_to_coco91_class
from desenet_tpu.utils.general import check_dataset, check_img_size, set_logging


def run(
    data,
    weights,
    batch_size=32,
    imgsz=640,
    conf_thres=0.001,
    iou_thres=0.6,
    task="val",
    single_cls=False,
    verbose=False,
    half=True,
    plots=False,
    save_dir="",
    workers=8,
    augment=False,
    save_txt=False,
    save_conf=False,
    save_json=False,
    save_hybrid=False,
    coco_anno="",
    int8=False,
    calib_batches=2,
    int8_bias_correct=True,
    int8_mse_clip=False,
    int8_weights_only=False,
    int8_per_channel=True,
    int8_fp_hops=1,
    act_store=None,
):
    # COCO-protocol exports need the sparse 91-id category space when the
    # dataset is real COCO (reference val.py:204: class_map =
    # coco80_to_coco91_class() if is_coco else identity)
    is_coco = str(data).endswith("coco.yaml")
    data = check_dataset(data)
    dtype = jnp.bfloat16 if half else jnp.float32
    weights_list = ([weights] if isinstance(weights, (str, os.PathLike))
                    else list(weights))
    if len(weights_list) > 1:
        # multi-checkpoint ensemble: joint NMS over concatenated decodes
        # (reference val.py --weights nargs + -> attempt_load Ensemble,
        # experimental.py:78-108)
        assert not int8, "--int8 does not support ensembles"
        assert act_store is None, "--act-store does not support ensembles"
        from desenet_tpu.eval.ensemble import EnsembleModel, load_ensemble

        members = load_ensemble(weights_list, dtype=dtype)
        meta = members[0][2]
        model = EnsembleModel([m for m, _, _ in members])
        spec = model.spec
        variables = tuple(v for _, v, _ in members)
    else:
        variables, meta = load_inference_variables(weights_list[0])
        assert meta is not None, "checkpoint missing meta.json"
        model, spec = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                                  se_nc=meta["se_nc"], dtype=dtype,
                                  act_store=act_store)
    imgsz = check_img_size(imgsz, s=max(spec.det_strides))

    if int8 and act_store is not None:
        raise ValueError("--int8 and --act-store are mutually exclusive "
                         "inference modes")
    if int8:
        # W8A8 PTQ (quant.py): calibrate activation scales on a few val-task
        # batches, then swap in the int8 inference model. The reference has
        # no quantized path (fp16 only, val.py:178); report the accuracy
        # delta against --half via a second run.
        from desenet_tpu import quant as Q

        calib_loader, _ = create_mixed_dataloader(
            data.get("train", data["val"]), img_size=imgsz,
            batch_size=min(8, batch_size), augment=False, rect=False,
            stride=max(spec.det_strides), single_cls=single_cls, workers=2,
        )
        calib = []
        for b in calib_loader:
            calib.append(jnp.asarray(b["image"], jnp.float32) / 255.0)
            if len(calib) >= calib_batches:
                break
        model, spec, _ = Q.quantize_for_inference(
            config_path(meta["cfg"]), variables, calib, nc=meta["de_nc"],
            se_nc=meta["se_nc"], dtype=dtype,
            bias_correct=int8_bias_correct, mse_clip=int8_mse_clip,
            weights_only=int8_weights_only,
            per_channel_act=int8_per_channel, det_fp_hops=int8_fp_hops)
        print(f"int8: calibrated on {len(calib)} batches "
              f"(bias_correct={int8_bias_correct} mse_clip={int8_mse_clip} "
              f"weights_only={int8_weights_only} "
              f"per_channel={int8_per_channel} fp_hops={int8_fp_hops})")

    nc = 1 if single_cls else int(data["de"]["nc"])
    se_nc = int(data["se"]["nc"])
    names = {i: n for i, n in enumerate(meta.get("de_names", map(str, range(nc))))}

    task = task if task in ("train", "val", "test") else "val"
    loader, _ = create_mixed_dataloader(
        data[task], img_size=imgsz, batch_size=batch_size, augment=False,
        rect=True, pad=0.5, stride=max(spec.det_strides),
        single_cls=single_cls, workers=workers,
    )
    validator = Validator(
        model, nc=nc, se_nc=se_nc, conf_thres=conf_thres,
        iou_thres=iou_thres, single_cls=single_cls, plots=plots,
        save_dir=save_dir, names=names, augment=augment,
        save_txt=save_txt, save_conf=save_conf, save_json=save_json,
        save_hybrid=save_hybrid,
        class_map=(coco80_to_coco91_class() if is_coco else None),
    )
    if save_hybrid:
        print("WARNING: --save-hybrid returns high mAP from hybrid "
              "labels, not from predictions alone (reference val.py:296)")
    results = validator.run(variables, loader)

    pf = "%20s" + "%11i" * 1 + "%11.3g" * 6
    print(("%20s" + "%11s" * 7) % ("Class", "Images", "P", "R", "mAP@.5",
                                   "mAP@.5:.95", "mIoU", "pixAcc"))
    print(pf % ("all", results["seen"], results["mp"], results["mr"],
                results["map50"], results["map"], results["miou"],
                results["pix_acc"]))
    if verbose:
        for c, m in results["per_class"].items():
            print(f"{names.get(c, c):>20} {m['p']:.3f} {m['r']:.3f} "
                  f"{m['ap50']:.3f} {m['ap']:.3f}")
    sp = results["speed_ms"]
    print(f"Speed: {sp[0]:.1f}ms host-stage, {sp[1]:.1f}ms device "
          f"(fwd+decode+NMS), {sp[2]:.1f}ms metrics per image")

    # COCO-protocol mAP over the exported predictions (val.py:312-335);
    # pycocotools is vendored as eval/coco.py in this image.
    if save_json and save_dir:
        anno = coco_anno or os.path.join(
            data.get("path", "../coco"), "annotations",
            "instances_val2017.json")
        pred_json = os.path.join(save_dir, "predictions.json")
        if os.path.isfile(anno) and os.path.isfile(pred_json):
            from desenet_tpu.eval.coco import evaluate_coco

            print(f"\nEvaluating COCO mAP on {pred_json}...")
            stats = evaluate_coco(anno, pred_json)
            results["map"], results["map50"] = float(stats[0]), float(stats[1])
        elif coco_anno:
            print(f"COCO eval skipped: {anno} or {pred_json} not found")
    return results


def run_speed(data, weights, batch_size=32, imgsz=640, half=True):
    """--task speed: steady-state device latency at the val shape."""
    variables, meta = load_inference_variables(weights)
    dtype = jnp.bfloat16 if half else jnp.float32
    model, spec = build_model(config_path(meta["cfg"]), nc=meta["de_nc"],
                              se_nc=meta["se_nc"], dtype=dtype)
    from desenet_tpu.ops import non_max_suppression

    # weights closed over as compile-time constants (fixed checkpoint):
    # XLA picks its own weight layouts — 6% faster (PERF.md round 3)
    @jax.jit
    def step(key):
        x = jax.random.uniform(key, (batch_size, imgsz, imgsz, 3), dtype)
        (dec, _), seg = model.apply(variables, x, train=False)
        nms = non_max_suppression(dec, 0.001, 0.6, multi_label=True)
        return nms.num.sum() + jnp.argmax(seg, -1).sum(dtype=jnp.int32)

    k = jax.random.PRNGKey(0)
    step(k).block_until_ready()
    t0 = time.perf_counter()
    n = 8
    outs = [step(kk) for kk in jax.random.split(k, n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n / batch_size * 1e3
    print(f"{dt:.2f} ms/image at batch {batch_size}, {imgsz}px")
    return dt


def parse_opt(argv=None):
    p = argparse.ArgumentParser("desenet_tpu val")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--weights", type=str, nargs="+", required=True,
                   help="checkpoint dir(s); >1 runs a joint-NMS ensemble "
                        "(reference attempt_load)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", "--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--task", type=str, default="val",
                   choices=["val", "test", "train", "speed", "study"])
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--no-half", action="store_true")
    p.add_argument("--plots", action="store_true")
    p.add_argument("--save-dir", type=str, default=None,
                   help="explicit output dir (overrides --project/--name)")
    p.add_argument("--project", type=str, default="runs/val",
                   help="output root (reference val.py --project)")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--augment", action="store_true", help="TTA inference")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-json", action="store_true")
    p.add_argument("--save-hybrid", action="store_true",
                   help="inject GT labels pre-NMS and save hybrid "
                        "label+prediction txt (auto-labelling)")
    p.add_argument("--coco-anno", type=str, default="",
                   help="COCO instances json for vendored COCOeval "
                        "(default: <data path>/annotations/instances_val2017.json)")
    p.add_argument("--int8", action="store_true",
                   help="int8 W8A8 PTQ inference (calibrates on train "
                        "batches). Measured at parity on the s640 ckpt: "
                        "mAP50 0.373 == bf16, mIoU 0.930 (per-channel "
                        "activation scales + bias correction, the "
                        "defaults); mAP@.5:.95 0.160 vs 0.166 "
                        "(docs/QUANT.md)")
    p.add_argument("--int8-no-bias-correct", action="store_true",
                   help="ablation: disable weight-quantization bias "
                        "correction in the int8 path")
    p.add_argument("--int8-mse-clip", action="store_true",
                   help="per-channel MSE-optimal weight clip search instead "
                        "of absmax scales (AdaRound-family cheap core)")
    p.add_argument("--int8-fp-hops", type=int, default=1,
                   help="keep this many compute layers upstream of Detect "
                        "full-precision under --int8 (1 = the direct "
                        "det-src layers; 2 also keeps their producers fp — "
                        "the mAP@.5:.95 tail-precision lever)")
    p.add_argument("--int8-weights-only", action="store_true",
                   help="ablation: quantize weights only (fp activations) — "
                        "isolates the weight-rounding share of the int8 gap")
    p.add_argument("--int8-per-tensor", action="store_true",
                   help="ablation: per-TENSOR activation scales (the "
                        "round-3 mode; default is per-channel, folded into "
                        "the kernels — same int8 program, better constants)")
    p.add_argument("--act-store", choices=["fp8", "fp8_e5m2"], default=None,
                   help="store block activations in fp8 (bf16 compute; "
                        "eval-only; a wash on v5e — see PERF.md — wins on "
                        "fp8-native TPUs)")
    p.add_argument("--matmul-precision", choices=["default", "high", "highest"],
                   default="default",
                   help="force true-f32 MXU matmuls (use with --no-half) to "
                        "reproduce CPU-f32 parity numbers on TPU; TPU f32 "
                        "otherwise runs a bf16 multi-pass (~1.5%% rel mAP "
                        "drift, PARITY.md)")
    return p.parse_args(argv)


def main(argv=None):
    set_logging()
    o = parse_opt(argv)
    from desenet_tpu.utils.general import (enable_compile_cache,
                                           set_matmul_precision)

    # warm reruns (ablation series: --int8 variants, precision sweeps) skip
    # the multi-minute tunnel compile; host-feature-keyed dir, DESENET_
    # BENCH_NO_CACHE=1 opts out
    enable_compile_cache()
    set_matmul_precision(o.matmul_precision)
    if o.save_dir is None:
        # runs/val/exp, exp2, ... like the reference (val.py:172-173)
        from desenet_tpu.utils.general import increment_path

        o.save_dir = str(increment_path(
            os.path.join(o.project, o.name), exist_ok=o.exist_ok,
            mkdir=True))
    if o.task == "speed":
        return run_speed(o.data, o.weights[0], o.batch_size, o.img_size,
                         not o.no_half)
    if o.task == "study":
        out = {}
        for size in (256, 384, 512, 640):
            out[size] = run_speed(o.data, o.weights[0], o.batch_size, size,
                                  not o.no_half)
        print(json.dumps(out))
        return out
    return run(
        o.data, o.weights, o.batch_size, o.img_size, o.conf_thres,
        o.iou_thres, o.task, o.single_cls, o.verbose, not o.no_half,
        o.plots, o.save_dir, o.workers, o.augment, o.save_txt, o.save_conf,
        o.save_json, coco_anno=o.coco_anno, int8=o.int8,
        int8_bias_correct=not o.int8_no_bias_correct,
        int8_mse_clip=o.int8_mse_clip,
        int8_weights_only=o.int8_weights_only,
        int8_per_channel=not o.int8_per_tensor,
        int8_fp_hops=o.int8_fp_hops,
        save_hybrid=o.save_hybrid, act_store=o.act_store,
    )


if __name__ == "__main__":
    main()
