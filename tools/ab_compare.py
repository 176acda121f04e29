#!/usr/bin/env python
"""Score the AP-parity A/B (round-2 verdict items 2 & 9).

Part A — evaluate the TRAINED torch reference with its own forward + decode
(ref utils/eval_util.py:35-71 flow, run in place on CPU with the stubs from
tools/bench_reference_decode.py), writing {0_dets,0_infos}.json in the same
protocol as our eval pipeline, then scoring with the native official-protocol
AP (evaluation/cityscapes_ap.py) — the same scorer used for OUR model, so
the comparison isolates model+decode quality.

Part B — round-trip the trained checkpoint through
tools/convert_torch_weights.py into our model and evaluate it with OUR
on-device decode: a real trained-checkpoint conversion (verdict item 9),
whose AP must match Part A's closely and whose detections are compared 1:1.

Usage:
  python tools/ab_compare.py --ref_ckpt /tmp/iseg_ab/ref_final.pth \
      --out /tmp/iseg_ab    # after tools/ab_reference_train.py
Prints one JSON line with ref/converted AP + detection-match stats.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def eval_reference(ref_ckpt: str, root: str, out_dir: str, compound: int):
    """Torch reference forward + its decode over the val split -> dets json
    (ref eval_util.py:35-71), returns the dets/infos paths."""
    from bench_reference_decode import _stub_torchvision
    import numpy as np
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    _stub_torchvision()
    import types
    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        pc.mask = types.ModuleType("pycocotools.mask")
        pc.coco = types.ModuleType("pycocotools.coco")
        pc.coco.COCO = object
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.mask"] = pc.mask
        sys.modules["pycocotools.coco"] = pc.coco
    sys.path.insert(0, REF)

    import data as ref_data
    from configs import Config as RefConfig, Configer as RefConfiger
    from models import EfficientSeg as RefEfficientSeg
    from utils.tranform import CommonTransforms as RefTransforms
    from utils import decode as ref_decode

    os.makedirs(out_dir, exist_ok=True)
    blob_cfg = json.load(open(os.path.join(REF, "configs", "trans_cfg.json")))
    blob_cfg["val_trans"] = {"trans_seq": ["resize"],
                             "resize": {"target_size": 2}}
    tmp_cfg = os.path.join(out_dir, "ref_trans_cfg.json")
    json.dump(blob_cfg, open(tmp_cfg, "w"))
    trans_cfg = RefConfiger(configs=tmp_cfg)
    transforms = RefTransforms(trans_cfg, "val")
    loader = ref_data.get_dataloader(1, "cityscapes", root, phase="val",
                                     transforms=transforms)

    device = torch.device("cpu")
    model = RefEfficientSeg(
        num_classes=8, compound_coef=compound,
        ratios=[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)],
        scales=[2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]).to(device)
    sd = torch.load(ref_ckpt, map_location="cpu")
    model.load_state_dict(sd["state_dict"] if "state_dict" in sd else sd)
    model.eval()

    # modern-torch shims (same as tools/bench_reference_decode.py)
    _orig_masked_select = torch.Tensor.masked_select
    torch.Tensor.masked_select = \
        lambda self, m: _orig_masked_select(self, m.bool())
    decode_cfg = RefConfig(os.path.join(REF, "configs", "decode_cfg.yaml"))
    decode_cfg.draw_flag = False
    ref_decode.device = device
    ref_decode.target_size = 2

    dets_list, info_list = [], []
    with torch.no_grad():
        for inputs, targets, infos in loader:
            outputs = model(inputs.to(device))
            dets = ref_decode.decode_output(inputs, outputs, infos, transforms,
                                            decode_cfg, device)
            dets_list.extend(dets)
            info_list.extend([(i.img_path, list(i.img_size)) for i in infos])

    class NpEnc(json.JSONEncoder):
        def default(self, o):
            if isinstance(o, np.integer):
                return int(o)
            if isinstance(o, np.floating):
                return float(o)
            if isinstance(o, np.ndarray):
                return o.tolist()
            return super().default(o)

    with open(os.path.join(out_dir, "0_dets.json"), "w") as f:
        f.write(json.dumps([[list(d) for d in img] for img in dets_list],
                           cls=NpEnc))
    with open(os.path.join(out_dir, "0_infos.json"), "w") as f:
        f.write(json.dumps(info_list, cls=NpEnc))
    return out_dir


def score_native(root: str, out_dir: str):
    from instance_segmentation_tpu.configs import Config
    from instance_segmentation_tpu.evaluation.eval_loop import evaluate_from_json
    from instance_segmentation_tpu.utils.logger import Logger
    data_cfg = Config({"save_dir": out_dir, "num_classes": 8,
                       "eval_dir": root, "train_dir": root})
    res = evaluate_from_json(data_cfg, 0, out_dir, "cityscapes",
                             Logger(out_dir), 8)
    return res


def det_match_stats(dets_a: str, dets_b: str):
    """Per-image count/class/polygon-IoU agreement between two dets jsons."""
    import numpy as np
    import cv2
    a = json.load(open(dets_a))
    b = json.load(open(dets_b))
    n_a = sum(len(x) for x in a)
    n_b = sum(len(x) for x in b)
    ious = []
    for da, db in zip(a, b):
        for det_a in da:
            best = 0.0
            for det_b in db:
                if int(det_a[0]) != int(det_b[0]):
                    continue
                m1 = np.zeros((1024, 2048), np.uint8)
                m2 = np.zeros((1024, 2048), np.uint8)
                cv2.fillPoly(m1, [np.asarray(det_a[3], np.float32).astype(np.int32)], 1)
                cv2.fillPoly(m2, [np.asarray(det_b[3], np.float32).astype(np.int32)], 1)
                inter = int(np.logical_and(m1, m2).sum())
                union = int(np.logical_or(m1, m2).sum())
                if union:
                    best = max(best, inter / union)
            ious.append(best)
    return {"ref_dets": n_a, "converted_dets": n_b,
            "mean_best_iou": round(float(np.mean(ious)), 4) if ious else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_ckpt", required=True)
    ap.add_argument("--out", default="/tmp/iseg_ab")
    ap.add_argument("--compound", type=int, default=0)
    ap.add_argument("--skip_ref", action="store_true")
    args = ap.parse_args()
    root = os.path.join(args.out, "data")

    # Part A: reference's own forward+decode, scored natively
    ref_dir = os.path.join(args.out, "ref_eval")
    if not args.skip_ref or not os.path.exists(
            os.path.join(ref_dir, "0_dets.json")):
        eval_reference(args.ref_ckpt, root, ref_dir, args.compound)
    ref_res = score_native(root, ref_dir)

    # Part B: converted checkpoint through OUR pipeline (subprocess: clean
    # jax state, honours ISEG_PLATFORM)
    conv_ckpt = os.path.join(args.out, "converted_ckpt")
    if not os.path.isdir(conv_ckpt):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "convert_torch_weights.py"),
                        "--torch_ckpt", args.ref_ckpt,
                        "--compound_coef", str(args.compound),
                        "--num_classes", "8", "--input_hw", "256", "512",
                        "--out", conv_ckpt], check=True)
    conv_dir = os.path.join(args.out, "conv_eval")
    code = (
        "import os,sys; sys.path.insert(0, %r);\n"
        "import tools.ab_eval_converted as m; m.main(%r, %r, %r)"
        % (REPO, conv_ckpt, root, conv_dir))
    subprocess.run([sys.executable, "-c", code], check=True)
    conv_res = score_native(root, conv_dir)

    stats = det_match_stats(os.path.join(ref_dir, "0_dets.json"),
                            os.path.join(conv_dir, "0_dets.json"))
    print(json.dumps({
        "ref_AP": round(ref_res["AP"], 4), "ref_AP50": round(ref_res["AP50"], 4),
        "converted_AP": round(conv_res["AP"], 4),
        "converted_AP50": round(conv_res["AP50"], 4),
        **stats,
    }))


if __name__ == "__main__":
    main()
