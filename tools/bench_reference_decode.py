#!/usr/bin/env python
"""Measure the PyTorch reference's FULL inference path (forward + decode).

Complements tools/bench_reference_torch.py (forward only): also times the
reference's decode_output — box decode + NMS + top-20k boundary grouping +
per-object polygon assembly — on a realistic synthetic workload (a few dozen
confident detections, dense boundary heatmap), since random-weight outputs
would push all 49k anchors through NMS and unfairly slow it.

The absent torchvision batched_nms is stubbed with a vectorized numpy greedy
NMS of the same semantics (the real one is C++; the stub is not the
bottleneck at these candidate counts).

Updates BENCH_BASELINE.json in place with reference_infer_decode_imgs_per_sec.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _stub_torchvision():
    import torch

    def batched_nms(boxes, scores, idxs, iou_threshold):
        b = boxes.numpy().astype(np.float64)
        s = scores.numpy()
        off = idxs.numpy().astype(np.float64) * (b.max() + 1.0)
        b = b + off[:, None]
        order = np.argsort(-s, kind="stable")
        keep = []
        sup = np.zeros(len(b), bool)
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        areas = (x2 - x1) * (y2 - y1)
        for i in order:
            if sup[i]:
                continue
            keep.append(i)
            xx1 = np.maximum(x1[i], x1); yy1 = np.maximum(y1[i], y1)
            xx2 = np.minimum(x2[i], x2); yy2 = np.minimum(y2[i], y2)
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            iou = inter / np.maximum(areas[i] + areas - inter, 1e-8)
            sup |= iou > iou_threshold
            sup[i] = True
        return torch.tensor(keep, dtype=torch.long)

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.batched_nms = batched_nms
    ops.boxes = boxes_mod
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod

    # skimage is absent in this env; the reference imports find_contours at
    # module scope but only uses it on a dead path (mask2poly, unused).
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.measure")
        skm.find_contours = lambda *a, **k: []
        sk.measure = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = skm


def main(iters: int = 3, h: int = 512, w: int = 1024, n_objects: int = 24):
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    _stub_torchvision()
    sys.path.insert(0, REF)
    from models.efficient import EfficientSeg
    from configs import Config, Configer
    from utils.tranform import CommonTransforms, TransInfo
    from utils import decode

    model = EfficientSeg(num_classes=8, compound_coef=3)
    model.eval()
    x = torch.randn(1, 3, h, w)
    with torch.no_grad():
        t = time.time()
        outs = model(x)
        fwd_dt = time.time() - t
        kp_out, regression, classification, anchors = outs

    # realistic detection workload: background scores low, n_objects confident
    rng = np.random.default_rng(0)
    cls = torch.full_like(classification, 1e-3)
    A = cls.shape[1]
    chosen = rng.choice(A, n_objects, replace=False)
    for i, a in enumerate(chosen):
        cls[0, a, i % 8] = 0.9
    kp_hm = torch.randn(1, 1, h, w) * 2.0           # dense boundary logits
    ae = torch.randn(1, 4, h, w) * 0.5
    tan = torch.randn(1, 2, h, w)
    outs = ((kp_hm, ae, tan), torch.zeros_like(regression), cls, anchors)

    blob_cfg = json.load(open(os.path.join(REF, "configs", "trans_cfg.json")))
    blob_cfg["val_trans"] = {"trans_seq": ["resize"], "resize": {"target_size": 2}}
    tmp_cfg = "/tmp/ref_trans_cfg.json"
    json.dump(blob_cfg, open(tmp_cfg, "w"))
    trans_cfg = Configer(configs=tmp_cfg)
    transforms = CommonTransforms(trans_cfg, "val")

    # the reference targets torch<=1.x where masked_select accepted uint8
    # masks; adapt for the modern torch in this environment
    _orig_masked_select = torch.Tensor.masked_select
    torch.Tensor.masked_select = lambda self, m: _orig_masked_select(self, m.bool())
    decode_cfg = Config(os.path.join(REF, "configs", "decode_cfg.yaml"))
    decode_cfg.draw_flag = False        # shipped yaml has debug drawing on
    decode.target_size = 2
    device = torch.device("cpu")
    import cv2
    dummy = "/tmp/ref_bench_dummy.png"
    cv2.imwrite(dummy, np.zeros((2 * h, 2 * w, 3), np.uint8))
    infos = [TransInfo(dummy, (2 * h, 2 * w))]

    with torch.no_grad():
        decode.decode_output(x, outs, infos, transforms, decode_cfg, device)  # warm
        t = time.time()
        for _ in range(iters):
            dets = decode.decode_output(x, outs, infos, transforms, decode_cfg, device)
        dec_dt = (time.time() - t) / iters

    total = fwd_dt + dec_dt
    entry = {
        "metric": "reference_infer_decode_imgs_per_sec",
        "value": 1.0 / total,
        "unit": "img/s",
        "hardware": "host CPU (no CUDA available); torch " + torch.__version__,
        "config": f"EfficientSeg-B3 {h}x{w} fp32 batch1, forward + decode_output "
                  f"({n_objects} detections, kp_th=20000)",
        "seconds_per_image": total,
        "forward_s": fwd_dt,
        "decode_s": dec_dt,
        "n_decoded_objects": len(dets[0]) if dets and dets[0] else 0,
    }
    path = os.path.join(REPO, "BENCH_BASELINE.json")
    blob = {}
    if os.path.exists(path):
        blob = json.load(open(path))
        if "metric" in blob:                 # old single-entry format
            blob = {blob["metric"]: blob}
    blob[entry["metric"]] = entry
    json.dump(blob, open(path, "w"), indent=2)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
