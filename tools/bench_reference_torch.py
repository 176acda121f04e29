#!/usr/bin/env python
"""Measure the PyTorch reference's inference throughput on this host.

The reference publishes no benchmark numbers (BASELINE.md), so the first
benchmarking milestone is measuring it ourselves under its shipped config
(EfficientSeg-B3, 512x1024 inputs — configs/train_cfg.yaml + trans_cfg
resize x1/2). This host has no CUDA device, so the measurement is torch-CPU
**forward pass only** (the reference's decode is a separate host-side python
stage on top — excluding it is conservative in the reference's favor).

Writes BENCH_BASELINE.json at the repo root; bench.py reads it for
vs_baseline. Runs the reference code in-place from /root/reference (read
only), stubbing the absent torchvision dependency.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _stub_torchvision():
    import torch

    def batched_nms(boxes, scores, idxs, iou_threshold):
        # minimal greedy NMS (only needed at import time / decode paths)
        keep = []
        order = torch.argsort(scores, descending=True)
        sup = torch.zeros(len(boxes), dtype=torch.bool)
        offs = idxs.to(boxes) * (boxes.max() + 1)
        b = boxes + offs[:, None]
        for i in order.tolist():
            if sup[i]:
                continue
            keep.append(i)
            x1 = torch.maximum(b[i, 0], b[:, 0]); y1 = torch.maximum(b[i, 1], b[:, 1])
            x2 = torch.minimum(b[i, 2], b[:, 2]); y2 = torch.minimum(b[i, 3], b[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            a1 = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
            a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            iou = inter / (a1 + a2 - inter).clamp(min=1e-8)
            sup |= iou > iou_threshold
            sup[i] = True
    # (suppressed flag for i itself is fine — it's already in keep)
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


def main(iters: int = 3, h: int = 512, w: int = 1024, compound_coef: int = 3):
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    _stub_torchvision()
    sys.path.insert(0, REF)
    from models.efficient import EfficientSeg  # noqa: reference import, read-only

    model = EfficientSeg(num_classes=8, compound_coef=compound_coef)
    model.eval()
    x = torch.randn(1, 3, h, w)
    with torch.no_grad():
        model(x)  # warmup
        t = time.time()
        for _ in range(iters):
            model(x)
        dt = (time.time() - t) / iters

    result = {
        "metric": "reference_forward_imgs_per_sec",
        "value": 1.0 / dt,
        "unit": "img/s",
        "hardware": "host CPU (no CUDA available); torch " + torch.__version__,
        "config": f"EfficientSeg-B{compound_coef} {h}x{w} fp32 batch1, forward only",
        "seconds_per_image": dt,
    }
    out = os.path.join(REPO, "BENCH_BASELINE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
