#!/usr/bin/env python
"""Measure the PyTorch reference's TRAINING-step throughput on this host.

Complements tools/bench_reference_torch.py (forward) and
tools/bench_reference_decode.py (forward+decode): runs the reference's full
training step IN PLACE from /root/reference — model forward (ref
models/efficient.py:615-626) + ComposeLoss with its per-step host target
generation (ref models/loss.py:364-381, utils/target_generator.py:292-318)
+ backward + torch Adam — under its shipped config (EfficientSeg-B3,
512x1024 = trans_cfg resize x1/2, batch 1, train_cfg.yaml), on synthetic
polygon labels shaped like the bench.py --train workload.

This host has no CUDA device, so the measurement is torch-CPU, matching the
other two baseline entries. Appends `reference_train_imgs_per_sec` to
BENCH_BASELINE.json; `bench.py --train` reads it for vs_baseline.

Usage: python tools/bench_reference_train.py [--iters 5] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, os.path.join(REPO, "tools"))


def synthetic_targets(batch: int, h: int, w: int, n_inst: int = 16,
                      seed: int = 0):
    """Per-image ragged labels in the reference's collate format
    (ref data/__init__.py:42-52: list of cls-id arrays, list of lists of
    (V,2) polygon arrays in (h,w) order post-CoordinateReverser)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cls_list, poly_list = [], []
    for _ in range(batch):
        polys, clss = [], []
        for _ in range(n_inst):
            cy, cx = rng.uniform(80, h - 80), rng.uniform(120, w - 120)
            rh, rw = rng.uniform(20, 70), rng.uniform(30, 100)
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            polys.append(np.stack([cy + rh * np.sin(ang),
                                   cx + rw * np.cos(ang)], -1).astype(np.int32))
            clss.append(rng.integers(0, 8))
        cls_list.append(np.asarray(clss, np.int32))
        poly_list.append(polys)
    return (cls_list, poly_list)


def main(iters: int, batch: int, h: int, w: int, compound: int):
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    from bench_reference_decode import _stub_torchvision
    _stub_torchvision()
    if "pycocotools" not in sys.modules:   # absent; imported by ref data pkg
        pc = types.ModuleType("pycocotools")
        pc.mask = types.ModuleType("pycocotools.mask")
        pc.coco = types.ModuleType("pycocotools.coco")
        pc.coco.COCO = object
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.mask"] = pc.mask
        sys.modules["pycocotools.coco"] = pc.coco
    sys.path.insert(0, REF)
    from models import ComposeLoss, EfficientSeg  # noqa: reference, read-only

    device = torch.device("cpu")
    model = EfficientSeg(
        num_classes=8, compound_coef=compound,
        ratios=[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)],
        scales=[2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]).to(device)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=2e-5)  # train_cfg.yaml
    loss_fn = ComposeLoss(device)

    inputs = torch.randn(batch, 3, h, w)
    targets = synthetic_targets(batch, h, w)

    def step():
        outputs = model(inputs)
        loss, _ = loss_fn(outputs, targets)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

    step()  # warmup
    t = time.time()
    for _ in range(iters):
        step()
    dt = (time.time() - t) / (iters * batch)

    entry = {
        "metric": "reference_train_imgs_per_sec",
        "value": 1.0 / dt,
        "unit": "img/s",
        "hardware": "host CPU (no CUDA available); torch " + torch.__version__,
        "config": (f"EfficientSeg-B{compound} {h}x{w} fp32 batch{batch}, "
                   "full train step (fwd + ComposeLoss/host targets + bwd "
                   "+ Adam)"),
        "seconds_per_image": dt,
    }
    out = os.path.join(REPO, "BENCH_BASELINE.json")
    base = {}
    if os.path.exists(out):
        with open(out) as f:
            base = json.load(f)
        if "metric" in base:                 # old single-entry format
            base = {base["metric"]: base}
    base["reference_train_imgs_per_sec"] = entry
    with open(out, "w") as f:
        json.dump(base, f, indent=2)
    print(json.dumps(entry))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--compound", type=int, default=3)
    a = ap.parse_args()
    main(a.iters, a.batch, a.h, a.w, a.compound)
