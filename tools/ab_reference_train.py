#!/usr/bin/env python
"""Train the PyTorch reference IN PLACE on the synthetic set — the AP-parity
A/B baseline (round-2 verdict item 2).

Mirrors the reference's own training flow (ref train.py:172-271: its
dataloader + CommonTransforms, its EfficientSeg + ComposeLoss with per-step
host target generation, torch Adam) on the same synthetic Cityscapes tree,
image budget, step budget, optimizer, and LR as tools/overfit_demo.py uses
for OUR model. The final state_dict is saved for (a) native-AP scoring of
the reference's own decode (tools/ab_compare.py) and (b) a real trained
checkpoint round-trip through tools/convert_torch_weights.py.

Runs on this host's CPU (no CUDA here; the reference trains fine on CPU,
just slowly — B0 at 256x512 is ~a few s/step). Use --steps to match the
budget; progress prints every 20 steps.

Usage: python tools/ab_reference_train.py --steps 2400 --out /tmp/iseg_ab
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, os.path.join(REPO, "tools"))


def main(steps: int, out: str, lr: float, batch: int, compound: int,
         seed: int = 1, train_n: int = 4, val_n: int = 0,
         gen_hw: tuple[int, int] = (512, 1024)):
    from bench_reference_decode import _stub_torchvision
    from make_synthetic_cityscapes import generate

    # identical synthetic tree to tools/overfit_demo.py (same generator+seed).
    # val_n > 0 generates a DISJOINT held-out val split (generalization A/B,
    # round-3 verdict item 2); val_n == 0 keeps the legacy overfit protocol
    # (val = copy of train). gen_hw scales the generated frames (instance
    # radius scales with min(h,w), so the task is resolution-covariant);
    # the model input is gen_hw/2 via resize target_size 2, same as the
    # reference's shipped half-res protocol.
    gh, gw = gen_hw
    root = os.path.join(out, "data")
    if not os.path.isdir(root):
        if val_n > 0:
            generate(root, splits=(("train", train_n), ("val", val_n)),
                     h=gh, w=gw, seed=21, instances=(2, 4))
        else:
            generate(root, splits=(("train", train_n),), h=gh, w=gw,
                     seed=21, instances=(2, 4))
            shutil.copytree(os.path.join(root, "leftImg8bit", "train"),
                            os.path.join(root, "leftImg8bit", "val"))
            shutil.copytree(os.path.join(root, "gtFine", "train"),
                            os.path.join(root, "gtFine", "val"))

    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    _stub_torchvision()
    # pycocotools is absent; the reference imports it at data/__init__ scope
    # via the (unused here) COCO builder
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
    import numpy as np
    np.random.seed(seed)
    torch.random.manual_seed(seed)

    import data as ref_data
    from configs import Configer
    from models import ComposeLoss, EfficientSeg
    from utils.tranform import CommonTransforms

    blob_cfg = json.load(open(os.path.join(REF, "configs", "trans_cfg.json")))
    blob_cfg["train_trans"] = {"trans_seq": ["resize"],
                               "resize": {"target_size": 2}}
    blob_cfg["val_trans"] = {"trans_seq": ["resize"],
                             "resize": {"target_size": 2}}
    tmp_cfg = os.path.join(out, "ref_trans_cfg.json")
    json.dump(blob_cfg, open(tmp_cfg, "w"))
    trans_cfg = Configer(configs=tmp_cfg)

    transforms = CommonTransforms(trans_cfg, "train")
    loader = ref_data.get_dataloader(batch, "cityscapes", root, phase="train",
                                     transforms=transforms)

    device = torch.device("cpu")
    model = EfficientSeg(
        num_classes=8, compound_coef=compound,
        ratios=[(1.0, 1.0), (1.4, 0.7), (0.7, 1.4)],
        scales=[2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)]).to(device)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=lr)
    loss_fn = ComposeLoss(device)

    suffix = "" if seed == 1 and val_n == 0 else f"_s{seed}"
    ckpt = os.path.join(out, f"ref_final{suffix}.pth")
    resume = os.path.join(out, f"ref_resume{suffix}.pth")
    it, t0 = 0, time.time()
    if os.path.exists(resume):
        blob = torch.load(resume, map_location="cpu")
        model.load_state_dict(blob["state_dict"])
        optimizer.load_state_dict(blob["opt"])
        it = int(blob["it"])
        print(f"resumed at it {it}", flush=True)
    while it < steps:
        for inputs, targets, infos in loader:
            outputs = model(inputs.to(device))
            loss, loss_stats = loss_fn(outputs, targets)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            if it % 20 == 0:
                el = time.time() - t0
                print(f"it {it:5d} loss {float(loss):10.3f} "
                      f"({el:.0f}s, {el / max(it, 1):.2f}s/it)", flush=True)
            it += 1
            if it % 200 == 0:
                torch.save({"state_dict": model.state_dict(),
                            "opt": optimizer.state_dict(), "it": it}, resume)
            if it >= steps:
                break
    torch.save({"state_dict": model.state_dict(), "epoch": 0, "best_ap": 0.0},
               ckpt)
    print(f"saved {ckpt} after {it} steps "
          f"({(time.time() - t0) / 60:.1f} min)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2400)
    ap.add_argument("--out", default="/tmp/iseg_ab")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--compound", type=int, default=0)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--train_n", type=int, default=4)
    ap.add_argument("--val_n", type=int, default=0,
                    help=">0 trains/evals with a DISJOINT held-out val split")
    ap.add_argument("--gen_hw", type=int, nargs=2, default=(512, 1024),
                    help="generated frame size (model input = half this)")
    a = ap.parse_args()
    main(a.steps, a.out, a.lr, a.batch, a.compound, a.seed, a.train_n, a.val_n,
         tuple(a.gen_hw))
