#!/usr/bin/env python
"""Generate a tiny synthetic dataset in Cityscapes directory format.

Produces leftImg8bit/{split}/<city>/*_leftImg8bit.png images containing
randomly placed filled polygons (cars/persons-shaped blobs) on a textured
background, with matching gtFine/{split}/<city>/*_gtFine_polygons.json
labels. Used by the end-to-end tests and as a smoke-training corpus —
the real Cityscapes archive requires registration and is not bundled.
"""

from __future__ import annotations

import os
import sys

# make the repo root importable when run as a script
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import os

import cv2
import numpy as np

CLASSES = ["person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle"]


def regular_polygon(rng, cy, cx, r_base, n_min=6, n_max=12):
    n = int(rng.integers(n_min, n_max + 1))
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = r_base * rng.uniform(0.6, 1.0, n)
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    return np.stack([xs, ys], axis=1)     # (x, y)


# class-correlated appearance so the classification task is learnable:
# each class has a distinct base colour (small jitter added per instance)
_CLASS_COLORS = np.array([
    (220, 40, 60), (40, 220, 60), (40, 60, 220), (220, 220, 40),
    (220, 40, 220), (40, 220, 220), (240, 140, 40), (140, 40, 240),
], np.float64)


def make_image(rng, h, w, n_instances):
    img = (rng.normal(110, 25, size=(h, w, 3))).clip(0, 255).astype(np.uint8)
    # horizon gradient for texture
    img = cv2.GaussianBlur(img, (0, 0), 3)
    objects = []
    for _ in range(n_instances):
        cls_id = int(rng.integers(0, len(CLASSES)))
        cls = CLASSES[cls_id]
        r = float(rng.uniform(min(h, w) * 0.06, min(h, w) * 0.2))
        cy = float(rng.uniform(r + 8, h - r - 8))
        cx = float(rng.uniform(r + 8, w - r - 8))
        poly = regular_polygon(rng, cy, cx, r)
        poly[:, 0] = poly[:, 0].clip(2, w - 3)
        poly[:, 1] = poly[:, 1].clip(2, h - 3)
        color = tuple(int(c) for c in np.clip(
            _CLASS_COLORS[cls_id] + rng.normal(0, 12, 3), 0, 255))
        cv2.fillPoly(img, [poly.astype(np.int32)], color)
        cv2.polylines(img, [poly.astype(np.int32)], True,
                      tuple(min(255, c + 40) for c in color), 2)
        objects.append({"label": cls, "polygon": poly.astype(int).tolist()})
    return img, objects


def generate(root, splits=(("train", 6), ("val", 3)), h=1024, w=2048, seed=0,
             instances=(3, 8)):
    rng = np.random.default_rng(seed)
    for split, count in splits:
        img_dir = os.path.join(root, "leftImg8bit", split, "synth")
        gt_dir = os.path.join(root, "gtFine", split, "synth")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(count):
            n_inst = int(rng.integers(instances[0], instances[1] + 1))
            img, objects = make_image(rng, h, w, n_inst)
            base = f"synth_{i:06d}_000019"
            cv2.imwrite(os.path.join(img_dir, base + "_leftImg8bit.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            with open(os.path.join(gt_dir, base + "_gtFine_polygons.json"), "w") as f:
                json.dump({"imgHeight": h, "imgWidth": w, "objects": objects}, f)
    return root


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./datasets/synthetic_cityscapes")
    ap.add_argument("--train", type=int, default=6)
    ap.add_argument("--val", type=int, default=3)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.out, splits=(("train", args.train), ("val", args.val)),
             h=args.height, w=args.width, seed=args.seed)
    print(f"wrote synthetic cityscapes to {args.out}")
