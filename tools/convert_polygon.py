#!/usr/bin/env python
"""Offline GT polygon cleanup: fill + re-extract simple polygons.

Capability of ref convert_polygon.py:11-47: rasterize each annotated polygon
and re-extract its outer contour so self-intersecting / degenerate polygons
become simple filled ones, rewriting *_gtFine_polygons.json ->
*_fill_polygons.json.
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

from instance_segmentation_tpu.data.cityscapes import is_label_file


def fill_polygon(polygon: np.ndarray, h: int, w: int) -> np.ndarray | None:
    """fillPoly -> findContours round trip (ref :11-18)."""
    mask = np.zeros((h, w), np.uint8)
    cv2.fillPoly(mask, [polygon.astype(np.int32)], 1)
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    largest = max(contours, key=cv2.contourArea)
    return largest.reshape(-1, 2)


def convert_file(path: str) -> str:
    with open(path) as f:
        blob = json.load(f)
    h, w = blob.get("imgHeight", 1024), blob.get("imgWidth", 2048)
    new_objects = []
    for obj in blob.get("objects", []):
        poly = np.asarray(obj["polygon"], np.int32)
        filled = fill_polygon(poly, h, w)
        if filled is None or filled.shape[0] < 3:
            continue
        new_objects.append({"label": obj["label"], "polygon": filled.tolist()})
    blob["objects"] = new_objects
    out = path.replace("_gtFine_polygons.json", "_fill_polygons.json")
    with open(out, "w") as f:
        json.dump(blob, f)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="gtFine directory root")
    args = ap.parse_args()
    n = 0
    for dp, _, fn in os.walk(args.root):
        for f in fn:
            if is_label_file(f):
                convert_file(os.path.join(dp, f))
                n += 1
    print(f"converted {n} label files")
