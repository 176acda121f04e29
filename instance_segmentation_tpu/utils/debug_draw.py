"""Decode debug rendering (the reference's draw_flag capability).

Covers ref utils/decode.py draw_kp_mask/draw_kp/draw_box/draw_candid
(:207-251): when decode_cfg.draw_flag is on, the test/eval drivers dump per
stage overlays — detected boxes, selected boundary keypoints, and candidate
polygons — as PNGs into save_dir. Works from the packed on-device
`Detections` (one host transfer), so enabling it does not change the decode
path itself.
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from instance_segmentation_tpu.utils.visualize import (
    visualize_boxes, visualize_instances, visualize_keypoints,
)


def dump_detections(dets, index: int, img_path: str, save_dir: str,
                    scale: float = 2.0) -> None:
    """Write box / candidate-polygon overlays for image `index` of a batch."""
    os.makedirs(save_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(img_path))[0]
    img = cv2.imread(img_path)
    if img is None:
        return

    boxes = np.asarray(dets.boxes[index])
    det_valid = np.asarray(dets.det_valid[index])
    centers = np.asarray(dets.centers[index])
    polys = np.asarray(dets.polygons[index])
    lens = np.asarray(dets.poly_len[index])
    obj_valid = np.asarray(dets.obj_valid[index])

    box_img = img.copy()
    sizes = [( (b[2]-b[0]) * scale, (b[3]-b[1]) * scale ) for b in boxes[det_valid]]
    ctrs = centers[det_valid]
    visualize_boxes(box_img, ctrs, sizes)
    cv2.imwrite(os.path.join(save_dir, f"{base}_box.png"), box_img)

    cand_img = img.copy()
    rng = np.random.default_rng(0)
    for d in np.nonzero(obj_valid)[0]:
        color = tuple(int(c) for c in rng.integers(0, 256, 3))
        pts = polys[d][: lens[d]]
        visualize_keypoints(cand_img, pts, color=color)
        x1, y1 = pts.min(0).astype(int)
        x2, y2 = pts.max(0).astype(int)
        cv2.rectangle(cand_img, (x1, y1), (x2, y2), color)
    cv2.imwrite(os.path.join(save_dir, f"{base}_candid.png"), cand_img)

    mask_img = visualize_instances(img, [polys[d][: lens[d]]
                                         for d in np.nonzero(obj_valid)[0]])
    cv2.imwrite(os.path.join(save_dir, f"{base}_instances.png"), mask_img)
