"""Host-side image/geometry helpers.

Covers the live surface of ref utils/image.py: affine transforms (:48-82),
RGB loading (:97-103), polygon rasterization (:180-185), mask/polygon IoU
(:188-202), cover test (:205-207). Device-side equivalents live in
ops/geometry.py; these host versions serve the eval protocol and tools.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

from instance_segmentation_tpu.data.cityscapes import load_rgb_image  # noqa: F401


def get_affine_transform(in_size, out_size, inv: bool = False) -> np.ndarray:
    """Corner-pinned affine between (h, w) frames, for (x, y) points."""
    h, w = in_size
    oh, ow = out_size
    src = np.array([[0, 0], [0, h - 1], [w - 1, h - 1]], np.float32)
    dst = np.array([[0, 0], [0, oh - 1], [ow - 1, oh - 1]], np.float32)
    if inv:
        src, dst = dst, src
    return cv2.getAffineTransform(src, dst)


def apply_affine_transform(pts: np.ndarray, mat: np.ndarray, size_wh) -> np.ndarray:
    """Transform (x, y) points and clip into [0, size-1]."""
    pts = np.asarray(pts, np.float32).reshape(-1, 2)
    ones = np.ones((pts.shape[0], 1), np.float32)
    out = (np.asarray(mat, np.float32) @ np.hstack([pts, ones]).T).T
    out[:, 0] = out[:, 0].clip(0, size_wh[0] - 1)
    out[:, 1] = out[:, 1].clip(0, size_wh[1] - 1)
    return out


def poly_to_mask(poly: np.ndarray, img_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Rasterize an (x, y) polygon to a binary mask (ref :180-185)."""
    poly = np.asarray(poly).astype(np.int32)
    if img_size is None:
        img_size = tuple((poly.max(0) + 1)[::-1])
    mask = np.zeros(img_size, np.int32)
    return cv2.fillPoly(mask, [poly], 1)


def compute_iou_for_mask(mask1: np.ndarray, mask2: np.ndarray) -> float:
    overlap = np.logical_and(mask1, mask2).sum()
    union = np.logical_or(mask1, mask2).sum()
    return float(overlap + 1) / float(union + 1)


def compute_iou_for_poly(poly1: np.ndarray, poly2: np.ndarray,
                         img_size: Optional[Tuple[int, int]] = None) -> float:
    if img_size is None:
        mx = np.maximum(np.asarray(poly1).max(0), np.asarray(poly2).max(0))
        img_size = (int(mx[1]) + 1, int(mx[0]) + 1)
    return compute_iou_for_mask(poly_to_mask(poly1, img_size),
                                poly_to_mask(poly2, img_size))


def is_cover(mask1: np.ndarray, mask2: np.ndarray) -> bool:
    inter = int((mask1 * mask2).sum())
    return int(mask1.sum()) == inter or int(mask2.sum()) == inter
