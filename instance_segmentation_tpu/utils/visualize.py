"""Prediction rendering (capability of ref utils/visualize.py:20-67)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import cv2
import numpy as np

_PALETTE = np.array([
    (220, 20, 60), (255, 0, 0), (0, 0, 142), (0, 0, 70),
    (0, 60, 100), (0, 80, 100), (0, 0, 230), (119, 11, 32),
    (250, 170, 30), (220, 220, 0), (107, 142, 35), (152, 251, 152),
], np.uint8)


def visualize_instances(img: np.ndarray, polygons: Sequence[np.ndarray],
                        alpha: float = 0.5, colors: Optional[Sequence] = None) -> np.ndarray:
    """Filled-polygon alpha overlay per instance (ref visualize.py:20-38)."""
    out = img.copy()
    overlay = img.copy()
    for i, poly in enumerate(polygons):
        color = tuple(int(c) for c in (
            colors[i] if colors is not None else _PALETTE[i % len(_PALETTE)]))
        pts = np.asarray(poly, np.float32).astype(np.int32).reshape(-1, 1, 2)
        cv2.fillPoly(overlay, [pts], color)
    cv2.addWeighted(overlay, alpha, out, 1 - alpha, 0, out)
    return out


def visualize_keypoints(img: np.ndarray, kps: np.ndarray,
                        color=(0, 255, 0)) -> np.ndarray:
    """Dot per keypoint, (x, y) coords (ref visualize.py:41-45)."""
    for kp in np.asarray(kps).reshape(-1, 2):
        cv2.circle(img, (int(kp[0]), int(kp[1])), 1, color, -1)
    return img


def visualize_boxes(img: np.ndarray, centers, sizes,
                    color=(0, 0, 255)) -> np.ndarray:
    """Rectangles from centers + (w, h) sizes (ref visualize.py:55-67)."""
    for c, wh in zip(centers, sizes):
        x, y = float(c[0]), float(c[1])
        w, h = float(wh[0]), float(wh[1])
        cv2.rectangle(img, (int(x - w / 2), int(y - h / 2)),
                      (int(x + w / 2), int(y + h / 2)), color, 1)
    return img
