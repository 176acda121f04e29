"""Cityscapes-style instance-level average precision.

A native implementation of the instance-segmentation AP protocol the
reference delegates to `cityscapesscripts` (ref utils/eval_util.py:96-127):
per-class AP averaged over mask-IoU thresholds 0.50:0.05:0.95 ("AP") and at
0.50 ("AP50"), with greedy score-ordered matching of predictions to ground
truth. When the official `cityscapesscripts` package is installed the eval
loop can additionally emit the official result-file format
(per-instance PNGs + pred.txt) and invoke it as a golden harness; this module
keeps the inner loop dependency-free.

IoUs are computed on rasterized polygon masks with bbox pruning, at original
image resolution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

OVERLAPS = tuple(np.arange(0.5, 1.0, 0.05))


@dataclass
class InstancePrediction:
    image_id: str
    cls_id: int
    score: float
    polygon: np.ndarray          # [n, 2] (x, y) float, original resolution


@dataclass
class InstanceGT:
    image_id: str
    cls_id: int
    polygon: np.ndarray          # [n, 2] (x, y)


def _poly_mask(poly: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    mask = np.zeros(hw, np.uint8)
    cv2.fillPoly(mask, [np.asarray(poly, np.float32).astype(np.int32)], 1)
    return mask


def _mask_iou_matrix(preds: List[np.ndarray], gts: List[np.ndarray],
                     hw: Tuple[int, int]) -> np.ndarray:
    """IoU between prediction and GT polygons via rasterized masks."""
    pm = [_poly_mask(p, hw) for p in preds]
    gm = [_poly_mask(g, hw) for g in gts]
    out = np.zeros((len(pm), len(gm)), np.float64)
    p_sum = [int(m.sum()) for m in pm]
    g_sum = [int(m.sum()) for m in gm]
    for i, a in enumerate(pm):
        for j, b in enumerate(gm):
            inter = int(np.logical_and(a, b).sum())
            union = p_sum[i] + g_sum[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def compute_instance_ap(predictions: Sequence[InstancePrediction],
                        ground_truth: Sequence[InstanceGT],
                        image_sizes: Dict[str, Tuple[int, int]],
                        num_classes: int,
                        overlaps: Sequence[float] = OVERLAPS) -> Dict[str, object]:
    """Greedy score-ordered matching AP.

    Returns {"AP": float, "AP50": float, "classes": {cls: {"AP": .., "AP50": ..}}}.
    Classes with no GT instances are excluded from the mean (official rule).
    """
    # group by (image, class)
    preds_by: Dict[Tuple[str, int], List[InstancePrediction]] = {}
    gts_by: Dict[Tuple[str, int], List[InstanceGT]] = {}
    for p in predictions:
        preds_by.setdefault((p.image_id, p.cls_id), []).append(p)
    for g in ground_truth:
        gts_by.setdefault((g.image_id, g.cls_id), []).append(g)

    # IoU matrices per (image, class) — computed once, reused per threshold
    iou_cache: Dict[Tuple[str, int], np.ndarray] = {}
    for key in set(preds_by) | set(gts_by):
        ps = preds_by.get(key, [])
        gs = gts_by.get(key, [])
        if ps and gs:
            iou_cache[key] = _mask_iou_matrix(
                [p.polygon for p in ps], [g.polygon for g in gs],
                image_sizes[key[0]])

    per_class: Dict[int, Dict[str, float]] = {}
    ap_means, ap50s = [], []
    for c in range(num_classes):
        n_gt = sum(len(v) for k, v in gts_by.items() if k[1] == c)
        if n_gt == 0:
            continue
        aps = []
        ap50 = None
        for th in overlaps:
            # global score-sorted TP/FP for this class and threshold
            scored: List[Tuple[float, bool]] = []
            for key, ps in preds_by.items():
                if key[1] != c:
                    continue
                order = np.argsort([-p.score for p in ps], kind="stable")
                iou = iou_cache.get(key)
                matched = np.zeros(iou.shape[1], bool) if iou is not None else None
                for pi in order:
                    tp = False
                    if iou is not None:
                        cand = np.where(~matched & (iou[pi] > th))[0]
                        if cand.size:
                            best = cand[np.argmax(iou[pi][cand])]
                            matched[best] = True
                            tp = True
                    scored.append((ps[pi].score, tp))
            if not scored:
                aps.append(0.0)
                if abs(th - 0.5) < 1e-9:
                    ap50 = 0.0
                continue
            scored.sort(key=lambda t: -t[0])
            tps = np.cumsum([t[1] for t in scored]).astype(np.float64)
            fps = np.cumsum([not t[1] for t in scored]).astype(np.float64)
            recall = tps / n_gt
            precision = tps / np.maximum(tps + fps, 1e-12)
            # precision-envelope integration
            r = np.concatenate([[0.0], recall, [1.0]])
            p = np.concatenate([[0.0], precision, [0.0]])
            p = np.maximum.accumulate(p[::-1])[::-1]
            idx = np.nonzero(r[1:] != r[:-1])[0]
            ap = float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))
            aps.append(ap)
            if abs(th - 0.5) < 1e-9:
                ap50 = ap
        per_class[c] = {"AP": float(np.mean(aps)), "AP50": float(ap50 or 0.0)}
        ap_means.append(per_class[c]["AP"])
        ap50s.append(per_class[c]["AP50"])

    return {
        "AP": float(np.mean(ap_means)) if ap_means else 0.0,
        "AP50": float(np.mean(ap50s)) if ap50s else 0.0,
        "classes": per_class,
    }
