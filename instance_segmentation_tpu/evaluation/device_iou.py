"""On-device mask-IoU matching for inner-loop evaluation.

SURVEY.md §7.8: the official cityscapesscripts protocol (per-instance PNGs +
host matching) is the golden harness, but it is far too slow for an
every-epoch validation signal. This module computes the prediction-vs-GT
mask IoU matrix entirely on device — predicted polygons rasterized by
ops/decode.render_masks, GT polygons rasterized from the packed label
arrays — and ships only the tiny [D, M] matrix to host for greedy matching
and AP accumulation (utils/meters.APMeter).

`res_divisor` evaluates IoUs at reduced resolution (2 = quarter area); mask
IoU is scale-stable for all but the thinnest instances.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instance_segmentation_tpu.ops.decode import Detections, render_masks
from instance_segmentation_tpu.ops.geometry import rasterize_polygon


def gt_masks_from_packed(polys: jnp.ndarray, cls_ids: jnp.ndarray,
                         h: int, w: int, scale: float = 1.0) -> jnp.ndarray:
    """Rasterize packed GT polygons [B,M,V,2] (row, col) -> bool [B,M,h,w].

    `scale` maps label coordinates to the raster frame (e.g. 2.0 when labels
    are at model input res and masks are rendered at original res)."""
    def one(p):
        return rasterize_polygon(p * scale, h, w)

    masks = jax.vmap(jax.vmap(one))(polys)
    return masks & (cls_ids >= 0)[..., None, None]


def iou_matrix(dets: Detections, gt_polys: jnp.ndarray, gt_cls: jnp.ndarray,
               orig_h: int, orig_w: int, label_scale: float = 2.0,
               res_divisor: int = 2, max_masks: int = 32):
    """IoU between decoded instances and GT instances, on device.

    Returns (iou [B, D', M] f32, pred_valid [B, D'], gt_valid [B, M]) with
    D' = max_masks. Class agreement is left to the host matcher.
    """
    h, w = orig_h // res_divisor, orig_w // res_divisor
    pred = render_masks(
        dets._replace(polygons=dets.polygons / res_divisor,
                      centers=dets.centers / res_divisor),
        h, w, max_masks=max_masks)                              # [B,D',h,w]
    gt = gt_masks_from_packed(gt_polys, gt_cls, h, w,
                              scale=label_scale / res_divisor)  # [B,M,h,w]

    p = pred.reshape(pred.shape[0], pred.shape[1], -1).astype(jnp.float32)
    g = gt.reshape(gt.shape[0], gt.shape[1], -1).astype(jnp.float32)
    inter = jnp.einsum("bdp,bmp->bdm", p, g)
    p_area = jnp.sum(p, axis=-1)[:, :, None]
    g_area = jnp.sum(g, axis=-1)[:, None, :]
    union = jnp.clip(p_area + g_area - inter, 1.0, None)
    iou = inter / union
    return iou, dets.obj_valid[:, :max_masks], gt_cls >= 0


def match_and_score(iou: np.ndarray, pred_valid: np.ndarray, gt_valid: np.ndarray,
                    pred_cls: np.ndarray, pred_scores: np.ndarray,
                    gt_cls: np.ndarray, num_classes: int,
                    ap_meter, overlap: float = 0.5) -> None:
    """Host-side greedy matching of the device IoU matrix into an APMeter."""
    B = iou.shape[0]
    for b in range(B):
        for c in np.unique(gt_cls[b][gt_valid[b]]):
            ap_meter.add_gt(int(c), int(((gt_cls[b] == c) & gt_valid[b]).sum()))
        order = np.argsort(-pred_scores[b], kind="stable")
        matched = np.zeros(iou.shape[2], bool)
        for d in order:
            if not pred_valid[b, d]:
                continue
            c = int(pred_cls[b, d])
            cand = np.where(~matched & gt_valid[b] & (gt_cls[b] == c)
                            & (iou[b, d] > overlap))[0]
            tp = False
            if cand.size:
                best = cand[np.argmax(iou[b, d][cand])]
                matched[best] = True
                tp = True
            ap_meter.add(c, float(pred_scores[b, d]), tp)
