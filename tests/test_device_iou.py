"""On-device mask-IoU matcher tests."""

import numpy as np
import jax
import jax.numpy as jnp

from instance_segmentation_tpu.evaluation.device_iou import (
    gt_masks_from_packed, iou_matrix, match_and_score,
)
from instance_segmentation_tpu.ops.decode import Detections
from instance_segmentation_tpu.utils.meters import APMeter


def _square_xy(x1, y1, x2, y2):
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)


def _fake_dets(polys_xy, classes, scores, D=4, Q=16):
    B = 1
    polygons = np.zeros((B, D, Q, 2), np.float32)
    lens = np.zeros((B, D), np.int32)
    ok = np.zeros((B, D), bool)
    cls = np.zeros((B, D), np.int32)
    sc = np.zeros((B, D), np.float32)
    for i, (p, c, s) in enumerate(zip(polys_xy, classes, scores)):
        polygons[0, i, : len(p)] = p
        polygons[0, i, len(p):] = p[-1]
        lens[0, i] = len(p)
        ok[0, i] = True
        cls[0, i] = c
        sc[0, i] = s
    boxes = np.zeros((B, D, 4), np.float32)
    centers = polygons.mean(axis=2)
    return Detections(boxes=jnp.asarray(boxes), scores=jnp.asarray(sc),
                      classes=jnp.asarray(cls), det_valid=jnp.asarray(ok),
                      polygons=jnp.asarray(polygons), poly_len=jnp.asarray(lens),
                      centers=jnp.asarray(centers), obj_valid=jnp.asarray(ok))


def test_iou_matrix_and_matching():
    OH, OW = 128, 192
    # GT labels at model-input resolution (label_scale 2 -> original res)
    gt_sq_rc = np.array([[10, 10], [10, 40], [40, 40], [40, 10]], np.float32)
    gt_polys = np.zeros((1, 3, 8, 2), np.float32)
    gt_polys[0, 0, :4] = gt_sq_rc
    gt_polys[0, 0, 4:] = gt_sq_rc[-1]
    gt_cls = np.array([[2, -1, -1]], np.int32)

    # prediction: the same square at original res (x, y), plus a miss
    pred_exact = _square_xy(20, 20, 80, 80)
    pred_off = _square_xy(120, 20, 180, 80)
    dets = _fake_dets([pred_exact, pred_off], [2, 2], [0.9, 0.8])

    iou, pv, gv = jax.jit(lambda d, p, c: iou_matrix(
        d, p, c, OH, OW, label_scale=2.0, res_divisor=1, max_masks=4))(
        dets, jnp.asarray(gt_polys), jnp.asarray(gt_cls))
    iou = np.asarray(iou)
    assert iou[0, 0, 0] > 0.9          # exact overlap
    assert iou[0, 1, 0] < 0.05         # disjoint

    meter = APMeter(8)
    match_and_score(iou, np.asarray(pv), np.asarray(gv),
                    np.asarray(dets.classes), np.asarray(dets.scores),
                    gt_cls, 8, meter)
    # one TP at rank 1 (score .9), one FP: AP for class 2 is 1.0 at recall 1
    assert meter.class_ap(2) == 1.0
