"""Golden fixtures pinning the native AP to the official cityscapesscripts
protocol (evalInstanceLevelSemanticLabeling): group/void/min-size ignore
rules, the official multi-match rule, and the official step-width AP
integration. Expected values are hand-computed from the official algorithm.
"""

import numpy as np
import pytest

from instance_segmentation_tpu.evaluation.cityscapes_ap import (
    InstanceGT, InstancePrediction, compute_instance_ap,
)


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


SIZES = {"img": (256, 256)}


def test_golden_base_case_with_ignore_regions():
    """1 TP (0.9), 1 missed GT (hard FN), 1 FP (0.8); predictions covered by
    a group region / a tiny GT / a void region are DISCARDED.

    Official accounting per threshold: entries (0.8 FP), (0.9 TP), hardFns=1
    -> PR points: (p=0.5, r=0.5), (p=1, r=0.5), artificial (1, 0)
    -> stepWidths [0, 0.25, 0.25] -> AP = 0.5 at every threshold.
    """
    gts = [
        InstanceGT("img", 0, _sq(10, 10, 60, 60)),              # matched
        InstanceGT("img", 0, _sq(10, 120, 60, 170)),            # missed
        InstanceGT("img", 0, _sq(100, 100, 160, 160), is_group=True),
        InstanceGT("img", 0, _sq(200, 200, 204, 204)),          # 25 px < 100
    ]
    preds = [
        InstancePrediction("img", 0, 0.9, _sq(10, 10, 60, 60)),      # TP
        InstancePrediction("img", 0, 0.8, _sq(200, 10, 250, 60)),    # FP
        InstancePrediction("img", 0, 0.7, _sq(110, 110, 150, 150)),  # in group
        InstancePrediction("img", 0, 0.6, _sq(200, 200, 204, 204)),  # tiny gt
        InstancePrediction("img", 0, 0.5, _sq(0, 200, 40, 240)),     # in void
    ]
    void = {"img": [_sq(0, 200, 40, 240)]}
    res = compute_instance_ap(preds, gts, SIZES, num_classes=8,
                              void_regions=void)
    np.testing.assert_allclose(res["AP"], 0.5, atol=1e-9)
    np.testing.assert_allclose(res["AP50"], 0.5, atol=1e-9)
    assert list(res["classes"]) == [0]

    # without the ignore handling those three predictions would be FPs
    res_no_ignore = compute_instance_ap(
        preds, [g for g in gts if not g.is_group and g.polygon[2, 0] > 100],
        SIZES, num_classes=8)
    assert res_no_ignore["AP"] < 0.5


def test_group_only_gt_not_matchable():
    """A group region alone: official haveGt counts eligible (non-group,
    >= min-size) instances, so the class is EXCLUDED from the mean (NaN in
    the official script) rather than averaged in as 0; the pred fully
    inside the group region is discarded, not an FP."""
    gts = [InstanceGT("img", 0, _sq(100, 100, 160, 160), is_group=True)]
    preds = [InstancePrediction("img", 0, 0.9, _sq(110, 110, 150, 150))]
    res = compute_instance_ap(preds, gts, SIZES, num_classes=8)
    assert res["AP"] == 0.0          # no class with eligible GT anywhere
    assert 0 not in res["classes"]   # the group-only class is excluded


def test_official_multi_match_rule():
    """Two predictions both overlapping one GT: at IoU 0.50 both match
    (higher score is the TP, lower appended as FP -> AP 1.0); at >= 0.55 the
    shifted one is an unmatched FP above the TP's score -> AP 0.25.
    Mean over 10 thresholds: (1.0 + 9 * 0.25) / 10 = 0.325.
    """
    gts = [InstanceGT("img", 0, _sq(10, 10, 60, 60))]
    preds = [
        InstancePrediction("img", 0, 0.9, _sq(10, 10, 60, 60)),
        # shifted by 16 px: IoU = (51*35) / (2*51*51 - 51*35) = 0.5223
        InstancePrediction("img", 0, 0.95, _sq(26, 10, 76, 60)),
    ]
    res = compute_instance_ap(preds, gts, SIZES, num_classes=8)
    np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["AP"], 0.325, atol=1e-9)


def test_min_region_size_boundary():
    """GT exactly at min_region_size pixels is eligible."""
    # 10x10 square -> 100 px with inclusive rasterization
    gts = [InstanceGT("img", 0, _sq(10, 10, 19, 19))]
    preds = [InstancePrediction("img", 0, 0.9, _sq(10, 10, 19, 19))]
    res = compute_instance_ap(preds, gts, SIZES, num_classes=8)
    np.testing.assert_allclose(res["AP"], 1.0, atol=1e-9)
    # one pixel smaller -> ineligible; exact-cover pred is discarded -> AP 0
    gts2 = [InstanceGT("img", 0, _sq(10, 10, 18, 19))]
    preds2 = [InstancePrediction("img", 0, 0.9, _sq(10, 10, 18, 19))]
    res2 = compute_instance_ap(preds2, gts2, SIZES, num_classes=8)
    assert res2["AP"] == 0.0


def test_golden_multi_image_multi_class():
    """Two images, two classes, cross-image score pooling, a borderline-IoU
    match that flips TP->FP as the overlap threshold rises. Hand-computed
    with the official algorithm:

    class 0: img a — GT (10,10,60,60) matched exactly by p=0.9 (TP at all
    thresholds). img b — same GT matched by a (10,10,60,47) pred at 0.8
    whose IoU is ~0.725-0.765 depending on raster inclusivity (TP for
    th <= 0.70, FP for th >= 0.75 in every case), plus a pure FP at 0.7.
      th <= 0.70: scores asc [0.7 FP, 0.8 TP, 0.9 TP], hardFns 0
        -> PR (2/3, 1), (1, 1), (1, 0.5), art (1, 0) -> AP 1.0
      th >= 0.75: [0.7 FP, 0.8 FP, 0.9 TP], hardFns 1
        -> PR (1/3, .5), (.5, .5), (1, .5), art (1, 0) -> AP 0.5
      class AP = (5*1.0 + 5*0.5)/10 = 0.75, AP50 = 1.0
    class 1: img a — one exact TP at 0.6, no FPs -> AP 1.0.

    Overall AP = 0.875, AP50 = 1.0.
    """
    sizes = {"a": (256, 256), "b": (256, 256)}
    gts = [
        InstanceGT("a", 0, _sq(10, 10, 60, 60)),
        InstanceGT("b", 0, _sq(10, 10, 60, 60)),
        InstanceGT("a", 1, _sq(100, 100, 150, 150)),
    ]
    preds = [
        InstancePrediction("a", 0, 0.9, _sq(10, 10, 60, 60)),
        InstancePrediction("b", 0, 0.8, _sq(10, 10, 60, 47)),
        InstancePrediction("b", 0, 0.7, _sq(150, 150, 200, 200)),
        InstancePrediction("a", 1, 0.6, _sq(100, 100, 150, 150)),
    ]
    res = compute_instance_ap(preds, gts, sizes, num_classes=8)
    np.testing.assert_allclose(res["classes"][0]["AP"], 0.75, atol=1e-9)
    np.testing.assert_allclose(res["classes"][0]["AP50"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["classes"][1]["AP"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["AP"], 0.875, atol=1e-9)
    np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-9)


def test_parse_eval_label_json_groups_and_void():
    from instance_segmentation_tpu.data.cityscapes import parse_eval_label_json
    label_json = {"objects": [
        {"label": "car", "polygon": [[0, 0], [10, 0], [10, 10]]},
        {"label": "cargroup", "polygon": [[20, 20], [30, 20], [30, 30]]},
        {"label": "dynamic", "polygon": [[40, 40], [50, 40], [50, 50]]},
        {"label": "road", "polygon": [[60, 60], [70, 60], [70, 70]]},
        {"label": "caravan", "polygon": [[80, 80], [90, 80], [90, 90]]},
    ]}
    cls_ids, polys, grp, voids = parse_eval_label_json(label_json)
    assert len(cls_ids) == 2 and cls_ids[0] == cls_ids[1]   # car + cargroup
    assert grp == [False, True]
    # dynamic (ignoreInEval) and caravan (hasInstances but ignoreInEval)
    assert len(voids) == 2
