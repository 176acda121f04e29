"""Native COCO-protocol mask AP (evaluation/coco_ap.py).

Fixtures are hand-computed against pycocotools COCOeval semantics (the
package is not installed here): greedy score-ordered matching, 101-point
interpolation, crowd-ignore with the crowd IoU rule, area buckets.
"""

import json
import os

import numpy as np
import pytest

from instance_segmentation_tpu.evaluation.coco_ap import (
    CocoGT, CocoPrediction, compute_coco_ap, write_coco_results,
)


def rect(x1, y1, x2, y2):
    """Inclusive-corner rectangle polygon: fills (x2-x1+1)*(y2-y1+1) px."""
    return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)


SIZES = {"img": (64, 64)}


def test_perfect_match():
    gt = [CocoGT("img", 0, rect(0, 0, 9, 9))]
    pred = [CocoPrediction("img", 0, 0.9, rect(0, 0, 9, 9))]
    r = compute_coco_ap(pred, gt, SIZES, num_classes=2)
    assert r["AP"] == pytest.approx(1.0)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(1.0)
    assert r["classes"][0]["AP"] == pytest.approx(1.0)


def test_iou_threshold_band():
    """A detection at mask IoU exactly 0.6 matches thresholds {.5,.55,.6}
    only: AP = 3/10, AP50 = 1, AP75 = 0."""
    gt = [CocoGT("img", 0, rect(0, 0, 9, 9))]          # 100 px
    pred = [CocoPrediction("img", 0, 0.9, rect(0, 0, 5, 9))]  # 60 px inside
    r = compute_coco_ap(pred, gt, SIZES, num_classes=1)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(0.0)
    assert r["AP"] == pytest.approx(0.3)


def test_score_ordering_matters():
    """high-scoring FP before the TP halves interpolated precision; the
    reverse ordering keeps AP at 1 (COCOeval right-to-left interpolation)."""
    gt = [CocoGT("img", 0, rect(0, 0, 9, 9))]
    fp_first = [
        CocoPrediction("img", 0, 0.9, rect(40, 40, 49, 49)),   # IoU 0
        CocoPrediction("img", 0, 0.5, rect(0, 0, 9, 9)),       # IoU 1
    ]
    r = compute_coco_ap(fp_first, gt, SIZES, num_classes=1)
    assert r["AP"] == pytest.approx(0.5)
    tp_first = [
        CocoPrediction("img", 0, 0.9, rect(0, 0, 9, 9)),
        CocoPrediction("img", 0, 0.5, rect(40, 40, 49, 49)),
    ]
    r = compute_coco_ap(tp_first, gt, SIZES, num_classes=1)
    assert r["AP"] == pytest.approx(1.0)


def test_crowd_absorbs_detections():
    """A high-scoring detection inside an iscrowd region is ignored (crowd
    IoU rule: union = det area), not a false positive."""
    gt = [CocoGT("img", 0, rect(0, 0, 9, 9)),                   # real
          CocoGT("img", 0, rect(30, 30, 49, 49), iscrowd=True)]  # crowd
    preds = [
        CocoPrediction("img", 0, 0.9, rect(32, 32, 41, 41)),    # inside crowd
        CocoPrediction("img", 0, 0.5, rect(0, 0, 9, 9)),        # TP
    ]
    r = compute_coco_ap(preds, gt, SIZES, num_classes=1)
    assert r["AP"] == pytest.approx(1.0)
    # sanity: without the crowd flag the same layout is a real FP
    gt[1].iscrowd = False
    r = compute_coco_ap(preds, gt, SIZES, num_classes=1)
    assert r["AP"] < 1.0


def test_area_buckets():
    sizes = {"big": (256, 256)}
    gt = [CocoGT("big", 0, rect(0, 0, 19, 19)),          # 400 px: small
          CocoGT("big", 0, rect(50, 50, 169, 169))]      # 14400 px: large
    preds = [CocoPrediction("big", 0, 0.9, rect(0, 0, 19, 19)),
             CocoPrediction("big", 0, 0.8, rect(50, 50, 169, 169))]
    r = compute_coco_ap(preds, gt, sizes, num_classes=1)
    assert r["AP"] == pytest.approx(1.0)
    assert r["AP_small"] == pytest.approx(1.0)
    assert r["AP_large"] == pytest.approx(1.0)
    assert r["AP_medium"] == pytest.approx(0.0)   # no medium GT anywhere


def test_unmatched_gt_is_fn():
    """Two GTs, one detected: recall saturates at 0.5 so interpolated
    precision is 1 up to r=0.5 and 0 beyond: AP = 51/101."""
    gt = [CocoGT("img", 0, rect(0, 0, 9, 9)),
          CocoGT("img", 0, rect(30, 30, 39, 39))]
    preds = [CocoPrediction("img", 0, 0.9, rect(0, 0, 9, 9))]
    r = compute_coco_ap(preds, gt, SIZES, num_classes=1)
    assert r["AP"] == pytest.approx(51.0 / 101.0)


def test_classes_without_gt_excluded():
    gt = [CocoGT("img", 3, rect(0, 0, 9, 9))]
    preds = [CocoPrediction("img", 3, 0.9, rect(0, 0, 9, 9))]
    r = compute_coco_ap(preds, gt, SIZES, num_classes=80)
    assert r["AP"] == pytest.approx(1.0)          # mean over class 3 only
    assert list(r["classes"].keys()) == [3]


def test_max_dets_cap():
    """Only the top-k detections by score participate (COCO maxDets)."""
    gt = [CocoGT("img", 0, rect(0, 0, 9, 9))]
    preds = [CocoPrediction("img", 0, 0.9, rect(40, 40, 49, 49)),
             CocoPrediction("img", 0, 0.5, rect(0, 0, 9, 9))]
    r = compute_coco_ap(preds, gt, SIZES, num_classes=1, max_dets=1)
    assert r["AP"] == pytest.approx(0.0)          # the TP was cut off


def test_eval_loop_coco_dispatch(tmp_path):
    """evaluate_from_json(dataset='coco') scores against instances.json and
    writes the standard COCO results file."""
    from instance_segmentation_tpu.configs import Config
    from instance_segmentation_tpu.evaluation.eval_loop import evaluate_from_json
    from instance_segmentation_tpu.utils.logger import Logger

    root = tmp_path / "coco"
    (root / "val").mkdir(parents=True)
    img_path = str(root / "val" / "000017.jpg")
    poly = [5.0, 5.0, 25.0, 5.0, 25.0, 25.0, 5.0, 25.0]
    blob = {
        "images": [{"id": 17, "file_name": "000017.jpg",
                    "height": 64, "width": 64}],
        "annotations": [{"image_id": 17, "category_id": 1, "iscrowd": 0,
                         "area": 441.0, "segmentation": [poly]}],
    }
    with open(root / "val" / "instances.json", "w") as f:
        json.dump(blob, f)

    out = tmp_path / "out"
    out.mkdir()
    dets = [[[0, 0.9, [15.0, 15.0],
              [[5.0, 5.0], [25.0, 5.0], [25.0, 25.0], [5.0, 25.0]]]]]
    infos = [[img_path, [64, 64]]]
    with open(out / "0_dets.json", "w") as f:
        json.dump(dets, f)
    with open(out / "0_infos.json", "w") as f:
        json.dump(infos, f)

    cfg = Config({"eval_dir": str(root), "subset": "val", "num_classes": 80,
                  "save_dir": str(out)})
    results = evaluate_from_json(cfg, 0, str(out), "coco", Logger(str(out)), 80,
                                 orig_hw=(64, 64))
    assert results["AP"] == pytest.approx(1.0)
    res_path = out / "0_coco_results.json"
    assert res_path.exists()
    with open(res_path) as f:
        written = json.load(f)
    assert written[0]["image_id"] == 17 and written[0]["category_id"] == 1


def test_rle_decode_uncompressed_and_compressed():
    from instance_segmentation_tpu.evaluation.coco_ap import rle_to_mask
    # uncompressed: 3x4 column-major, runs [2,3,7] -> pixels 2..4 set
    m = rle_to_mask({"size": [3, 4], "counts": [2, 3, 7]})
    flat = m.T.reshape(-1)                       # back to column-major
    want = np.zeros(12, bool)
    want[2:5] = True
    np.testing.assert_array_equal(flat, want)

    # compressed string round-trip: encode with the pycocotools scheme
    def encode(cnts):
        out = []
        for i, x in enumerate(cnts):
            if i > 2:
                x = x - cnts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and \
                       not (x == -1 and (c & 0x10))
                out.append(chr((c | (0x20 if more else 0)) + 48))
        return "".join(out)

    cnts = [7, 15, 3, 9, 2, 12]                 # sums to 48 = 6x8
    s = encode(cnts)
    m1 = rle_to_mask({"size": [6, 8], "counts": s})
    m2 = rle_to_mask({"size": [6, 8], "counts": cnts})
    np.testing.assert_array_equal(m1, m2)


def test_eval_loop_coco_rle_crowd(tmp_path):
    """An iscrowd RLE region absorbs a spurious detection instead of
    counting it as a false positive, and frame rescale maps dets from the
    decode frame to the true image size."""
    from instance_segmentation_tpu.configs import Config
    from instance_segmentation_tpu.evaluation.eval_loop import evaluate_from_json
    from instance_segmentation_tpu.utils.logger import Logger

    root = tmp_path / "coco"
    (root / "val").mkdir(parents=True)
    img_path = str(root / "val" / "000001.jpg")
    H = W = 64
    # crowd mask: uncompressed RLE covering columns 40..55 fully
    counts = [40 * H, 16 * H, (W - 56) * H]
    blob = {
        "images": [{"id": 1, "file_name": "000001.jpg",
                    "height": H, "width": W}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "iscrowd": 0, "area": 441.0,
             "segmentation": [[5.0, 5.0, 25.0, 5.0, 25.0, 25.0, 5.0, 25.0]]},
            {"image_id": 1, "category_id": 1, "iscrowd": 1, "area": 1024.0,
             "segmentation": {"size": [H, W], "counts": counts}},
        ],
    }
    with open(root / "val" / "instances.json", "w") as f:
        json.dump(blob, f)

    out = tmp_path / "out"
    out.mkdir()
    # dets in a 128x128 decode frame (2x the true size, corner-to-corner)
    f = (128 - 1) / (64 - 1)
    sq = lambda x1, y1, x2, y2: [[x1 * f, y1 * f], [x2 * f, y1 * f],
                                 [x2 * f, y2 * f], [x1 * f, y2 * f]]
    dets = [[
        [0, 0.9, [45.0, 10.0], sq(42.0, 2.0, 52.0, 20.0)],   # inside crowd
        [0, 0.5, [15.0, 15.0], sq(5.0, 5.0, 25.0, 25.0)],    # real TP
    ]]
    infos = [[img_path, [H, W]]]
    with open(out / "0_dets.json", "w") as fjson:
        json.dump(dets, fjson)
    with open(out / "0_infos.json", "w") as fjson:
        json.dump(infos, fjson)

    cfg = Config({"eval_dir": str(root), "subset": "val", "num_classes": 80,
                  "save_dir": str(out)})
    results = evaluate_from_json(cfg, 0, str(out), "coco", Logger(str(out)),
                                 80, orig_hw=(128, 128))
    assert results["AP"] == pytest.approx(1.0)
