"""Official Cityscapes result-file emission (PNG masks + pred.txt)."""

import os

import numpy as np
import pytest

from instance_segmentation_tpu.evaluation.eval_loop import write_official_results


def test_write_official_results(tmp_path):
    import cv2
    sq = [[20, 20], [80, 20], [80, 80], [20, 80]]
    dets_list = [
        [[0, 0.9, [50, 50], sq],                 # person
         [2, 0.7, [150, 60], [[120, 30], [180, 30], [180, 90], [120, 90]]]],  # car
        [],
    ]
    info_list = [("/x/aachen_000000_000019_leftImg8bit.png", (128, 256)),
                 ("/x/aachen_000001_000019_leftImg8bit.png", (128, 256))]
    n = write_official_results(str(tmp_path), "cityscapes", dets_list,
                               info_list, num_classes=8)
    assert n == 2

    txt = (tmp_path / "aachen_000000_000019_leftImg8bitpred.txt").read_text()
    lines = txt.strip().splitlines()
    assert len(lines) == 2
    # person labelId 24 first (class order), then car labelId 26
    p0, lid0, s0 = lines[0].split()
    assert lid0 == "24" and abs(float(s0) - 0.9) < 1e-6
    assert lines[1].split()[1] == "26"

    mask = cv2.imread(str(tmp_path / p0), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (128, 256)
    assert mask.max() == 255 and (mask > 0).sum() > 3000   # filled square

    # empty image still gets an (empty) pred.txt
    assert (tmp_path / "aachen_000001_000019_leftImg8bitpred.txt").read_text() == ""
