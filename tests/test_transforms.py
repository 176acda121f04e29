"""Augmentation pipeline tests."""

import numpy as np

from instance_segmentation_tpu.configs import Configer
from instance_segmentation_tpu.transforms import CommonTransforms, build_augmentations

CFG = {
    "train_trans": {
        "trans_seq": ["resize", "random_hflip", "random_brightness"],
        "random_brightness": {"ratio": 1.0, "shift_value": 10},
        "random_hflip": {"ratio": 0.5, "swap_pair": []},
        "resize": {"target_size": 2},
    },
    "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
    "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                  "std": [0.229, 0.224, 0.225]},
}


def _img_label(h=64, w=128):
    img = np.random.default_rng(0).integers(0, 255, (h, w, 3), dtype=np.uint8)
    poly = np.array([[10, 10], [50, 10], [50, 40], [10, 40]], np.int32)  # (x, y)
    return img, ([3], [poly])


def test_resize_halves_and_scales_polygons():
    cfg = Configer(CFG)
    tf = CommonTransforms(cfg, "val", seed=0)
    img, label = _img_label()
    out, (cls_ids, polys), info = tf(img, label, "x.png")
    assert out.shape == (32, 64, 3)
    assert cls_ids == [3]
    # polygons are (row, col) int32 after CoordinateReverser
    assert polys[0].dtype == np.int32
    assert polys[0][:, 0].max() <= 32 and polys[0][:, 1].max() <= 64
    np.testing.assert_array_equal(polys[0][0], [5, 5])


def test_train_pipeline_runs_and_is_seeded():
    cfg = Configer(CFG)
    a = CommonTransforms(cfg, "train", seed=42)
    b = CommonTransforms(cfg, "train", seed=42)
    img, label = _img_label()
    out_a, lab_a, _ = a(img.copy(), (label[0], [p.copy() for p in label[1]]))
    out_b, lab_b, _ = b(img.copy(), (label[0], [p.copy() for p in label[1]]))
    np.testing.assert_array_equal(out_a, out_b)
    np.testing.assert_array_equal(lab_a[1][0], lab_b[1][0])


def test_hflip_flips_x():
    from instance_segmentation_tpu.transforms.augment import RandomHFlip
    rng = np.random.default_rng(0)
    img, (ids, polys) = _img_label()
    op = RandomHFlip(ratio=1.1)   # always fires
    out, (ids2, polys2) = op(rng, img, (ids, polys))
    np.testing.assert_array_equal(out, img[:, ::-1])
    assert polys2[0][0, 0] == img.shape[1] - polys[0][0, 0] - 1


def test_detransform_pixel_round_trip():
    cfg = Configer(CFG)
    tf = CommonTransforms(cfg, "val", seed=0)
    from instance_segmentation_tpu.transforms import TransInfo
    info = TransInfo("x.png", (64, 128))
    # model-space (row, col) -> original (x, y)
    out = tf.detransform_pixel(np.array([[16.0, 32.0]]), info)
    # scale = (W-1)/(tw-1) = 127/63, (H-1)/(th-1) = 63/31
    np.testing.assert_allclose(out[0], [32 * 127 / 63, 16 * 63 / 31], atol=1e-4)


def test_rotate_and_crop_keep_labels_consistent():
    from instance_segmentation_tpu.transforms.augment import RandomCrop, RandomRotate
    rng = np.random.default_rng(1)
    img, (ids, polys) = _img_label()
    out, lab = RandomRotate(ratio=1.0, max_degree=15)(rng, img, (ids, polys))
    assert out.ndim == 3
    if lab is not None and lab[0]:
        assert lab[1][0].shape[1] == 2
    out2, lab2 = RandomCrop(ratio=1.1, crop_size=(48, 32))(rng, img, (ids, polys))
    assert out2.shape[0] <= 32 + 1 and out2.shape[1] <= 48 + 1
