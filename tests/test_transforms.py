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


def test_shuffle_trans_seq_applies_ops_in_shuffled_order():
    """shuffle_trans_seq ops run before trans_seq in per-sample random order
    (ref cv2_aug_transforms.py:800-813)."""
    cfg = Configer({
        "train_trans": {
            "trans_seq": ["resize"],
            "resize": {"target_size": 2},
            "shuffle_trans_seq": ["random_brightness", "random_contrast"],
            "random_brightness": {"ratio": 1.0, "shift_value": 10},
            "random_contrast": {"ratio": 1.0, "lower": 0.8, "upper": 1.2},
        },
        "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]},
    })
    tf = CommonTransforms(cfg, "train", seed=0)
    img, label = _img_label()
    out, _, _ = tf(img, label, "x.png")
    assert out.shape == (32, 64, 3)          # trans_seq still ran last
    # photometric ops actually fired (ratio 1.0): output differs from a
    # resize-only pipeline
    base_cfg = Configer({
        "train_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "val_trans": {"trans_seq": ["resize"], "resize": {"target_size": 2}},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]},
    })
    base, _, _ = CommonTransforms(base_cfg, "train", seed=0)(img, label, "x.png")
    assert np.abs(out.astype(int) - base.astype(int)).max() > 0
    # both orders occur across samples (shuffling is per call)
    tf2 = CommonTransforms(cfg, "train", seed=1)
    orders = set()
    for _ in range(16):
        prefix = tf2._shuffled_prefix(tf2._rng)
        orders.add(tuple(type(op).__name__ for op in prefix))
    assert len(orders) == 2


def test_shuffle_trans_seq_nested_picks_one_group():
    cfg = Configer({
        "train_trans": {
            "trans_seq": [],
            "shuffle_trans_seq": [["random_brightness"], ["random_contrast"]],
            "random_brightness": {"ratio": 1.0, "shift_value": 10},
            "random_contrast": {"ratio": 1.0, "lower": 0.8, "upper": 1.2},
        },
        "val_trans": {"trans_seq": []},
        "normalize": {"div_value": 255.0, "mean": [0.485, 0.456, 0.406],
                      "std": [0.229, 0.224, 0.225]},
    })
    tf = CommonTransforms(cfg, "train", seed=2)
    seen = set()
    for _ in range(16):
        prefix = tf._shuffled_prefix(tf._rng)
        assert len(prefix) == 1
        seen.add(type(prefix[0]).__name__)
    assert seen == {"RandomBrightness", "RandomContrast"}


def test_random_resize_target_size_drives_output_size():
    """target_size makes the scale ratios apply to the fixed base size
    (ref cv2_aug_transforms.py:262-280)."""
    from instance_segmentation_tpu.transforms.augment import RandomResize
    rng = np.random.default_rng(0)
    img, label = _img_label(h=64, w=128)
    op = RandomResize(ratio=0.0, target_size=(100, 50))   # gate off -> scale 1
    out, _ = op(rng, img, label)
    assert out.shape[:2] == (50, 100)
    op2 = RandomResize(ratio=1.0, target_size=(100, 50),
                       scale_range=(2.0, 2.0), aspect_range=(1.0, 1.0))
    out2, _ = op2(rng, img, label)
    assert out2.shape[:2] == (100, 200)
    # int target_size means a square base
    op3 = RandomResize(ratio=0.0, target_size=64)
    out3, _ = op3(rng, img, label)
    assert out3.shape[:2] == (64, 64)
