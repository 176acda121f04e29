"""On-device augmentation vs the host pipeline ops."""

import numpy as np
import jax
import jax.numpy as jnp

from instance_segmentation_tpu.ops.device_aug import random_hflip_brightness


def test_flip_matches_host_semantics():
    rng = np.random.default_rng(0)
    B, H, W = 4, 16, 24
    images = rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)
    polys = rng.integers(0, 15, (B, 2, 4, 2)).astype(np.float32)

    out_img, out_polys = jax.jit(
        lambda i, p, k: random_hflip_brightness(i, p, k, hflip_ratio=1.1,
                                                brightness_ratio=0.0))(
        jnp.asarray(images), jnp.asarray(polys), jax.random.PRNGKey(0))
    # always-flip, no brightness: image mirrored, col -> W-1-col (ref
    # cv2_aug_transforms.py:130-148), rows unchanged
    np.testing.assert_array_equal(np.asarray(out_img), images[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(out_polys)[..., 0], polys[..., 0])
    np.testing.assert_array_equal(np.asarray(out_polys)[..., 1],
                                  (W - 1) - polys[..., 1])


def test_brightness_bounds_and_dtype():
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    polys = np.zeros((2, 1, 4, 2), np.float32)
    out_img, _ = jax.jit(
        lambda i, p, k: random_hflip_brightness(i, p, k, hflip_ratio=0.0,
                                                brightness_ratio=1.0,
                                                shift_value=10))(
        jnp.asarray(images), jnp.asarray(polys), jax.random.PRNGKey(3))
    out = np.asarray(out_img)
    assert out.dtype == np.uint8
    diff = out.astype(int) - images.astype(int)
    # uniform shift per sample within [-10, 10] wherever unclipped
    for b in range(2):
        interior = (images[b] > 10) & (images[b] < 245)
        vals = np.unique(diff[b][interior])
        assert len(vals) == 1 and -10 <= vals[0] <= 10


def test_device_aug_in_train_step():
    import jax.numpy as jnp
    from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig
    from instance_segmentation_tpu.parallel import create_train_state, make_train_step
    from instance_segmentation_tpu.parallel.train_step import make_optimizer

    H, W = 128, 256
    model = EfficientSeg(EfficientSegConfig(num_classes=8, compound_coef=0))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, H, W, 3),
                               make_optimizer("Adam", 1e-4))
    step = make_train_step(model, H, W, max_points=128, donate=False,
                           device_aug=True)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, H, W, 3), dtype=np.uint8)
    polys = np.zeros((2, 8, 16, 2), np.float32)
    polys[:, 0, 0] = (20, 30); polys[:, 0, 1] = (20, 90)
    polys[:, 0, 2] = (70, 60); polys[:, 0, 3:] = (70, 60)
    nv = np.zeros((2, 8), np.int32); nv[:, 0] = 3
    ci = -np.ones((2, 8), np.int32); ci[:, 0] = 1
    _, stats = step(state, images, polys, nv, ci, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["total_loss"]))
