"""On-device augmentation (batched, inside the compiled train step).

SURVEY.md §7.9: the reference runs every augmentation in per-image cv2 on
host DataLoader workers. Geometric resize stays on host (cv2's C++ JPEG/
resize path), but the cheap label-aware ops — horizontal flip and photometric
brightness (the reference's shipped train pipeline, configs/trans_cfg.json:
resize + random_hflip + random_brightness) — run here on device: uint8 in,
uint8 out, polygons flipped in lockstep, one jax.random key per batch.

On the 1-core hosts these TPUs come with, moving this work off the host is a
direct step-time win; it also makes the aug bit-reproducible from the train
step's rng key.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_hflip_brightness(images: jnp.ndarray, polys: jnp.ndarray, rng,
                            hflip_ratio: float = 0.5,
                            brightness_ratio: float = 1.0,
                            shift_value: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images uint8 [B,H,W,3]; polys f32 [B,M,V,2] (row, col) at input res.

    Per-sample random horizontal flip (image + polygon columns,
    ref cv2_aug_transforms.py:130-148: x' = W - x - 1) and brightness shift
    (ref :234-251: integer shift in [-s, s], round, clip to [0, 255]).
    """
    B, H, W, _ = images.shape
    k_flip, k_bshift, k_bgate = jax.random.split(rng, 3)

    flip = jax.random.uniform(k_flip, (B,)) <= hflip_ratio
    flipped = images[:, :, ::-1, :]
    images = jnp.where(flip[:, None, None, None], flipped, images)
    pcols = jnp.where(flip[:, None, None], (W - 1) - polys[..., 1], polys[..., 1])
    polys = jnp.stack([polys[..., 0], pcols], axis=-1)

    gate = jax.random.uniform(k_bgate, (B,)) <= brightness_ratio
    shift = jax.random.randint(k_bshift, (B,), -shift_value, shift_value + 1)
    shift = jnp.where(gate, shift, 0).astype(jnp.float32)
    out = jnp.clip(jnp.rint(images.astype(jnp.float32)
                            + shift[:, None, None, None]), 0, 255)
    return out.astype(jnp.uint8), polys
