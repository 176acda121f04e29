"""Model family coverage: all compound coefficients build and shape-check.

Uses jax.eval_shape (trace only, no compile/FLOPs) so the whole B0..B8 sweep
stays cheap; exercises the scaling tables (ref models/efficient.py:549-569,
efficientnet/utils.py:138-153), the attention on/off switch (coef >= 6) and
the P8 pyramid (coef 8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instance_segmentation_tpu.models import EfficientSeg, EfficientSegConfig, generate_anchors
from instance_segmentation_tpu.models.efficientnet import feature_channels, scaled_blocks
from instance_segmentation_tpu.models.efficientseg import PYRAMID_LEVELS


def test_feature_channel_tables_match_reference():
    # ref models/efficient.py:558-569 conv_channel_coef (P3..P5 channels)
    want = {0: [40, 112, 320], 1: [40, 112, 320], 2: [48, 120, 352],
            3: [48, 136, 384], 4: [56, 160, 448], 5: [64, 176, 512],
            6: [72, 200, 576], 7: [72, 200, 576]}
    from instance_segmentation_tpu.models.efficientseg import BACKBONE_COEF
    for coef, chans in want.items():
        assert feature_channels(BACKBONE_COEF[coef])[2:5] == chans, coef


@pytest.mark.parametrize("coef", [0, 3, 6, 8])
def test_variant_shapes(coef):
    levels = PYRAMID_LEVELS[coef]
    stride = 2 ** (3 + levels - 1)
    H = W = max(256, stride)
    cfg = EfficientSegConfig(num_classes=5, compound_coef=coef)
    model = EfficientSeg(cfg)
    x = jnp.zeros((1, H, W, 3), jnp.uint8)

    out_shapes = jax.eval_shape(
        lambda r: model.init({"params": r}, x, train=False), jax.random.PRNGKey(0))
    assert "params" in out_shapes

    def fwd(r):
        v = model.init({"params": r}, x, train=False)
        return model.apply(v, x, train=False)

    kp, ae, tan, reg, cls = jax.eval_shape(fwd, jax.random.PRNGKey(0))
    assert kp.shape == (1, H, W, 1)
    assert ae.shape == (1, H, W, 4)
    assert tan.shape == (1, H, W, 2)
    anchors = generate_anchors(H, W, pyramid_levels=cfg.pyramid_levels,
                               anchor_scale=cfg.anchor_scale)
    assert reg.shape == (1, anchors.shape[0], 4)
    assert cls.shape == (1, anchors.shape[0], 5)


def test_scaled_blocks_depth():
    b0 = sum(b.num_repeat for b in scaled_blocks(0))
    b3 = sum(b.num_repeat for b in scaled_blocks(3))
    assert b0 == 16
    assert b3 > b0
