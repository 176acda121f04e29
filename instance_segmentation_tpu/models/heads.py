"""Anchor box regression / classification heads, flax/NHWC.

Re-design of ref models/efficient.py:344-417: a shared separable-conv tower is
applied at every pyramid level, but each level gets its *own* BatchNorm set
(the EfficientDet trick — shared convs, per-level statistics). The regressor
emits (B, sum_A, 4) box deltas (dy, dx, dh, dw order is fixed by the loss /
decode contract), the classifier (B, sum_A, num_classes) sigmoid scores.

The per-cell anchor layout — level-major, then cell-major (row-major), then
anchor index a = scale_idx * n_ratios + ratio_idx — must match
`generate_anchors` (models/anchors.py) exactly; both follow the reference
(utils/utils.py:418-443 anchor stacking, models/efficient.py:370-371,407-410
head reshape).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from instance_segmentation_tpu.models.layers import BatchNorm, SeparableConv, swish


class _Tower(nn.Module):
    """Shared conv tower with per-level BN, then a head conv."""

    channels: int
    num_layers: int
    pyramid_levels: int
    out_channels: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        convs = [SeparableConv(self.channels, norm=False, activation=False,
                               dtype=self.dtype, name=f"conv{i}")
                 for i in range(self.num_layers)]
        head = SeparableConv(self.out_channels, norm=False, activation=False,
                             dtype=self.dtype, name="head")
        outs = []
        for li, x in enumerate(feats):
            for i in range(self.num_layers):
                x = convs[i](x, train=train)
                x = BatchNorm(axis_name=self.axis_name, name=f"bn_l{li}_{i}")(x, train=train)
                x = swish(x)
            outs.append(head(x, train=train))
        return outs


class Regressor(nn.Module):
    channels: int
    num_anchors: int
    num_layers: int
    pyramid_levels: int = 5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        outs = _Tower(self.channels, self.num_layers, self.pyramid_levels,
                      self.num_anchors * 4, dtype=self.dtype, axis_name=self.axis_name,
                      name="tower")(feats, train=train)
        flat = [o.reshape(o.shape[0], -1, 4) for o in outs]  # NHWC -> (B, H*W*A, 4)
        return jnp.concatenate(flat, axis=1)


class Classifier(nn.Module):
    channels: int
    num_anchors: int
    num_classes: int
    num_layers: int
    pyramid_levels: int = 5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        outs = _Tower(self.channels, self.num_layers, self.pyramid_levels,
                      self.num_anchors * self.num_classes, dtype=self.dtype,
                      axis_name=self.axis_name, name="tower")(feats, train=train)
        flat = [o.reshape(o.shape[0], -1, self.num_classes) for o in outs]
        return nn.sigmoid(jnp.concatenate(flat, axis=1).astype(jnp.float32))
