"""BiFPN feature pyramid, flax/NHWC.

Re-design of the reference BiFPN cell (models/efficient.py:55-341): top-down
then bottom-up pass over P3..P7 with learned fusion weights ("fast attention",
ref :194-266) or plain sums (ref :268-341, used for compound_coef >= 6), with
the first cell down-channeling the raw backbone maps and synthesising P6/P7
from P5 (ref :105-140). P8 handling (compound_coef 8) included.

The fusion weights are tiny relu-normalised vectors; everything else is
separable convs + SAME max-pools + nearest upsampling — all fusions are
elementwise and get folded into the surrounding convs by XLA.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from instance_segmentation_tpu.models.layers import (
    BatchNorm, ConvSame, SeparableConv, max_pool_same, pin_data_sharding,
    swish, upsample_nearest_2x,
)


class _DownChannel(nn.Module):
    """1x1 conv + BN used to bring backbone channels to the BiFPN width."""

    features: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvSame(self.features, (1, 1), dtype=self.dtype, name="conv")(x)
        return BatchNorm(axis_name=self.axis_name, name="bn")(x, train=train)


class BiFPNCell(nn.Module):
    num_channels: int
    conv_channels: Sequence[int]      # channels of backbone P3..P5 (first cell only)
    first_time: bool = False
    attention: bool = True
    use_p8: bool = False
    epsilon: float = 1e-4
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    def _fuse(self, name: str, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        """Weighted (fast-attention) or plain fusion of same-shape maps."""
        if not self.attention:
            out = inputs[0]
            for t in inputs[1:]:
                out = out + t
            return swish(out)
        w = self.param(name, nn.initializers.ones_init(), (len(inputs),), jnp.float32)
        w = nn.relu(w)
        w = w / (jnp.sum(w) + self.epsilon)
        out = w[0].astype(inputs[0].dtype) * inputs[0]
        for i, t in enumerate(inputs[1:], start=1):
            out = out + w[i].astype(t.dtype) * t
        return swish(out)

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        C = self.num_channels
        sep = lambda name: SeparableConv(C, norm=True, activation=False,
                                         dtype=self.dtype, axis_name=self.axis_name, name=name)
        dc = lambda name: _DownChannel(C, dtype=self.dtype, axis_name=self.axis_name, name=name)

        if self.first_time:
            p3, p4, p5 = feats
            got = tuple(f.shape[-1] for f in feats)
            assert got == tuple(self.conv_channels), (
                f"backbone P3..P5 channels {got} != scaling-table "
                f"conv_channels {tuple(self.conv_channels)}")
            p6_in = max_pool_same(dc("p5_to_p6")(p5, train))
            p7_in = max_pool_same(p6_in)
            p8_in = max_pool_same(p7_in) if self.use_p8 else None
            p3_in = dc("p3_down_channel")(p3, train)
            p4_in = dc("p4_down_channel")(p4, train)
            p5_in = dc("p5_down_channel")(p5, train)
        else:
            if self.use_p8:
                p3_in, p4_in, p5_in, p6_in, p7_in, p8_in = feats
            else:
                p3_in, p4_in, p5_in, p6_in, p7_in = feats
                p8_in = None

        # -- top-down pass ---------------------------------------------------
        if self.use_p8:
            p7_up = sep("conv7_up")(self._fuse("p7_w1", [p7_in, upsample_nearest_2x(p8_in)]), train)
            p6_up = sep("conv6_up")(self._fuse("p6_w1", [p6_in, upsample_nearest_2x(p7_up)]), train)
        else:
            p6_up = sep("conv6_up")(self._fuse("p6_w1", [p6_in, upsample_nearest_2x(p7_in)]), train)
        p5_up = sep("conv5_up")(self._fuse("p5_w1", [p5_in, upsample_nearest_2x(p6_up)]), train)
        p4_up = sep("conv4_up")(self._fuse("p4_w1", [p4_in, upsample_nearest_2x(p5_up)]), train)
        p3_out = sep("conv3_up")(self._fuse("p3_w1", [p3_in, upsample_nearest_2x(p4_up)]), train)

        if self.first_time:
            # second skip path uses freshly down-channeled backbone maps
            # (ref models/efficient.py:235-237)
            p4_in = dc("p4_down_channel_2")(feats[1], train)
            p5_in = dc("p5_down_channel_2")(feats[2], train)

        # -- bottom-up pass --------------------------------------------------
        p4_out = sep("conv4_down")(
            self._fuse("p4_w2", [p4_in, p4_up, max_pool_same(p3_out)]), train)
        p5_out = sep("conv5_down")(
            self._fuse("p5_w2", [p5_in, p5_up, max_pool_same(p4_out)]), train)
        p6_out = sep("conv6_down")(
            self._fuse("p6_w2", [p6_in, p6_up, max_pool_same(p5_out)]), train)
        if self.use_p8:
            p7_out = sep("conv7_down")(
                self._fuse("p7_w2", [p7_in, p7_up, max_pool_same(p6_out)]), train)
            p8_out = sep("conv8_down")(
                self._fuse("p8_w2", [p8_in, max_pool_same(p7_out)]), train)
            return [p3_out, p4_out, p5_out, p6_out, p7_out, p8_out]
        p7_out = sep("conv7_down")(
            self._fuse("p7_w2", [p7_in, max_pool_same(p6_out)]), train)
        return [p3_out, p4_out, p5_out, p6_out, p7_out]


class BiFPN(nn.Module):
    """A stack of `repeats` BiFPN cells (ref models/efficient.py:573-579)."""

    num_channels: int
    conv_channels: Sequence[int]
    repeats: int
    attention: bool = True
    use_p8: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        for i in range(self.repeats):
            # pyramid maps are tiny — pin them to batch-only sharding at
            # every cell boundary (see layers.pin_data_sharding: W-sharding
            # buys nothing here and chained cells hit a partitioner bug
            # producing wrong gradients under the spatial mesh axis)
            feats = [pin_data_sharding(f) for f in feats]
            feats = BiFPNCell(
                num_channels=self.num_channels,
                conv_channels=self.conv_channels,
                first_time=(i == 0),
                attention=self.attention,
                use_p8=self.use_p8,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"cell{i}",
            )(feats, train=train)
        return [pin_data_sharding(f) for f in feats]
