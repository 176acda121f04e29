"""EfficientNet-B0..B8 backbone (feature-pyramid variant), flax/NHWC.

Re-derivation of the standard EfficientNet family used by the reference
(models/efficientnet/model.py, models/efficientnet/utils.py): compound scaling
(width/depth coefficients, ref utils.py:138-153), the seven-stage MBConv stack
(ref utils.py:235-240 block strings), squeeze-excite, and stochastic depth.

The classifier head is omitted — this backbone exists to feed the detector and
the U-Net decoder, returning the five feature maps snapshotted just before
each stride-2 stage plus the final output (ref models/efficient.py:435-457):

    P1 (/2, post-stage1) .. P4 (/16, post-stage5), P5 (/32, final).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from instance_segmentation_tpu.models.layers import (
    BatchNorm, ConvSame, drop_connect, swish,
)


@dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    stride: int
    se_ratio: float
    id_skip: bool = True


# The canonical 7-stage B0 architecture (ref utils.py:235-240).
BASE_BLOCKS: Tuple[BlockArgs, ...] = (
    BlockArgs(3, 1, 32, 16, 1, 1, 0.25),
    BlockArgs(3, 2, 16, 24, 6, 2, 0.25),
    BlockArgs(5, 2, 24, 40, 6, 2, 0.25),
    BlockArgs(3, 3, 40, 80, 6, 2, 0.25),
    BlockArgs(5, 3, 80, 112, 6, 1, 0.25),
    BlockArgs(5, 4, 112, 192, 6, 2, 0.25),
    BlockArgs(3, 1, 192, 320, 6, 1, 0.25),
)

# width, depth coefficients per variant (ref utils.py:138-153).
SCALING = {
    0: (1.0, 1.0), 1: (1.0, 1.1), 2: (1.1, 1.2), 3: (1.2, 1.4), 4: (1.4, 1.8),
    5: (1.6, 2.2), 6: (1.8, 2.6), 7: (2.0, 3.1), 8: (2.2, 3.6),
}


def round_filters(filters: int, width_coefficient: float, divisor: int = 8) -> int:
    """Width scaling with divisor rounding (ref utils.py:62-74)."""
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    """Depth scaling (ref utils.py:77-82)."""
    return int(math.ceil(depth_coefficient * repeats))


def scaled_blocks(variant: int) -> List[BlockArgs]:
    w, d = SCALING[variant]
    out = []
    for b in BASE_BLOCKS:
        out.append(BlockArgs(
            kernel_size=b.kernel_size,
            num_repeat=round_repeats(b.num_repeat, d),
            input_filters=round_filters(b.input_filters, w),
            output_filters=round_filters(b.output_filters, w),
            expand_ratio=b.expand_ratio,
            stride=b.stride,
            se_ratio=b.se_ratio,
        ))
    return out


def stem_filters(variant: int) -> int:
    return round_filters(32, SCALING[variant][0])


def feature_channels(variant: int) -> List[int]:
    """Channels of [P1..P5] — the decoder/ BiFPN channel contract.

    Matches the reference's per-variant tables (models/efficient.py:558-569
    conv_channel_coef = channels of P3..P5; :596-606 = P5..P1 reversed).
    """
    blocks = scaled_blocks(variant)
    # snapshot before each stride-2 stage (stages 1,2,3,5) + final output
    chans = []
    for i, b in enumerate(blocks):
        if b.stride == 2 and i > 0:
            chans.append(blocks[i - 1].output_filters)
    chans.append(blocks[-1].output_filters)
    return chans


class SqueezeExcite(nn.Module):
    squeezed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = ConvSame(self.squeezed, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = swish(s)
        s = ConvSame(c, (1, 1), dtype=self.dtype, name="expand")(s)
        return jnp.asarray(nn.sigmoid(s), x.dtype) * x


class MBConv(nn.Module):
    """Mobile inverted bottleneck (expand -> depthwise -> SE -> project).

    Mirrors ref models/efficientnet/model.py:17-102 semantics, including the
    skip + per-sample drop-connect on identity-shaped blocks.
    """

    args: BlockArgs
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    quant: bool = False   # int8 dense convs (expand/project; SE + depthwise stay float)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = self.args
        inputs = x
        expanded = a.input_filters * a.expand_ratio
        if a.expand_ratio != 1:
            x = ConvSame(expanded, (1, 1), use_bias=False, dtype=self.dtype,
                         quant=self.quant and not train, name="expand_conv")(x)
            x = BatchNorm(axis_name=self.axis_name, name="bn0")(x, train=train)
            x = swish(x)
        k = a.kernel_size
        x = ConvSame(expanded, (k, k), strides=(a.stride, a.stride), groups=expanded,
                     use_bias=False, dtype=self.dtype, name="depthwise_conv")(x)
        x = BatchNorm(axis_name=self.axis_name, name="bn1")(x, train=train)
        x = swish(x)
        if a.se_ratio and 0 < a.se_ratio <= 1:
            x = SqueezeExcite(max(1, int(a.input_filters * a.se_ratio)),
                              dtype=self.dtype, name="se")(x)
        x = ConvSame(a.output_filters, (1, 1), use_bias=False, dtype=self.dtype,
                     quant=self.quant and not train, name="project_conv")(x)
        x = BatchNorm(axis_name=self.axis_name, name="bn2")(x, train=train)
        if a.id_skip and a.stride == 1 and a.input_filters == a.output_filters:
            if train and self.drop_rate > 0.0:
                x = drop_connect(x, self.drop_rate, deterministic=False,
                                 rng=self.make_rng("dropout"))
            x = x + inputs
        return x


class EfficientNetFeatures(nn.Module):
    """Backbone producing the five pyramid snapshots [P1..P5].

    P_i is the activation just before the i-th stride-2 MBConv block (and the
    final block output for P5), matching ref models/efficient.py:445-456 so a
    converted torch checkpoint lands on identical tensors.
    """

    variant: int = 0
    drop_connect_rate: float = 0.2
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    s2d: Any = False          # False | True | "train": run the stem + the /2
                              # MBConv stage on the /4 cell grid in s2d(2)
                              # layout (models/s2d.py MBConvS2D/StemS2D) —
                              # exact, checkpoint-identical; kills the lane
                              # padding of the 16-40-channel /2-res tensors.
                              # "stem": s2d the stem conv ONLY, exiting to the
                              # standard layout before block 0 — the inference
                              # sweet spot (the full MBConv s2d wins in
                              # training where the backward is layout-bound,
                              # but its depthwise d2s/s2d roundtrips lose at
                              # eval; the stem-only form still avoids
                              # materializing the lane-padded full-res
                              # 3-channel image as a conv operand).
    quant: bool = False       # int8 dense convs (inference path)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        blocks = scaled_blocks(self.variant)
        want_s2d = self.s2d is True or (self.s2d == "train" and train)
        shape_ok = x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        use_s2d = want_s2d and shape_ok
        use_stem_s2d = use_s2d or (self.s2d == "stem" and shape_ok)

        # flatten stages into the per-block list the reference iterates over
        flat: List[BlockArgs] = []
        for b in blocks:
            flat.append(b)
            for _ in range(b.num_repeat - 1):
                flat.append(BlockArgs(b.kernel_size, 1, b.output_filters, b.output_filters,
                                      b.expand_ratio, 1, b.se_ratio))
        total = len(flat)

        if use_stem_s2d:
            from instance_segmentation_tpu.models.s2d import (
                MBConvS2D, StemS2D, depth_to_space, space_to_depth)
            x = space_to_depth(x, 4)
            x = StemS2D(stem_filters(self.variant), in_features=x.shape[-1] // 16,
                        r_in=4, dtype=self.dtype, name="stem_conv")(x)
            x = BatchNorm(axis_name=self.axis_name, phases=4,
                          name="stem_bn")(x, train=train)
            x = swish(x)
            if not use_s2d:
                x = depth_to_space(x, 2)        # exit to standard layout
        else:
            x = ConvSame(stem_filters(self.variant), (3, 3), strides=(2, 2), use_bias=False,
                         dtype=self.dtype, name="stem_conv")(x)
            x = BatchNorm(axis_name=self.axis_name, name="stem_bn")(x, train=train)
            x = swish(x)

        features: List[jnp.ndarray] = []
        last_x = None
        in_cells = use_s2d          # x currently in s2d(2) on the /4 cells
        for idx, b in enumerate(flat):
            rate = self.drop_connect_rate * idx / total
            if in_cells:
                # /2-res blocks run on the cell grid; the first stride-2
                # block is the transition (its depthwise conv lands on the
                # cell grid itself, r_out = 1 -> standard layout out).
                y = MBConvS2D(b, r_in=2, drop_rate=rate, dtype=self.dtype,
                              axis_name=self.axis_name,
                              name=f"block{idx}")(x, train=train)
                if b.stride == 2:
                    features.append(depth_to_space(last_x, 2)
                                    if last_x is not None else None)
                    in_cells = False
            else:
                y = MBConv(b, drop_rate=rate, dtype=self.dtype, axis_name=self.axis_name,
                           quant=self.quant, name=f"block{idx}")(x, train=train)
                if b.stride == 2:
                    features.append(last_x)
            x = y
            last_x = x
        features.append(x)
        return features
