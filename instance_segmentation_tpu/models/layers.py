"""Shared layers: TF-SAME convs, batch norm policy, separable conv.

TPU notes:
  * NHWC layout throughout — XLA:TPU's native conv layout.
  * `padding='SAME'` in XLA reproduces exactly the TF-style asymmetric padding
    the reference implements by hand (reference: models/efficientnet/
    utils_extra.py:9-47 Conv2dStaticSamePadding, :50-86 MaxPool2dStaticSamePadding);
    those 86 lines disappear here.
  * BatchNorm runs in float32 regardless of compute dtype. Under a sharded
    batch axis (GSPMD jit) the batch-stat reductions are global, which makes
    every BN a synchronized BN — replacing the reference's 625-line
    master/slave thread package (reference: utils/sync_batchnorm/*). For
    shard_map-style explicit SPMD, pass `axis_name` and the stats are
    additionally pmean'ed over that axis.
  * Swish is jax.nn.silu; the reference's MemoryEfficientSwish custom autograd
    (models/efficientnet/utils.py:38-55) is unnecessary — XLA rematerializes.

Torch->flax BN momentum: torch updates running = (1-m)*running + m*batch, flax
updates running = m*running + (1-m)*batch, so flax_momentum = 1 - torch_momentum.
The reference uses torch momentum 0.01 (=> flax 0.99) in the detector and torch
default 0.1 (=> flax 0.9) in the U-Net decoder (reference: models/efficient.py:36
vs :472-480).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Detector-side BN constants (ref models/efficient.py:36: momentum=0.01, eps=1e-3)
BN_MOMENTUM_DET = 0.99
BN_EPS_DET = 1e-3
# U-Net decoder BN constants (torch defaults, ref models/efficient.py:472-480)
BN_MOMENTUM_UNET = 0.9
BN_EPS_UNET = 1e-5


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


class BatchNorm(nn.Module):
    """float32 batch norm with optional cross-replica axis.

    Stats are computed (and stored) in float32; the output is cast back to the
    input dtype so bf16 activations flow through unchanged.
    """

    momentum: float = BN_MOMENTUM_DET
    epsilon: float = BN_EPS_DET
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_dtype = x.dtype
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )(x.astype(jnp.float32))
        return y.astype(in_dtype)


class ConvSame(nn.Module):
    """2D conv with TF-style SAME padding (or VALID), NHWC."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
        )(x)


def max_pool_same(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """SAME max pool with ZERO padding (ref MaxPool2dStaticSamePadding,
    utils_extra.py:50-86).

    NB: the reference pads the pool input with zeros via F.pad — a deviation
    from true TF SAME pooling (-inf padding) that changes border values when
    a window is all-negative (post-swish activations reach -0.278). We
    reproduce the zero-padding for checkpoint/AP parity.
    """
    h, w = x.shape[1], x.shape[2]
    extra_v = (math.ceil(h / stride) - 1) * stride - h + window
    extra_h = (math.ceil(w / stride) - 1) * stride - w + window
    top, left = extra_v // 2, extra_h // 2
    x = jnp.pad(x, ((0, 0), (top, extra_v - top), (left, extra_h - left), (0, 0)))
    return nn.max_pool(x, window_shape=(window, window),
                       strides=(stride, stride), padding="VALID")


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample, NHWC (ref nn.Upsample scale_factor=2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class SeparableConv(nn.Module):
    """Depthwise 3x3 (no bias) + pointwise 1x1 (bias) [+ BN] [+ swish].

    Mirrors the reference block semantics (models/efficient.py:14-52): only the
    pointwise conv carries a bias; BN uses the detector constants.
    """

    features: int
    norm: bool = True
    activation: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = ConvSame(in_ch, (3, 3), groups=in_ch, use_bias=False, dtype=self.dtype,
                     name="depthwise")(x)
        x = ConvSame(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                     name="pointwise")(x)
        if self.norm:
            x = BatchNorm(axis_name=self.axis_name, name="bn")(x, train=train)
        if self.activation:
            x = swish(x)
        return x


def drop_connect(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth (ref models/efficientnet/utils.py:85-94)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jnp.floor(keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), dtype=jnp.float32))
    return (x / keep) * mask.astype(x.dtype)
