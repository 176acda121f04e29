"""Space-to-depth execution of full-resolution conv stages (exact).

The U-Net's finest stages (ref models/efficient.py:472-541) run 3x3 convs at
/2 and /1 resolution with 16-48 channels. On TPU, tensors with C << 128 pad
the 128-wide lane dimension, so every elementwise/BN/layout pass over a
[B, H, W, 16] activation wastes up to 8x HBM bandwidth — the round-2 profile
showed this stage stack backward-bound at 2.3% MFU with "data formatting" +
BN/swish chains costing more than the conv math itself.

Fix: evaluate those stages on the /4 cell grid in space-to-depth layout
([B, H/r, W/r, C*r*r], r = 2 or 4), where channel counts are 128-304 and
every tensor tiles the vector lanes exactly. The transformation is EXACT —
conv kernels, transpose-conv kernels, biases, and batch-norm statistics are
rearranged at apply time (phase-transformed kernels); parameter trees and
checkpoints are identical to the standard path.

Layout convention (phase-minor): s2d channel index = c * r^2 + py * r + px,
i.e. channels vary slowest. This makes channel-concat of two s2d tensors
equal to the s2d of the full-res channel-concat, so skip connections and the
raw-image concat need no extra shuffles.

Equivalences used (all exact):
  * k x k SAME conv at full res == kc x kc SAME conv on the cell grid with a
    phase-expanded kernel (kc = 3 for k = 3, any r): cell offset
    floor((phase+tap)/r), in-phase (phase+tap) mod r; structural zeros
    elsewhere. Zero cell padding reproduces zero SAME padding.
  * 2x2/s2 ConvTranspose (VALID) == a 1x1 cell matmul from s2d(r/2) of the
    input grid to s2d(r) of the output grid: output phase = 2*q + e.
  * BatchNorm over full-res channels == group-normalizing the r^2 phase
    copies together: per-channel stats are the phase-average of per-(c,phase)
    stats; scale/shift broadcast across phases. Running stats stay [C].
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from instance_segmentation_tpu.models.layers import (
    BN_EPS_UNET, BN_MOMENTUM_UNET, BatchNorm,
)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/r, W/r, C*r*r], phase-minor (c*r^2 + py*r + px)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # [B, Hc, Wc, C, ry, rx]
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of space_to_depth (phase-minor layout)."""
    b, hc, wc, cr = x.shape
    c = cr // (r * r)
    x = x.reshape(b, hc, wc, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # [B, Hc, ry, Wc, rx, C]
    return x.reshape(b, hc * r, wc * r, c)


@lru_cache(maxsize=None)
def _phase_selector(k: int, r: int) -> Tuple[np.ndarray, int]:
    """S[tap, out_phase, cell, in_phase] one-hot selector for a k-tap 1D conv
    viewed on the r-cell grid, plus the number of cell taps kc."""
    p = (k - 1) // 2
    offs = sorted({(ph + d) // r for ph in range(r) for d in range(-p, p + 1)})
    lo = offs[0]
    kc = offs[-1] - lo + 1
    s = np.zeros((k, r, kc, r), np.float32)
    for a in range(k):
        d = a - p
        for ph in range(r):
            t = ph + d
            s[a, ph, (t // r) - lo, t % r] = 1.0
    return s, kc


def s2d_conv_kernel(kernel: jnp.ndarray, r: int) -> jnp.ndarray:
    """[kh, kw, Cin, Cout] full-res SAME conv kernel -> [kc, kc, Cin*r^2,
    Cout*r^2] cell-grid SAME kernel (phase-minor channels). Exact."""
    kh, kw, cin, cout = kernel.shape
    sy, kcy = _phase_selector(kh, r)
    sx, kcx = _phase_selector(kw, r)
    # W[cy, cx, cin, qy, qx, cout, py, px]
    w = jnp.einsum("abio,apcq,bPdQ->cdiqQopP",
                   kernel, jnp.asarray(sy), jnp.asarray(sx))
    return w.reshape(kcy, kcx, cin * r * r, cout * r * r)


@lru_cache(maxsize=None)
def _upconv_selector(r_out: int) -> np.ndarray:
    """T[q, e, p] = 1 if p == 2*q + (1-e): flax ConvTranspose applies the
    kernel spatially flipped (out[2i+e] = K[1-e] * in[i], probed)."""
    r_in = r_out // 2
    t = np.zeros((r_in, 2, r_out), np.float32)
    for q in range(r_in):
        for e in range(2):
            t[q, e, 2 * q + (1 - e)] = 1.0
    return t


def s2d_upconv_matrix(kernel: jnp.ndarray, r_out: int) -> jnp.ndarray:
    """2x2/s2 ConvTranspose kernel [2, 2, Cin, Cout] -> [Cin*r_in^2,
    Cout*r_out^2] cell matmul (r_in = r_out // 2), phase-minor channels."""
    _, _, cin, cout = kernel.shape
    r_in = r_out // 2
    t = jnp.asarray(_upconv_selector(r_out))
    # W[cin, qy, qx, cout, py, px]
    w = jnp.einsum("efio,qep,QfP->iqQopP", kernel, t, t)
    return w.reshape(cin * r_in * r_in, cout * r_out * r_out)


def _tile_bias(b: jnp.ndarray, r: int) -> jnp.ndarray:
    """Per-channel bias -> per-(channel, phase), phase-minor."""
    return jnp.repeat(b, r * r)


class _ConvParams(nn.Module):
    """Declares the exact parameters of a flax nn.Conv / nn.ConvTranspose
    (same names, shapes, dtypes, initializers) without its compute, so the
    s2d path shares checkpoints with the standard modules."""

    kernel_shape: Tuple[int, ...]
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kernel_shape, jnp.float32)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
        return k, b


class _ConvSameParams(nn.Module):
    """Parameter tree of layers.ConvSame (the inner nn.Conv is auto-named
    Conv_0) without its compute."""

    kernel_shape: Tuple[int, ...]
    features: int

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kernel_shape, self.features, name="Conv_0")()


class UpConvS2D(nn.Module):
    """2x2/s2 transpose conv as a cell-grid 1x1 matmul: s2d(r_out/2) of the
    input grid -> s2d(r_out) of the 2x-upsampled grid (same cell grid).
    Parameter-compatible with unet_decoder.UpConv."""

    features: int
    in_features: int
    r_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r_in = self.r_out // 2
        k, b = _ConvParams((2, 2, self.in_features, self.features),
                           self.features, name="deconv")()
        w = s2d_upconv_matrix(k, self.r_out)
        y = jax.lax.dot_general(
            x, w.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype)
        return y + _tile_bias(b, self.r_out).astype(y.dtype)


class DoubleConvS2D(nn.Module):
    """Two (3x3 conv -> BN -> ReLU) at full res, executed on the cell grid
    with phase-expanded kernels and phase-grouped BN stats.
    Parameter-compatible with unet_decoder.DoubleConv."""

    features: int
    in_features: int
    r: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train=False):
        r2 = self.r * self.r
        cin = self.in_features
        for i in range(2):
            k, b = _ConvSameParams((3, 3, cin, self.features), self.features,
                                   name=f"conv{i}")()
            w = s2d_conv_kernel(k, self.r)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
            x = x + _tile_bias(b, self.r).astype(x.dtype)
            x = BatchNorm(momentum=BN_MOMENTUM_UNET, epsilon=BN_EPS_UNET,
                          axis_name=self.axis_name, phases=r2,
                          name=f"bn{i}")(x, train=train)
            x = nn.relu(x)
            cin = self.features
        return x


class HeadS2D(nn.Module):
    """1x1 full-res head conv on the s2d tensor (block-diagonal over phases),
    returning the full-res [B, H, W, features] map.
    Parameter-compatible with ConvSame(features, (1, 1))."""

    features: int
    in_features: int
    r: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r2 = self.r * self.r
        k, b = _ConvParams((1, 1, self.in_features, self.features),
                           self.features, name="Conv_0")()
        bq, hc, wc, _ = x.shape
        xr = x.reshape(bq, hc, wc, self.in_features, r2)
        y = jnp.einsum("bhwiq,io->bhwoq", xr.astype(self.dtype),
                       k[0, 0].astype(self.dtype))
        y = y + b.astype(y.dtype)[:, None]
        y = y.reshape(bq, hc, wc, self.features * r2)
        return depth_to_space(y, self.r)
