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


@lru_cache(maxsize=None)
def _phase_selector_strided(k: int, r_in: int, stride: int):
    """S[tap, out_phase, cell, in_phase] selector for a k-tap 1D conv of
    stride `stride` (TF SAME, input length divisible by stride) viewed on the
    r_in-cell grid, with the output in s2d(r_out = r_in // stride) on the
    SAME cell grid. Returns (S, lo, kc): input cell offsets span lo..lo+kc-1
    (negative lo = left cell padding)."""
    r_out = r_in // stride
    assert r_out * stride == r_in
    pad_lo = max(k - stride, 0) // 2
    ts = [p * stride + d - pad_lo for p in range(r_out) for d in range(k)]
    lo = min(t // r_in for t in ts)
    kc = max(t // r_in for t in ts) - lo + 1
    s = np.zeros((k, r_out, kc, r_in), np.float32)
    for p in range(r_out):
        for d in range(k):
            t = p * stride + d - pad_lo
            s[d, p, (t // r_in) - lo, t % r_in] = 1.0
    return s, lo, kc


def s2d_conv_kernel_strided(kernel: jnp.ndarray, r_in: int, stride: int):
    """[kh, kw, Cin, Cout] full-res TF-SAME conv kernel of stride `stride` ->
    ([kcy, kcx, Cin*r_in^2, Cout*r_out^2] cell kernel, cell padding spec).
    The cell conv runs stride 1 on the SAME cell grid; exact."""
    kh, kw, cin, cout = kernel.shape
    sy, loy, kcy = _phase_selector_strided(kh, r_in, stride)
    sx, lox, kcx = _phase_selector_strided(kw, r_in, stride)
    w = jnp.einsum("abio,apcq,bPdQ->cdiqQopP",
                   kernel, jnp.asarray(sy), jnp.asarray(sx))
    r_out = r_in // stride
    w = w.reshape(kcy, kcx, cin * r_in * r_in, cout * r_out * r_out)
    padding = ((-loy, kcy - 1 + loy), (-lox, kcx - 1 + lox))
    return w, padding


def s2d_depthwise_kernel(kernel: jnp.ndarray, r_in: int, stride: int):
    """Depthwise [kh, kw, 1, C] TF-SAME kernel of stride `stride` ->
    ([kcy, kcx, r_in^2, C*r_out^2] GROUPED cell kernel (feature_group_count
    C), cell padding). Phase-minor channel layout keeps each channel's r^2
    phase copies consecutive, which is exactly XLA's grouped-conv contract:
    group c consumes in-channels [c*r_in^2, (c+1)*r_in^2) and produces
    out-channels [c*r_out^2, (c+1)*r_out^2)."""
    kh, kw, _, C = kernel.shape
    sy, loy, kcy = _phase_selector_strided(kh, r_in, stride)
    sx, lox, kcx = _phase_selector_strided(kw, r_in, stride)
    w = jnp.einsum("abc,apeq,bPfQ->efqQcpP",
                   kernel[:, :, 0, :], jnp.asarray(sy), jnp.asarray(sx))
    r_out = r_in // stride
    w = w.reshape(kcy, kcx, r_in * r_in, C * r_out * r_out)
    padding = ((-loy, kcy - 1 + loy), (-lox, kcx - 1 + lox))
    return w, padding


def s2d_depthwise_shift(x: jnp.ndarray, kernel: jnp.ndarray, r: int,
                        stride: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """Depthwise k x k TF-SAME conv (stride | r) applied directly to an
    s2d(r) tensor as k^2 * r_out^2 shifted multiply-adds over (cell shift,
    phase) pairs — no depth_to_space/space_to_depth roundtrip and no grouped
    conv. [B, hc, wc, C*r^2] x [kh, kw, 1, C] -> [B, hc, wc, C*r_out^2]
    with r_out = r // stride (r_out == 1 exits to the standard dense layout
    on the cell grid — the natural transition-block form).

    Full-res output row (on the post-stride grid) r_out*i + py reached
    through tap d is input row r*i + t with t = stride*py + d - pad_lo, so
    each tap is a static slice [cell offset t//r, phase t%r] of the
    cell-padded tensor — XLA fuses the whole thing into one vectorized
    pass. pad_lo = max(k-stride,0)//2 is TF SAME (matches
    _phase_selector_strided; for stride 1 this is the usual (k-1)//2).
    Numerics match the conv (bf16 products accumulated in f32; products of
    bf16 are exact in f32), only the summation order differs. Measured vs
    the d2s/conv/s2d roundtrip at B3-stage-1 shapes: the expand->depthwise
    ->project chain drops 15.5 -> 8.4 ms fwd+bwd and 8.3 -> 2.6 ms fwd
    (tools/microbench_s2d.py --chain).

    MISCOMPILE GUARD (do not "simplify" this): the obvious single-tensor
    form — reshape to [b,hc,wc,c,r,r], pad the cell dims, and take the k^2
    taps as strided phase slices of the padded 6D tensor fused with the
    multiply-adds — is MISCOMPILED by the TPU backend for c < ~96 (95% of
    output elements wrong, f32 and bf16 alike; exact on CPU, exact at
    c = 144). Minimal trigger: flat->6D reshape + 2D cell pad + a
    boundary-crossing row slice + phase select + >= 3-term multiply-add
    chain, all in one fusion. Splitting the input into r^2 dense 4D phase
    planes behind jax.lax.optimization_barrier keeps that fusion from
    forming; the 4D pad/slice/mul/add pattern verifies exact (fwd AND grad)
    vs CPU across c in {8..144}, r in {2,4}, k in {3,5}, stride in {1,2}
    (tools/check_tpu_parity.py --shift-sweep)."""
    kh, kw, _, c = kernel.shape
    b, hc, wc, cr = x.shape
    r2 = r * r
    assert cr == c * r2
    r_out = r // stride
    assert r_out * stride == r
    py_lo, px_lo = max(kh - stride, 0) // 2, max(kw - stride, 0) // 2
    xr = x.reshape(b, hc, wc, c, r2)
    planes = jax.lax.optimization_barrier(
        tuple(xr[..., q] for q in range(r2)))

    def _bounds(k, p_lo):
        ts = [q * stride + d - p_lo for q in range(r_out) for d in range(k)]
        return min(t // r for t in ts), max(t // r for t in ts)

    cy_lo, cy_hi = _bounds(kh, py_lo)
    cx_lo, cx_hi = _bounds(kw, px_lo)
    padded = [jnp.pad(p, ((0, 0), (-cy_lo, cy_hi), (-cx_lo, cx_hi), (0, 0)))
              for p in planes]
    kd = kernel[:, :, 0, :].astype(dtype).astype(jnp.float32)
    phases = []
    for py in range(r_out):
        for px in range(r_out):
            acc = None
            for dy in range(kh):
                for dx in range(kw):
                    ty = stride * py + dy - py_lo
                    tx = stride * px + dx - px_lo
                    cy, sy = ty // r, ty % r
                    cx, sx = tx // r, tx % r
                    src = padded[sy * r + sx][:, cy - cy_lo:cy - cy_lo + hc,
                                              cx - cx_lo:cx - cx_lo + wc, :]
                    t = kd[dy, dx, :] * src.astype(jnp.float32)
                    acc = t if acc is None else acc + t
            phases.append(acc.astype(dtype))
    if r_out == 1:
        return phases[0]                       # dense [B, hc, wc, C]
    out = jnp.stack(phases, axis=-1)           # [B, hc, wc, C, r_out^2]
    return out.reshape(b, hc, wc, c * r_out * r_out)


def phase_pointwise(x: jnp.ndarray, kernel: jnp.ndarray, r: int,
                    bias: Optional[jnp.ndarray] = None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """1x1 full-res conv on an s2d(r) tensor: pure channel mixing per
    (cell, phase). [B,hc,wc,C*r^2] x [1,1,C,D] -> [B,hc,wc,D*r^2]."""
    b, hc, wc, cr = x.shape
    r2 = r * r
    c = cr // r2
    xr = x.reshape(b, hc, wc, c, r2)
    y = jnp.einsum("bhwcq,cd->bhwdq", xr.astype(dtype),
                   kernel[0, 0].astype(dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)[:, None]
    return y.reshape(b, hc, wc, -1)


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
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        return _ConvParams(self.kernel_shape, self.features,
                           use_bias=self.use_bias, name="Conv_0")()


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
    returning the full-res [B, H, W, features] map — or, with
    ``planar=True``, a tuple of per-channel [B, H, W] planes (each
    depth_to_space'd alone, so no <128-channel NHWC map ever materializes:
    those pad the TPU lane dim 32-128x; a [B, H, W] plane keeps W on the
    lanes). Parameter-compatible with ConvSame(features, (1, 1))."""

    features: int
    in_features: int
    r: int
    dtype: Any = jnp.float32
    planar: bool = False

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
        if self.planar:
            return tuple(
                depth_to_space(y[..., c * r2:(c + 1) * r2], self.r)[..., 0]
                for c in range(self.features))
        return depth_to_space(y, self.r)


# ---------------------------------------------------------------------------
# Early-backbone space-to-depth execution (stem + the /2 MBConv stage)
# ---------------------------------------------------------------------------
#
# EfficientNet's stem and first stage run at /2 resolution with 16-40
# channels — the backbone's bandwidth hotspot on TPU (lanes pad 3-8x, and
# every MBConv runs ~6 elementwise BN/swish/SE passes over the padded
# tensors). Executed on the /4 cell grid in s2d(2) layout the channel counts
# become 96-160 and, unlike the U-Net's dense 3x3 convs, the FLOP cost of
# the transform is negligible: 1x1 expand/project convs stay per-phase
# (phase_pointwise), the depthwise conv becomes a per-channel GROUPED cell
# conv (r^2 x the tiny depthwise FLOPs), and only the 3-channel stem conv
# pays the r^2 phase expansion. All transforms are exact; parameter trees
# match the standard modules (ref models/efficientnet/model.py:17-102).


class SqueezeExciteS2D(nn.Module):
    """SqueezeExcite on an s2d(r) tensor: the global average pools over
    cells AND the r^2 phase copies of each channel (= the full-res spatial
    mean, exactly); the tiny reduce/expand 1x1 convs run standard on
    [B, 1, 1, C]. Parameter-compatible with efficientnet.SqueezeExcite."""

    squeezed: int
    r: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from instance_segmentation_tpu.models.layers import ConvSame
        from instance_segmentation_tpu.models.layers import swish
        b, hc, wc, cr = x.shape
        r2 = self.r * self.r
        c = cr // r2
        s = jnp.mean(x.reshape(b, hc, wc, c, r2), axis=(1, 2, 4),
                     keepdims=False).reshape(b, 1, 1, c)
        s = ConvSame(self.squeezed, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = swish(s)
        s = ConvSame(c, (1, 1), dtype=self.dtype, name="expand")(s)
        sig = jnp.asarray(nn.sigmoid(s), x.dtype)
        return jnp.repeat(sig, r2, axis=-1) * x


class MBConvS2D(nn.Module):
    """MBConv evaluated on the cell grid in s2d(r_in) layout.

    stride 1: s2d(r_in) -> s2d(r_in); stride 2: s2d(r_in) -> s2d(r_in//2)
    on the SAME cell grid (r_in == stride returns the standard layout — the
    natural exit back to full-channel execution). Parameter-compatible with
    efficientnet.MBConv (expand_conv/bn0/depthwise_conv/bn1/se/project_conv/
    bn2; ref models/efficientnet/model.py:17-102)."""

    args: Any                      # efficientnet.BlockArgs
    r_in: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from instance_segmentation_tpu.models.layers import (
            BatchNorm, drop_connect, swish)
        a = self.args
        r = self.r_in
        r_out = r // a.stride
        inputs = x
        expanded = a.input_filters * a.expand_ratio
        if a.expand_ratio != 1:
            k, _ = _ConvSameParams((1, 1, a.input_filters, expanded), expanded,
                                   use_bias=False, name="expand_conv")()
            x = phase_pointwise(x, k, r, dtype=self.dtype)
            x = BatchNorm(axis_name=self.axis_name, phases=r * r,
                          name="bn0")(x, train=train)
            x = swish(x)
        kk = a.kernel_size
        kd, _ = _ConvSameParams((kk, kk, 1, expanded), expanded,
                                use_bias=False, name="depthwise_conv")()
        # The depthwise conv — the block's only spatial op. The grouped cell
        # conv (s2d_depthwise_kernel) is exact but its r^2-sized groups
        # lower catastrophically on TPU (94 ms fwd+bwd vs 10 for a full-res
        # d2s/conv/s2d roundtrip at B3-stage-2 shapes). Both strides run as
        # shifted multiply-adds directly on the s2d tensor — no d2s/s2d
        # roundtrip at all. Measured vs the roundtrip: stride-1 chain ~2x
        # (tools/microbench_s2d.py --chain), stride-2 transition 2.2 vs
        # 5.9 ms fwd / 2.9 vs 4.8 fwd+bwd (--stride2).
        x = s2d_depthwise_shift(x, kd, r, stride=a.stride, dtype=self.dtype)
        x = BatchNorm(axis_name=self.axis_name, phases=r_out * r_out,
                      name="bn1")(x, train=train)
        x = swish(x)
        if a.se_ratio and 0 < a.se_ratio <= 1:
            if r_out > 1:
                x = SqueezeExciteS2D(max(1, int(a.input_filters * a.se_ratio)),
                                     r=r_out, dtype=self.dtype, name="se")(x)
            else:
                from instance_segmentation_tpu.models.efficientnet import (
                    SqueezeExcite)
                x = SqueezeExcite(max(1, int(a.input_filters * a.se_ratio)),
                                  dtype=self.dtype, name="se")(x)
        kp, _ = _ConvSameParams((1, 1, expanded, a.output_filters),
                                a.output_filters, use_bias=False,
                                name="project_conv")()
        x = phase_pointwise(x, kp, r_out, dtype=self.dtype)
        x = BatchNorm(axis_name=self.axis_name, phases=r_out * r_out,
                      name="bn2")(x, train=train)
        if a.id_skip and a.stride == 1 and a.input_filters == a.output_filters:
            if train and self.drop_rate > 0.0:
                x = drop_connect(x, self.drop_rate, deterministic=False,
                                 rng=self.make_rng("dropout"))
            x = x + inputs
        return x


class StemS2D(nn.Module):
    """The stride-2 3x3 stem conv on the cell grid: s2d(r_in) of the image ->
    s2d(r_in//2) of the stem output, same cells. Parameter-compatible with
    ConvSame(stem_filters, (3,3), strides=(2,2), use_bias=False)."""

    features: int
    in_features: int = 3
    r_in: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, _ = _ConvParams((3, 3, self.in_features, self.features),
                           self.features, use_bias=False, name="Conv_0")()
        w, pad = s2d_conv_kernel_strided(k, self.r_in, 2)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
