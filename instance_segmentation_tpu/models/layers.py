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
from functools import partial
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


def pin_data_sharding(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain ``x`` to batch-only ("data"-axis) sharding when an ambient
    mesh with a "data" axis is active; identity otherwise (single-device jit
    traces see an empty abstract mesh).

    Why: the "spatial" (image-W) mesh axis exists for the FULL-RESOLUTION
    dense decoder, where W-sharding genuinely splits work. The tiny pyramid
    maps (P3..P7 down to 1-2 pixels per shard) gain nothing from it — and
    letting GSPMD keep them W-sharded is where the round-4 multichip
    equivalence gate caught composition-dependent WRONG GRADIENTS: every
    BiFPN primitive (sep-conv, BN, max-pool, upsample, fusion) is backward-
    exact under the spatial mesh in isolation and a single BiFPN cell is
    exact (rel ~1e-6), but two chained cells produce grad rel ~0.4 and the
    full model ~0.28 (XLA SPMD partitioner, CPU backend; jax 0.9.0). Pinning
    the pyramid path to data-only sharding removes the buggy partitioning
    AND is the right layout anyway (no halo churn on 4x8 maps)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty or "data" not in mesh.axis_names:
        return x
    from jax.sharding import PartitionSpec as P
    return jax.lax.with_sharding_constraint(x, P("data"))


@jax.custom_vjp
def _swish_cvjp(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) with a fused recompute-backward custom VJP.
    ISEG_SWISH_AUTODIFF=1 (trace-time) routes through plain XLA autodiff —
    used by tools/repro_spatial_bwd.py to strip first-party custom VJPs
    from the spatial-sharding divergence repro."""
    import os as _os
    if _os.environ.get("ISEG_SWISH_AUTODIFF"):
        return x * jax.nn.sigmoid(x)
    return _swish_cvjp(x)


def _swish_fwd(x):
    return x * jax.nn.sigmoid(x), x


def _swish_bwd(x, g):
    # one fused elementwise pass: recompute sigmoid instead of saving it
    # (the default silu VJP chains several saved-tensor reads; on TPU the
    # backward is HBM-bound, so a single residual + single pass wins)
    s = jax.nn.sigmoid(x)
    return (g * (s * (1.0 + x * (1.0 - s))).astype(g.dtype),)


_swish_cvjp.defvjp(_swish_fwd, _swish_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_train(x, scale, bias, eps, phases=1):
    """Train-mode BN core: y from batch stats, plus (mean, var) for the
    running-average update. Hand-written VJP: the autodiff backward lowers to
    ~6 HBM passes over the activation (plus layout copies); this one is two —
    a fused (Σg, Σg·x) reduce pass and a single elementwise dx pass.

    ``phases > 1`` (space-to-depth layout, models/s2d.py): the input carries
    C*phases channels in phase-minor order; stats/params are per real channel
    C, reducing the phase copies together — exactly the full-res BN."""
    y, mean, var, _ = _bn_train_math(x, scale, bias, eps, phases)
    return y, mean, var


def _group_phases(v, phases):
    """[C*phases] phase-minor per-lane stat -> [C] per-channel mean."""
    return v.reshape(-1, phases).mean(axis=1)


def _expand_phases(v, phases):
    return jnp.repeat(v, phases)


def _bn_train_math(x, scale, bias, eps, phases=1):
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
    mean2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=axes)
    if phases > 1:
        mean = _group_phases(mean, phases)
        mean2 = _group_phases(mean2, phases)
    var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
    r = jax.lax.rsqrt(var + eps)
    scale_eff = scale * r
    shift = bias - mean * scale_eff
    if phases > 1:
        scale_eff = _expand_phases(scale_eff, phases)
        shift = _expand_phases(shift, phases)
    y = x * scale_eff.astype(x.dtype) + shift.astype(x.dtype)
    return y, mean, var, r


def _bn_train_fwd(x, scale, bias, eps, phases):
    y, mean, var, r = _bn_train_math(x, scale, bias, eps, phases)
    return (y, mean, var), (x, scale, mean, r)


def _bn_train_bwd(eps, phases, res, cts):
    x, scale, mean, r = res
    gy, gmean, gvar = cts
    axes = tuple(range(x.ndim - 1))
    n = phases
    for d in x.shape[:-1]:
        n *= d
    inv_n = 1.0 / n

    # pass 1: fused pair of f32-accumulating reductions over (gy, gy*x).
    # The product must be taken in f32 (a bf16 multiply would round to 8
    # mantissa bits before accumulation); XLA still fuses this into one
    # bf16-read / f32-accumulate pass.
    sg = jnp.sum(gy, axis=axes, dtype=jnp.float32)
    sgx = jnp.sum(gy.astype(jnp.float32) * x.astype(jnp.float32), axis=axes)
    if phases > 1:
        sg = sg.reshape(-1, phases).sum(axis=1)
        sgx = sgx.reshape(-1, phases).sum(axis=1)

    sgc = sgx - mean * sg                       # Σ gy·(x-μ)
    dscale = r * sgc
    dbias = sg
    # dx = A·gy + C·x + D   (per-channel f32 coefficients, bf16 pass)
    a = scale * r
    c = -a * (r * r) * sgc * inv_n + 2.0 * inv_n * gvar
    d = -a * sg * inv_n + gmean * inv_n - c * mean
    if phases > 1:
        a = _expand_phases(a, phases)
        c = _expand_phases(c, phases)
        d = _expand_phases(d, phases)
    dx = (gy * a.astype(gy.dtype) + x * c.astype(x.dtype) + d.astype(x.dtype))
    return dx, dscale, dbias


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class _FastBN(nn.Module):
    """Batch norm with f32 stats but compute-dtype application.

    Mirrors flax ``nn.BatchNorm``'s variable layout exactly (params
    ``scale``/``bias``; batch_stats ``mean``/``var``, all f32) so checkpoints
    and the torch converter are unaffected — but the big-tensor math differs:

      * batch stats are reduced in ONE pass with f32 accumulation straight
        from the (bf16) input — no materialized f32 copy of the activation;
      * normalization is applied as a per-channel ``x * scale_eff + shift``
        in the INPUT dtype, so XLA fuses it (and the following swish/relu)
        into the producing conv's epilogue instead of a cast-f32 /
        normalize / cast-back round trip over HBM.

    Under a sharded batch axis (GSPMD jit) the f32 reductions are global, so
    this stays a synchronized BN; ``axis_name`` adds an explicit pmean for
    shard_map-style SPMD (ref utils/sync_batchnorm semantics).
    """

    momentum: float = BN_MOMENTUM_DET
    epsilon: float = BN_EPS_DET
    axis_name: Optional[str] = None
    phases: int = 1   # >1: space-to-depth layout, C*phases lanes share stats

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = x.shape[-1] // self.phases
        scale = self.param("scale", nn.initializers.ones_init(), (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (ch,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros_init(), None, (ch,), jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones_init(), None, (ch,), jnp.float32)

        if train and self.axis_name is None:
            # fused custom-VJP fast path (GSPMD: sharded-batch reductions are
            # global automatically, so this stays a synchronized BN).
            # ISEG_BN_AUTODIFF=1 routes through the plain math (XLA autodiff)
            # for A/B-measuring the custom backward's layout cost.
            import os as _os
            if _os.environ.get("ISEG_BN_AUTODIFF"):
                y, mean, var, _ = _bn_train_math(x, scale, bias,
                                                 float(self.epsilon),
                                                 self.phases)
            else:
                y, mean, var = _bn_train(x, scale, bias, float(self.epsilon),
                                         self.phases)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
            return y
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes, dtype=jnp.float32)
            mean2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=axes)
            if self.phases > 1:
                mean = _group_phases(mean, self.phases)
                mean2 = _group_phases(mean2, self.phases)
            mean, mean2 = jax.lax.pmean((mean, mean2), self.axis_name)
            var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        scale_eff = scale * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * scale_eff
        if self.phases > 1:
            scale_eff = _expand_phases(scale_eff, self.phases)
            shift = _expand_phases(shift, self.phases)
        return x * scale_eff.astype(x.dtype) + shift.astype(x.dtype)


class BatchNorm(nn.Module):
    """float32-stat batch norm with optional cross-replica axis.

    Stats are computed (accumulated) and stored in float32; normalization is
    applied in the activation dtype so bf16 tensors never round-trip through
    f32 HBM copies (see _FastBN). The submodule is pinned to the name
    ``BatchNorm_0`` for param-tree compatibility with flax ``nn.BatchNorm``.
    """

    momentum: float = BN_MOMENTUM_DET
    epsilon: float = BN_EPS_DET
    axis_name: Optional[str] = None
    phases: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return _FastBN(
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            phases=self.phases,
            name="BatchNorm_0",
        )(x, train=train)


class _Int8Conv(nn.Module):
    """int8 x int8 -> int32 conv with the EXACT param tree of ``nn.Conv``
    (f32 ``kernel``/``bias``, same names/shapes), so any float checkpoint
    loads unchanged and quantization is an apply-time transform.

    Weights: per-output-channel symmetric abs-max scales (folded by XLA —
    params are loop-invariant). Activations: dynamic per-tensor symmetric
    scale (one fused abs-max pass). The conv itself runs s8 x s8 -> s32 on
    the MXU — 2x the bf16 MACs/cycle on v5e — and dequantizes in the
    epilogue. Inference-only (no VJP needed; gated off when train=True).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    use_bias: bool
    dtype: Any
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,), jnp.float32)
                if self.use_bias else None)
        s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
        w_q = jnp.round(kernel / s_w).astype(jnp.int8)
        s_x = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q, w_q, window_strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


class ConvSame(nn.Module):
    """2D conv with TF-style SAME padding (or VALID), NHWC.

    ``quant=True`` routes dense (groups == 1) convs through the int8
    inference path (``_Int8Conv``); grouped/depthwise convs always stay in
    the compute dtype (they run on the VPU where int8 buys nothing). The
    child is pinned to ``Conv_0`` so the param tree is identical either way.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.quant and self.groups == 1:
            return _Int8Conv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                use_bias=self.use_bias,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                name="Conv_0",
            )(x)
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
            name="Conv_0",
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
