"""U-Net dense decoder producing the kp / ae / tan heads at input resolution.

Re-design of ref models/efficient.py:472-541 (`double_conv`, `up_conv`,
`EfficientDecoder`): starting from P5, four (transpose-conv 2x2/s2 ->
skip-concat -> two 3x3 conv+BN+ReLU) stages up through P4..P1, then an
optional input-level stage concatenating the raw image, then 1x1 heads:

    kp: 1 channel  (boundary-keypoint logits)
    ae: 4 channels (2 spatial-embedding offsets + 2 log-sigmas)
    tan: 2 channels (boundary tangent/normal field)

This is the most FLOP-dense part of the network (full-resolution dense
conv stack) and runs entirely in the compute dtype on the MXU.

Note the BN here uses torch-default constants (momentum 0.1/eps 1e-5,
ref :472-480), unlike the detector's 0.01/1e-3.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from instance_segmentation_tpu.models.layers import (
    BN_EPS_UNET, BN_MOMENTUM_UNET, BatchNorm, ConvSame,
)


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            x = ConvSame(self.features, (3, 3), dtype=self.dtype,
                         quant=self.quant and not train, name=f"conv{i}")(x)
            x = BatchNorm(momentum=BN_MOMENTUM_UNET, epsilon=BN_EPS_UNET,
                          axis_name=self.axis_name, name=f"bn{i}")(x, train=train)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """2x2 stride-2 transpose conv — exact 2x upsampling (ref up_conv :483-486)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, kernel_size=(2, 2), strides=(2, 2),
                                padding="VALID", dtype=self.dtype,
                                param_dtype=jnp.float32, name="deconv")(x)


class UNetDecoder(nn.Module):
    """U-Net over backbone snapshots [P1..P5] (+ raw input), with dense heads.

    ``s2d=True`` executes the two finest stages (the /2 stage and the
    full-res input stage + heads) on the /4 cell grid in space-to-depth
    layout with phase-transformed kernels (models/s2d.py) — exact same math
    and the exact same parameter tree, but every full-res tensor becomes a
    128-304-channel /4 tensor that tiles the TPU lanes instead of padding
    16-48 channels to 128 (the round-2 backward-bound 2.3%-MFU hotspot).
    ``s2d="train"`` applies it only when ``train=True``: the phase-expanded
    kernels cost r^2 x the conv FLOPs, a clear win for the layout-bound
    backward but a small net loss for the eval forward (measured B3 b4:
    fwd+bwd 185.5 -> 157.6 ms, eval fwd 29.0 -> 32.0 ms).
    """

    heads: Tuple[Tuple[str, int], ...] = (("kp", 1), ("ae", 4), ("tan", 2))
    concat_input: bool = True
    stage_channels: Tuple[int, ...] = (256, 128, 64, 32)
    input_stage_channels: int = 16
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    s2d: Any = False          # False | True | "train"
    quant: bool = False       # int8 dense 3x3 convs (heads stay float)
    planar: bool = False      # training fast path: emit each head CHANNEL as
                              # its own [B, H, W] f32 plane — kp [B,H,W],
                              # ae (a0,a1,a2,a3), tan (t0,t1) — instead of
                              # [B,H,W,C] maps. NHWC maps with 1-4 trailing
                              # channels pad the 128-wide TPU lane dim
                              # 32-128x, so every training-loss pass over
                              # them costs up to 64x its logical bytes
                              # (measured: the tangent normalize chain alone
                              # was 9.7 ms/iter at batch 8); the planes keep
                              # W on the lanes. Same math, same params.
    packed: bool = False      # inference fast path: return the heads PACKED
                              # in space-to-depth layout instead of full-res
                              # maps — (kp_full [B,H,W] f32,
                              # heads_s2d [B,H/4,W/4,7*16] f32, phase-minor
                              # channel c*16 + qy*4 + qx with head order
                              # kp, ae0..3, tan0, tan1). Full-res maps with
                              # 1-6 trailing channels pad the 128-wide TPU
                              # lane dim 8-128x; the packed layout keeps
                              # every materialized tensor lane-dense and the
                              # decode consumes it directly
                              # (ops/decode.decode_output_packed).

    @nn.compact
    def __call__(self, image: jnp.ndarray, blocks: List[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        if self.packed:
            if train or not self.concat_input:
                raise ValueError("packed head output is inference-only and "
                                 "requires concat_input")
            if image.shape[1] % 4 or image.shape[2] % 4:
                raise ValueError("packed head output needs H, W divisible by 4")
        want_s2d = (self.s2d is True or (self.s2d == "train" and train)
                    or self.packed)
        use_s2d = (want_s2d and self.concat_input
                   and image.shape[1] % 4 == 0 and image.shape[2] % 4 == 0)
        n_std = len(self.stage_channels) - (1 if use_s2d else 0)
        x = blocks[-1]
        for i, ch in enumerate(self.stage_channels[:n_std]):
            x = UpConv(ch, dtype=self.dtype, name=f"up{i + 1}")(x)
            skip = blocks[-(i + 2)]
            x = jnp.concatenate([x, skip], axis=-1)
            x = DoubleConv(ch, dtype=self.dtype, axis_name=self.axis_name,
                           quant=self.quant, name=f"double{i + 1}")(x, train=train)
        if not use_s2d:
            if self.concat_input:
                x = UpConv(self.input_stage_channels, dtype=self.dtype, name="up_input")(x)
                x = jnp.concatenate([x, image.astype(x.dtype)], axis=-1)
                x = DoubleConv(self.input_stage_channels, dtype=self.dtype,
                               axis_name=self.axis_name, quant=self.quant,
                               name="double_input")(x, train=train)
            outs = []
            for name, ch in self.heads:
                y = ConvSame(ch, (1, 1), dtype=self.dtype, name=f"head_{name}")(x)
                y = y.astype(jnp.float32)
                if self.planar and train:
                    outs.append(y[..., 0] if ch == 1
                                else tuple(y[..., c] for c in range(ch)))
                else:
                    outs.append(y)
            return tuple(outs)

        from instance_segmentation_tpu.models.s2d import (
            DoubleConvS2D, HeadS2D, UpConvS2D, _ConvSameParams, depth_to_space,
            space_to_depth,
        )
        # last regular stage (/2 resolution) on the /4 cell grid, r=2
        i = n_std
        ch = self.stage_channels[i]
        prev_ch = self.stage_channels[i - 1]
        skip_ch = blocks[0].shape[-1]
        x = UpConvS2D(ch, in_features=prev_ch, r_out=2, dtype=self.dtype,
                      name=f"up{i + 1}")(x)
        skip = space_to_depth(blocks[0].astype(x.dtype), 2)
        x = jnp.concatenate([x, skip], axis=-1)   # phase-minor == s2d(concat)
        x = DoubleConvS2D(ch, in_features=ch + skip_ch, r=2, dtype=self.dtype,
                          axis_name=self.axis_name,
                          name=f"double{i + 1}")(x, train=train)
        # input stage (full resolution) on the same /4 cell grid, r=4
        ic = self.input_stage_channels
        x = UpConvS2D(ic, in_features=ch, r_out=4, dtype=self.dtype,
                      name="up_input")(x)
        img = space_to_depth(image.astype(x.dtype), 4)
        x = jnp.concatenate([x, img], axis=-1)
        x = DoubleConvS2D(ic, in_features=ic + image.shape[-1], r=4,
                          dtype=self.dtype, axis_name=self.axis_name,
                          name="double_input")(x, train=train)
        if not self.packed:
            planar = self.planar and train
            outs = []
            for name, ch in self.heads:
                y = HeadS2D(ch, in_features=ic, r=4, dtype=self.dtype,
                            planar=planar, name=f"head_{name}")(x)
                if planar:
                    planes = tuple(p.astype(jnp.float32) for p in y)
                    outs.append(planes[0] if ch == 1 else planes)
                else:
                    outs.append(y.astype(jnp.float32))
            return tuple(outs)

        # packed inference path: ONE matmul over the concatenated head
        # kernels; outputs stay in the lane-dense s2d(4) layout (param tree
        # identical to the standard heads — head_X/Conv_0/{kernel,bias}).
        # The kernel is kron-expanded with I_16 so the contraction runs over
        # the FULL lane dim (ic*16): the per-phase einsum form contracts the
        # non-minor ic and forces two whole-tensor relayouts — measured 3.10
        # vs 1.59 ms batch 8 / 1.75 vs 1.61 batch 1 (identical numerics: the
        # extra kron terms are exact bf16 zeros).
        ks, bs = [], []
        for name, ch in self.heads:
            k, b = _ConvSameParams((1, 1, ic, ch), ch, name=f"head_{name}")()
            ks.append(k[0, 0])
            bs.append(b)
        kk = jnp.concatenate(ks, axis=-1)                  # [ic, 7]
        bias = jnp.concatenate(bs)                         # [7]
        r2 = 16
        kexp = jnp.einsum("io,pq->ipoq", kk, jnp.eye(r2, dtype=kk.dtype))
        kexp = kexp.reshape(ic * r2, kk.shape[-1] * r2)    # [ic*16, 7*16]
        y = jax.lax.dot_general(x.astype(self.dtype), kexp.astype(self.dtype),
                                (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        heads_s2d = y + jnp.repeat(bias, r2)
        kp_full = depth_to_space(heads_s2d[..., :r2], 4)[..., 0]
        return kp_full, heads_s2d
