"""EfficientSeg — the full single-stage instance-segmentation network.

Re-design of ref models/efficient.py:544-651: EfficientNet backbone ->
BiFPN (P3..P7) -> anchor box/class heads, plus the U-Net kp/ae/tan decoder
over [input, P1..P5].

Forward contract (matching ref :615-626):
    kp, ae, tan, regression, classification = model(images)
with
    kp:  (B, H, W, 1)  float32 logits
    ae:  (B, H, W, 4)  float32 (2 offsets + 2 log-sigmas)
    tan: (B, H, W, 2)  float32
    regression:     (B, A, 4)  (dy, dx, dh, dw)
    classification: (B, A, C)  sigmoid scores, float32

Anchors are *not* returned — they are a pure function of the (static) input
shape (models/anchors.py), computed at trace time by callers.

Input convention: NHWC uint8-or-float images; normalization (div 255,
mean/std — ref configs/trans_cfg.json "normalize") happens HERE on device so
the host pipeline ships uint8 and host->HBM traffic drops 4x.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from instance_segmentation_tpu.models.bifpn import BiFPN
from instance_segmentation_tpu.models.efficientnet import EfficientNetFeatures, feature_channels
from instance_segmentation_tpu.models.heads import Classifier, Regressor
from instance_segmentation_tpu.models.unet_decoder import UNetDecoder

# Per-compound-coefficient scaling tables (ref models/efficient.py:549-555).
BACKBONE_COEF = [0, 1, 2, 3, 4, 5, 6, 6, 7]
FPN_FILTERS = [64, 88, 112, 160, 224, 288, 384, 384, 384]
FPN_REPEATS = [3, 4, 5, 6, 7, 7, 8, 8, 8]
BOX_CLASS_REPEATS = [3, 3, 3, 4, 4, 4, 5, 5, 5]
PYRAMID_LEVELS = [5, 5, 5, 5, 5, 5, 5, 5, 6]
ANCHOR_SCALE = [4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 5.0, 4.0]
INPUT_SIZES = [512, 640, 768, 896, 1024, 1280, 1280, 1536, 1536]

DEFAULT_MEAN = (0.485, 0.456, 0.406)
DEFAULT_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class EfficientSegConfig:
    num_classes: int = 8
    compound_coef: int = 0
    scales: Tuple[float, ...] = (2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))
    ratios: Tuple[Tuple[float, float], ...] = ((1.0, 1.0), (1.4, 0.7), (0.7, 1.4))
    compute_dtype: Any = jnp.float32
    normalize_in_model: bool = True
    mean: Tuple[float, ...] = DEFAULT_MEAN
    std: Tuple[float, ...] = DEFAULT_STD
    axis_name: Optional[str] = None
    unet_s2d: Any = "train"  # run the U-Net's two finest stages in
                           # space-to-depth layout (models/s2d.py): exact
                           # same math + param tree, ~lane-exact /4 tensors
                           # instead of 16-48-channel full-res ones. Auto
                           # falls back when H or W is not divisible by 4.
                           # True: always; False: never; "train": only when
                           # train=True — measured (B3 b4 512x1024, TPU
                           # v5e): fwd+bwd 185.5 -> 157.6 ms with s2d, but
                           # eval forward 29.0 -> 32.0 ms (the r=4 phase-
                           # expanded kernels cost r^2 x FLOPs, a net loss
                           # where layout overhead wasn't dominant), so the
                           # default applies it where it wins.
    backbone_s2d: Any = "train"  # False | True | "train": run the backbone's
                           # stem + /2 MBConv stage on the /4 cell grid
                           # (models/s2d.py MBConvS2D) — exact, checkpoint-
                           # identical; the depthwise conv runs full-res
                           # between d2s/s2d (grouped cell convs lose 9x,
                           # tools/microbench_s2d.py). Measured fwd+bwd b4:
                           # backbone 71.5 -> 55.9 ms (TPU v5e).
    quant: str = "none"   # "none" | "int8": inference-only int8 dense convs
                          # (backbone expand/project 1x1s + U-Net 3x3s run
                          # s8 x s8 -> s32 on the MXU with per-channel weight
                          # and dynamic per-tensor activation scales; heads,
                          # SE, depthwise and BiFPN stay in compute_dtype).
                          # Same param tree — any float checkpoint loads.
    planar_heads: bool = True  # TRAIN-mode head layout: kp [B,H,W] f32,
                          # ae (a0,a1,a2,a3) and tan (t0,t1) tuples of
                          # [B,H,W] planes instead of [B,H,W,{1,4,2}] NHWC
                          # maps (which pad the TPU lane dim 32-128x — the
                          # loss chains over them measured ~20 ms/iter of
                          # pure layout traffic at batch 8). Same math and
                          # params; compose_loss accepts both layouts.
                          # Eval-mode outputs are unchanged.
    remat: bool = False   # rematerialize backbone blocks + U-Net stages
                          # (jax.checkpoint): trades ~30% step FLOPs for the
                          # activation memory of the full-res dense decoder —
                          # enables large-batch / full-res (1024x2048) training

    @property
    def num_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)

    @property
    def pyramid_levels(self) -> Tuple[int, ...]:
        return tuple(range(3, 3 + PYRAMID_LEVELS[self.compound_coef]))

    @property
    def anchor_scale(self) -> float:
        return ANCHOR_SCALE[self.compound_coef]


class EfficientSeg(nn.Module):
    cfg: EfficientSegConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 packed_heads: bool = False):
        """``packed_heads=True`` (inference only) returns
        ``(kp_full [B,H,W] f32, heads_s2d [B,H/4,W/4,7*16] f32, regression,
        classification)`` — the dense heads stay in the lane-dense
        space-to-depth layout end to end (see UNetDecoder.packed) and decode
        consumes them via ops/decode.decode_output_packed. Same parameters,
        same math; requires H, W divisible by 4."""
        c = self.cfg
        coef = c.compound_coef
        dtype = c.compute_dtype

        x = images.astype(jnp.float32)
        if c.normalize_in_model:
            mean = jnp.asarray(c.mean, jnp.float32) * 255.0
            std = jnp.asarray(c.std, jnp.float32) * 255.0
            x = (x - mean) / std
        x = x.astype(dtype)

        backbone_cls = EfficientNetFeatures
        decoder_cls = UNetDecoder
        if c.remat:
            backbone_cls = nn.remat(EfficientNetFeatures, static_argnums=(2,))
            decoder_cls = nn.remat(UNetDecoder, static_argnums=(3,))
        quant = (c.quant == "int8") and not train
        # the s2d execution modules run their dense convs as raw einsums and
        # take no quant flag; int8 inference takes precedence over an
        # explicit eval-time s2d request so quant configs measure what they
        # claim (the defaults only apply s2d in training, where quant is
        # off anyway)
        backbone_s2d = False if quant else c.backbone_s2d
        unet_s2d = False if quant else c.unet_s2d
        if packed_heads and not train and backbone_s2d == "train":
            # the packed inference path feeds the image to s2d consumers
            # only; running the stem on the cell grid too means the
            # lane-padded full-res 3-channel tensor never materializes
            backbone_s2d = "stem"
        backbone = backbone_cls(
            variant=BACKBONE_COEF[coef], dtype=dtype, axis_name=c.axis_name,
            s2d=backbone_s2d, quant=quant, name="backbone")
        blocks = backbone(x, train)                  # [P1..P5]

        fpn_ch = FPN_FILTERS[coef]
        feats = BiFPN(
            num_channels=fpn_ch,
            conv_channels=feature_channels(BACKBONE_COEF[coef])[2:5],
            repeats=FPN_REPEATS[coef],
            attention=coef < 6,
            use_p8=coef > 7,
            dtype=dtype, axis_name=c.axis_name, name="bifpn",
        )(blocks[2:5], train=train)

        regression = Regressor(
            channels=fpn_ch, num_anchors=c.num_anchors,
            num_layers=BOX_CLASS_REPEATS[coef],
            pyramid_levels=PYRAMID_LEVELS[coef],
            dtype=dtype, axis_name=c.axis_name, name="regressor",
        )(feats, train=train).astype(jnp.float32)

        classification = Classifier(
            channels=fpn_ch, num_anchors=c.num_anchors, num_classes=c.num_classes,
            num_layers=BOX_CLASS_REPEATS[coef],
            pyramid_levels=PYRAMID_LEVELS[coef],
            dtype=dtype, axis_name=c.axis_name, name="classifier",
        )(feats, train=train)

        outs = decoder_cls(
            dtype=dtype, axis_name=c.axis_name, s2d=unet_s2d, quant=quant,
            planar=c.planar_heads,
            packed=packed_heads and not train, name="kp_header",
        )(x, blocks, train)

        if packed_heads and not train:
            kp_full, heads_s2d = outs
            return kp_full, heads_s2d, regression, classification
        kp, ae, tan = outs
        return kp, ae, tan, regression, classification
