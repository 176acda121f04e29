"""The training objective, fully on-device.

Re-design of ref models/loss.py (DetFocalLoss :38-194, KPFocalLoss :205-213,
focal_loss :216-245, AELoss :248-317, TangentLoss :320-351, ComposeLoss
:354-384). The reference loops over batch items and instances in Python with
numpy<->GPU churn every step; here everything is vmapped/scanned static-shape
jit code consuming the padded `Targets` from ops/targets.py.

Loss names and weighting match the reference exactly:
    total = cls + wh(=box regression * 50) + kp + ae + tan
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from instance_segmentation_tpu.ops.compaction import extract_k_indices
from instance_segmentation_tpu.ops.targets import Targets, gaussian_window_target

_EPS = 1e-4


def _compacted_scatter_add(vals: jnp.ndarray, flat_idx: jnp.ndarray,
                           valid: jnp.ndarray, out_size: int, budget: int,
                           out_dtype, unit=None, planar: bool = False):
    """Scatter-add ``vals`` [B, S, C] (or counts when ``vals`` is None) at
    per-image flat indices [B, S] into a flat [out_size, C] buffer, routing
    the work through a COMPACTED [B, budget] slot list when every image's
    valid-sample count fits the budget (the typical case by ~10x).

    TPU scatter-adds serialize per element, so cost scales with the number
    of scattered slots — compacting the ~90%-padding point list first
    (matmul-scan extraction, no sort) shrinks it ~6x. A lax.cond falls back
    to the full scatter when the budget overflows: EXACT either way.
    ``flat_idx`` must already include any per-image base offset; invalid
    slots must carry an index >= out_size (the drop sentinel).
    """
    B, S = flat_idx.shape
    C = 0 if vals is None else vals.shape[-1]
    # planar=True scatters each of the C channels into its OWN flat
    # [out_size] buffer instead of one [out_size, C] buffer: a trailing dim
    # of C < 128 pads the TPU lane dim 128/C x, so the [out_size, 2] f32
    # scatter's zero-init + update passes cost 64x their logical bytes
    # (measured 11.8 vs 4.4 ms for 2x flat at b8, tools/microbench_scatter2).
    shape = (out_size,) if (vals is None or planar) else (out_size, C)
    zeros = jnp.zeros(shape, out_dtype)

    def _scatter(idx_flat, v):
        if vals is None:
            return zeros.at[idx_flat].add(unit, mode="drop")
        if planar:
            return tuple(zeros.at[idx_flat].add(
                v[..., c].reshape(-1).astype(out_dtype), mode="drop")
                for c in range(C))
        return zeros.at[idx_flat].add(
            v.reshape(-1, C).astype(out_dtype), mode="drop")

    def full(_):
        return _scatter(flat_idx.reshape(-1), vals)

    if budget <= 0 or budget >= S:
        return full(None)

    def compact(_):
        sel = extract_k_indices(valid, budget)                  # [B, budget]
        live = jnp.arange(budget)[None, :] < jnp.sum(
            valid, axis=1, dtype=jnp.int32)[:, None]
        idx = jnp.take_along_axis(flat_idx, sel, axis=1)
        idx = jnp.where(live, idx, out_size)                    # drop padding
        if vals is None:
            return _scatter(idx.reshape(-1), None)
        v = jnp.take_along_axis(vals, sel[..., None], axis=1)   # [B,budget,C]
        return _scatter(idx.reshape(-1), v)

    fits = jnp.max(jnp.sum(valid, axis=1, dtype=jnp.int32)) <= budget
    return jax.lax.cond(fits, compact, full, None)


@dataclass(frozen=True)
class LossConfig:
    alpha: float = 0.25           # det focal alpha (ref loss.py:43)
    gamma: float = 2.0            # det focal gamma (ref loss.py:44)
    pos_iou: float = 0.5          # anchor-positive threshold (ref :109)
    neg_iou: float = 0.4          # anchor-negative threshold (ref :107)
    reg_weight: float = 50.0      # regression scaling (ref :192-194)
    ae_weight: float = 1.0
    tan_weight: float = 1.0
    ae_window: Optional[Tuple[int, int]] = None
    # Fixed (rows, cols) crop per instance for the AE focal term. None (the
    # default) evaluates full-image per instance — bit-exact with the
    # reference's crop windows. A fixed window (e.g. (256, 512) at 512x1024)
    # cuts the dominant training-loss cost ~4x; instances whose reference
    # window (2x boundary bbox, ref loss.py:288) exceeds it lose the pixels
    # outside the crop — only the largest objects are affected.
    ae_impl: str = "auto"
    # "auto" | "dense" | "pallas" for the exact (ae_window=None) focal term.
    # auto resolves to the Pallas streaming kernel on a single-device TPU
    # backend when the shapes tile (losses/ae_pallas.py), else the XLA dense
    # formulation. Both compute the same per-element math; only the partial-
    # sum order differs.
    sample_budget: int = 16384
    # Per-image cap for the COMPACTED tangent summed-normal scatter. The
    # padded point list is [M, P] = ~98k slots at the default shapes but
    # typically <10% are valid; compacting valid samples first (matmul-scan
    # extraction, no sort) shrinks the serializing scatter-add ~6x (measured
    # 17.2 -> 7.1 ms at B3 batch 4). EXACT: when an image holds more valid
    # samples than the budget, a lax.cond falls back to the full scatter.
    # 0 disables compaction.


def coordinate_grid(h: int, w: int) -> jnp.ndarray:
    """The fixed global embedding coordinate frame, sliced to (h, w).

    Reference: utils/utils.py:453-458 builds a 1024x2048 grid with
    y = linspace(0, 1, 1024), x = linspace(0, 2, 2048) and callers slice
    [0:h, 0:w] — so grid values are i/1023 and 2*j/2047 regardless of the
    actual input size. Returns [h, w, 2] with channels (y, x).
    """
    if h > 1024 or w > 2048:
        raise ValueError(f"coordinate grid is fixed at 1024x2048 (got {h}x{w})")
    ys = jnp.arange(h, dtype=jnp.float32) / 1023.0
    xs = jnp.arange(w, dtype=jnp.float32) * (2.0 / 2047.0)
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    return jnp.stack([yy, xx], axis=-1)


# ---------------------------------------------------------------------------
# Detection focal + box regression (ref DetFocalLoss :38-194)
# ---------------------------------------------------------------------------

def _iou_anchors_gt(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """IoU between anchors [A,4] (y1,x1,y2,x2) and gt boxes [M,4] (x1,y1,x2,y2).

    Mirrors ref calc_iou (loss.py:21-35) including its mixed layouts.
    """
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])               # [M]
    iw = jnp.minimum(anchors[:, 3:4], gt[None, :, 2]) - jnp.maximum(anchors[:, 1:2], gt[None, :, 0])
    ih = jnp.minimum(anchors[:, 2:3], gt[None, :, 3]) - jnp.maximum(anchors[:, 0:1], gt[None, :, 1])
    iw = jnp.clip(iw, 0, None)
    ih = jnp.clip(ih, 0, None)
    area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    union = jnp.clip(area_a[:, None] + area_g[None, :] - iw * ih, 1e-8, None)
    return iw * ih / union                                                # [A, M]


def det_focal_loss(classification: jnp.ndarray, regression: jnp.ndarray,
                   anchors: jnp.ndarray, det_ann: jnp.ndarray,
                   cfg: LossConfig = LossConfig()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """classification [B,A,C], regression [B,A,4], anchors [A,4], det_ann [B,M,5]."""

    aw = anchors[:, 3] - anchors[:, 1]
    ah = anchors[:, 2] - anchors[:, 0]
    acx = anchors[:, 1] + 0.5 * aw
    acy = anchors[:, 0] + 0.5 * ah

    def per_image(cls_prob, reg, ann):
        gt_valid = ann[:, 4] >= 0                                         # [M]
        cls_prob = jnp.clip(cls_prob, _EPS, 1.0 - _EPS)                   # [A, C]

        iou = _iou_anchors_gt(anchors, ann[:, :4])                        # [A, M]
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        # materialize [A, M] once: without the barrier XLA recomputes the
        # whole IoU chain inside BOTH the max and argmax reduce fusions
        # (measured 2.8 ms of duplicated passes at B3 batch 4)
        iou = jax.lax.optimization_barrier(iou)
        iou_max = jnp.max(iou, axis=1)                                    # [A]
        iou_arg = jnp.argmax(iou, axis=1)                                 # [A]
        # row gather ann[iou_arg] serializes on TPU (~1.8 ms at these
        # shapes); a one-hot matmul at HIGHEST precision is exact (the f32
        # values split into three non-overlapping bf16 terms, each times an
        # exact 0/1, re-sums to the original f32) and runs on the MXU
        one_hot_m = (iou_arg[:, None]
                     == jnp.arange(ann.shape[0])[None, :]).astype(jnp.float32)
        assigned = jax.lax.dot_general(
            one_hot_m, ann, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)                          # [A, 5]

        pos = iou_max >= cfg.pos_iou
        neg = iou_max < cfg.neg_iou
        num_pos = jnp.sum(pos)

        # classification targets: -1 ignore, 0 negative, one-hot positive
        one_hot = jax.nn.one_hot(assigned[:, 4].astype(jnp.int32),
                                 cls_prob.shape[-1], dtype=jnp.float32)
        targets = jnp.where(pos[:, None], one_hot, 0.0)
        known = pos[:, None] | neg[:, None]                               # not ignored

        alpha_f = jnp.where(targets == 1.0, cfg.alpha, 1.0 - cfg.alpha)
        focal_w = jnp.where(targets == 1.0, 1.0 - cls_prob, cls_prob)
        focal_w = alpha_f * focal_w ** cfg.gamma
        bce = -(targets * jnp.log(cls_prob) + (1.0 - targets) * jnp.log(1.0 - cls_prob))
        cls_loss = jnp.sum(jnp.where(known, focal_w * bce, 0.0))
        cls_loss = cls_loss / jnp.clip(num_pos.astype(jnp.float32), 1.0, None)

        # box regression on positives (ref :137-169)
        gw = jnp.clip(assigned[:, 2] - assigned[:, 0], 1.0, None)
        gh = jnp.clip(assigned[:, 3] - assigned[:, 1], 1.0, None)
        gcx = assigned[:, 0] + 0.5 * (assigned[:, 2] - assigned[:, 0])
        gcy = assigned[:, 1] + 0.5 * (assigned[:, 3] - assigned[:, 1])
        t_dx = (gcx - acx) / aw
        t_dy = (gcy - acy) / ah
        t_dw = jnp.log(gw / aw)
        t_dh = jnp.log(gh / ah)
        t = jnp.stack([t_dy, t_dx, t_dh, t_dw], axis=1)                   # [A, 4]
        diff = jnp.abs(t - reg)
        smooth = jnp.where(diff <= 1.0 / 9.0, 0.5 * 9.0 * diff ** 2, diff - 0.5 / 9.0)
        reg_loss = jnp.sum(jnp.where(pos[:, None], smooth, 0.0))
        reg_loss = jnp.where(num_pos > 0,
                             reg_loss / jnp.clip(num_pos.astype(jnp.float32) * 4.0, 1.0, None),
                             0.0)
        return cls_loss, reg_loss

    cls_l, reg_l = jax.vmap(per_image)(classification, regression, det_ann)
    return jnp.mean(cls_l), jnp.mean(reg_l) * cfg.reg_weight


# ---------------------------------------------------------------------------
# CornerNet-style penalty-reduced focal (ref focal_loss :216-245)
# ---------------------------------------------------------------------------

def focal_heatmap_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                       window: jnp.ndarray | None = None) -> jnp.ndarray:
    """pred in (0,1), gt in [0,1] with 1 at keypoints. Optional window mask."""
    pred = jnp.clip(pred, _EPS, 1.0 - _EPS)
    pos = (gt == 1.0).astype(jnp.float32)
    neg = (gt < 1.0).astype(jnp.float32)
    if window is not None:
        pos = pos * window
        neg = neg * window
    neg_w = (1.0 - gt) ** 4
    pos_loss = jnp.sum(jnp.log(pred) * (1.0 - pred) ** 2 * pos)
    neg_loss = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * neg_w * neg)
    num_pos = jnp.sum(pos)
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.clip(num_pos, 1.0, None))


def _kp_plane(kp_logits: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,1] or planar [B,H,W] logits -> [B,H,W]."""
    return kp_logits if kp_logits.ndim == 3 else kp_logits[..., 0]


def kp_focal_loss(kp_logits: jnp.ndarray, kp_tgt: jnp.ndarray) -> jnp.ndarray:
    """kp_logits [B,H,W,1] (or planar [B,H,W]), kp_tgt [B,H,W]
    (ref KPFocalLoss :205-213).

    The reference computes one focal over the whole batch tensor (so num_pos
    is summed across the batch); we match that.
    """
    pred = jnp.clip(jax.nn.sigmoid(_kp_plane(kp_logits)), _EPS, 1.0 - _EPS)
    return focal_heatmap_loss(pred, kp_tgt)


def kp_focal_loss_from_cnt(kp_logits: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    """kp focal from the per-instance sample-count map (shared with the AE
    loss): the dense binary target is exactly ``any(cnt > 0)`` over
    instances, so the whole loss is one fused dense pass — no sort, no
    gather, and a dense elementwise backward. Identical value to
    kp_focal_loss on the rasterized mask / kp_focal_loss_from_points."""
    u = jnp.any(cnt > 0, axis=1).astype(jnp.float32)          # [B, H, W]
    return kp_focal_loss_from_union(kp_logits, u)


def kp_focal_loss_from_union(kp_logits: jnp.ndarray,
                             union: jnp.ndarray) -> jnp.ndarray:
    """kp focal from the precomputed 0/1 union map [B, H, W] (u8/f32) — the
    rasterizer kernel (losses/rasterize_pallas.py) emits it directly, saving
    the any-over-instances reduce over the 805 MB cnt map."""
    pred = jnp.clip(jax.nn.sigmoid(_kp_plane(kp_logits)), _EPS, 1.0 - _EPS)
    u = union.astype(jnp.float32)
    pos = jnp.sum(jnp.log(pred) * (1.0 - pred) ** 2 * u)
    neg = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * (1.0 - u))
    num_pos = jnp.sum(u)
    return jnp.where(num_pos == 0, -neg,
                     -(pos + neg) / jnp.clip(num_pos, 1.0, None))


def kp_focal_loss_from_points(kp_logits: jnp.ndarray, targets: Targets) -> jnp.ndarray:
    """Scatter-free kp focal: identical value to kp_focal_loss on the dense
    binary mask, computed from the boundary point list.

    The dense target is 1 exactly at the (deduplicated) sample pixels and 0
    elsewhere, so:
        loss = -(pos_at_points + neg_everywhere - neg_at_points) / n_unique
    One batched sort deduplicates the point pixels (points can repeat across
    edges/instances); no [H, W] scatter is ever materialized.
    """
    kp = _kp_plane(kp_logits)
    B, H, W = kp.shape
    HW = H * W
    pred = jnp.clip(jax.nn.sigmoid(kp), _EPS, 1.0 - _EPS)

    flat_pts = (targets.points[..., 0] * W + targets.points[..., 1]).reshape(B, -1)
    flat_pts = jnp.where(targets.pt_valid.reshape(B, -1), flat_pts, HW)   # sentinel
    flat_sorted = jnp.sort(flat_pts, axis=-1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, flat_sorted.dtype), flat_sorted[:, :-1]], axis=1)
    unique = (flat_sorted != prev) & (flat_sorted < HW)                   # [B, K]

    pv = jnp.take_along_axis(pred.reshape(B, HW),
                             jnp.clip(flat_sorted, 0, HW - 1), axis=1)
    uf = unique.astype(jnp.float32)
    pos_loss = jnp.sum(jnp.log(pv) * (1.0 - pv) ** 2 * uf)
    neg_corr = jnp.sum(jnp.log(1.0 - pv) * pv ** 2 * uf)
    neg_all = jnp.sum(jnp.log(1.0 - pred) * pred ** 2)
    num_pos = jnp.sum(uf)
    return jnp.where(num_pos == 0, -neg_all,
                     -(pos_loss + neg_all - neg_corr) / jnp.clip(num_pos, 1.0, None))


# ---------------------------------------------------------------------------
# Spatial-embedding (AE) loss (ref AELoss :248-317)
# ---------------------------------------------------------------------------

def _gauss_neg_tables():
    """f32 lookup values reproducing gaussian_window_target's rounding.

    The separable max-splat produces tgt = fl32(fl32(g_dy) * fl32(g_dx)) with
    g_d = exp(-d^2 / (2 sigma^2)), sigma = 7/6 (radius-3 CenterNet stamp, ref
    target_generator.py:274-278). Each attainable squared distance
    r2 = dy^2 + dx^2 (dy, dx in [-3, 3]) has a unique unordered {dy^2, dx^2}
    decomposition, so tgt is a function of r2 alone; the focal negative weight
    is (1 - tgt)^4, matching XLA's pow-by-squaring in f32.
    """
    import numpy as _np

    sigma = 7.0 / 6.0
    vals = {}
    for a in range(4):
        for b in range(4):
            ga = _np.float32(math.exp(-(a * a) / (2.0 * sigma * sigma)))
            gb = _np.float32(math.exp(-(b * b) / (2.0 * sigma * sigma)))
            vals[a * a + b * b] = _np.float32(ga * gb)
    neg4 = {}
    for r2, g in vals.items():
        t = _np.float32(1.0) - g
        t2 = _np.float32(t * t)
        neg4[r2] = float(_np.float32(t2 * t2))
    return neg4


_NEG4_TABLE = _gauss_neg_tables()        # {r2: (1 - tgt)^4}, r2 in 0..18
_R2_BIG = 200                            # "no point within radius 3" sentinel


def _shift_min_r2(imp: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Separable min-distance pass: imp bool [..., H, W] (True at point
    pixels) -> uint8 map of min dy^2+dx^2 to a point within the radius-`radius`
    max-norm window (the reference gaussian stamp support), else _R2_BIG.

    min distributes over the additive split r2 = dx^2 + dy^2, so a column
    pass then a row pass is exact. Out-of-image neighbours are BIG (the
    reference stamp clips at borders).
    """
    r2 = jnp.where(imp, jnp.uint8(0), jnp.uint8(_R2_BIG))
    *lead, H, W = r2.shape
    k = 2 * radius + 1
    # pad-with-BIG + stacked slices + one min-reduce per axis: a single
    # multi-input fusion per pass instead of a 6-deep chained-minimum
    # dependency (values saturate at BIG + 2*radius^2 = 218 < 255)
    p = jnp.pad(r2, [(0, 0)] * len(lead) + [(0, 0), (radius, radius)],
                constant_values=_R2_BIG)
    col = jnp.min(jnp.stack(
        [p[..., :, i:i + W] + jnp.uint8((i - radius) ** 2) for i in range(k)],
        axis=0), axis=0)
    p = jnp.pad(col, [(0, 0)] * len(lead) + [(radius, radius), (0, 0)],
                constant_values=_R2_BIG)
    return jnp.min(jnp.stack(
        [p[..., i:i + H, :] + jnp.uint8((i - radius) ** 2) for i in range(k)],
        axis=0), axis=0)


def ae_sample_count(targets: Targets, h: int, w: int,
                    sample_budget: int = 0) -> jnp.ndarray:
    """[B, M, H, W] u16 per-instance boundary-sample count map: one batched
    scatter-add (no gradient); u16 is exact (counts <= P). Shared by the AE
    focal/pull terms and the kp focal loss (whose dense binary target is
    exactly ``any(cnt > 0)`` over instances). sample_budget routes the
    scatter through the valid-sample compaction — measured SLOWER here
    (B3 b4: ae block 21.0 -> 24.5 ms): the scalar u16 unit scatter doesn't
    repay the extraction, unlike the tangent loss's [S, 2] f32 payload
    (17.2 -> 7.1 ms). Default 0 = full scatter."""
    B, M, P = targets.pt_valid.shape
    HW = h * w
    # The flat index space (plus the drop sentinel B*M*HW) must fit int32:
    # at 1024x2048 with M=96 this wraps for B >= 12, silently corrupting the
    # shared count map. Static shapes, so a plain Python assert at trace time.
    assert B * M * HW + 1 < 2**31, (
        f"ae_sample_count flat index space {B}*{M}*{HW} overflows int32; "
        "reduce batch/instances or shard the scatter per-(B,M) slab")
    kps = targets.points
    val = targets.pt_valid
    safe = jnp.clip(kps, 0, jnp.array([h - 1, w - 1]))
    flat = safe[..., 0] * w + safe[..., 1]                          # [B,M,P]
    bm = (jnp.arange(B * M, dtype=jnp.int32).reshape(B, M, 1) * HW)
    idx = jnp.where(val, flat + bm, B * M * HW)                     # OOB -> drop
    cnt = _compacted_scatter_add(
        None, idx.reshape(B, M * P), val.reshape(B, M * P), B * M * HW,
        sample_budget, jnp.uint16, unit=jnp.uint16(1))
    return cnt.reshape(B, M, h, w)


def _ae_instance_focal_dense(ae: jnp.ndarray, targets: Targets, xym: jnp.ndarray,
                             impl: str = "dense", cnt=None, r2=None):
    """Per-instance AE focal terms as ONE fused broadcast over [B, M, H, W].

    Numerically identical (same per-element ops) to evaluating the reference's
    per-instance full-image focal maps, but the gaussian target never
    materializes per instance: a single batched scatter marks point pixels,
    a separable uint8 min pass recovers each pixel's squared distance to the
    nearest same-instance point, and the focal negative weight (1-tgt)^4
    comes from a 12-entry select chain. Replaces the M per-instance scatters
    + 12 shift-max passes each (the profiled 151 ms/batch-4 hotspot).

    Returns i_loss [B, M] (already zero for invalid instances).

    ``ae`` is either the legacy [B, H, W, 4] map or a 4-tuple of PLANAR
    [B, H, W] planes (the model's planar_heads train layout): full-res maps
    with <128 trailing channels pad the TPU lane dim 32x, so every pass over
    the NHWC form costs ~2 GB of physical traffic at batch 8 — the planar
    planes keep W on the lanes (dense).
    """
    if isinstance(ae, (tuple, list)):
        a0, a1, a2, a3 = ae
        B, H, W = a0.shape
        e0 = jnp.tanh(a0) + xym[..., 0]                    # [B,H,W]
        e1 = jnp.tanh(a1) + xym[..., 1]
        s0 = jnp.exp(a2)
        s1 = jnp.exp(a3)
    else:
        B, H, W, _ = ae.shape
        e = jnp.tanh(ae[..., 0:2]) + xym                   # [B,H,W,2]
        s = jnp.exp(ae[..., 2:4])                          # [B,H,W,2]
        e0, e1, s0, s1 = e[..., 0], e[..., 1], s[..., 0], s[..., 1]
    M, P = targets.points.shape[1], targets.points.shape[2]
    HW = H * W

    centers_int = targets.centers.astype(jnp.int32)        # [B,M,2]
    ci = jnp.clip(centers_int[..., 0], 0, H - 1)
    cj = jnp.clip(centers_int[..., 1], 0, W - 1)
    c_emb = xym[ci, cj]                                    # [B,M,2] (ref :282,:296)

    kps = targets.points                                   # [B,M,P,2] int
    val = targets.pt_valid                                 # [B,M,P]
    big = jnp.int32(1 << 20)
    kmin = jnp.min(jnp.where(val[..., None], kps, big), axis=2)     # [B,M,2]
    kmax = jnp.max(jnp.where(val[..., None], kps, -big), axis=2)
    mask_size = (kmax - kmin) * 2                                   # (ref :288)
    lt = jnp.clip(centers_int - mask_size // 2, 0, 2048)            # (ref :289)
    rb = centers_int + mask_size // 2
    rb = jnp.stack([jnp.clip(rb[..., 0], 0, H), jnp.clip(rb[..., 1], 0, W)],
                   axis=-1)

    if cnt is None:
        cnt = ae_sample_count(targets, H, W)

    valid = targets.inst_valid

    if impl == "pallas":
        from instance_segmentation_tpu.losses import ae_pallas, minr2_pallas
        if r2 is not None:
            pass                 # rasterizer already produced it with cnt
        elif (minr2_pallas.supported(H, W)
                and not os.environ.get("ISEG_MINR2_XLA")
                and (minr2_pallas.INTERPRET
                     or jax.default_backend() == "tpu")):
            # slab-streaming kernel: every XLA lowering of the shifted-min
            # measured ~7 ms at b4 (tools/microbench_minr2.py); padding-slot
            # slabs (no valid points) skip compute entirely
            has_pts = jnp.any(targets.pt_valid, axis=2).astype(jnp.float32)
            r2 = minr2_pallas.minr2_from_cnt(cnt, has_pts)
        else:
            r2 = _shift_min_r2(cnt > 0)                             # [B,M,H,W] u8
        tab = ae_pallas._pack_table(c_emb, lt, rb, valid)
        anyp, cntp = ae_pallas._any_points_from_points(
            targets.points, targets.pt_valid, H, W)
        table = tuple(sorted(_NEG4_TABLE.items()))
        pos, neg, npos, pull = ae_pallas.ae_terms(
            e0, e1, s0, s1, r2, cnt, table, tab, anyp, cntp)
        i_loss = jnp.where(npos == 0, -neg,
                           -(pos + neg) / jnp.clip(npos, 1.0, None))
        return i_loss, pull * valid.astype(jnp.float32)

    if r2 is None:
        r2 = _shift_min_r2(cnt > 0)                                 # [B,M,H,W] u8

    def focal_terms(e0, e1, s0, s1):
        # fully fused [B,M,H,W] chain; checkpointed so backward recomputes.
        # Everything per-pixel is derived on the fly from the u8 distance map
        # and tiny per-instance vectors — no [B,M,H,W] f32/bool tensor is ever
        # materialized in HBM (neg_w4 select chain and window compare both
        # live inside the fusion).
        neg_w4 = jnp.float32(1.0)
        for r2v, t4 in sorted(_NEG4_TABLE.items()):
            neg_w4 = jnp.where(r2 == r2v, jnp.float32(t4), neg_w4)
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, M, H, W), 2)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, M, H, W), 3)
        window = ((rows >= lt[..., 0, None, None]) & (rows < rb[..., 0, None, None]) &
                  (cols >= lt[..., 1, None, None]) & (cols < rb[..., 1, None, None]) &
                  valid[..., None, None])
        dy = e0[:, None] - c_emb[..., 0][..., None, None]
        dx = e1[:, None] - c_emb[..., 1][..., None, None]
        pred = jnp.exp(-(dy * dy * s0[:, None] +
                         dx * dx * s1[:, None]))                    # [B,M,H,W]
        pred = jnp.clip(pred, _EPS, 1.0 - _EPS)
        wf = window.astype(jnp.float32)
        posm = (r2 == 0) & window          # r2==0 <=> point pixel (imp)
        neg = jnp.sum(jnp.log(1.0 - pred) * pred ** 2 * neg_w4 * wf,
                      axis=(2, 3))
        pos = jnp.sum(jnp.where(posm, jnp.log(pred) * (1.0 - pred) ** 2, 0.0),
                      axis=(2, 3))
        npos = jnp.sum(posm, axis=(2, 3)).astype(jnp.float32)
        return pos, neg, npos

    pos, neg, npos = jax.checkpoint(focal_terms)(e0, e1, s0, s1)
    i_loss = jnp.where(npos == 0, -neg,
                       -(pos + neg) / jnp.clip(npos, 1.0, None))
    return i_loss, None


def _pull_term_one(spatial_emb, sigma, center_emb, inst_valid, kps, val, idx):
    """Pull/seed term for ONE instance (ref loss.py:307-311): affinity of
    each boundary sample's embedding to every valid center; L1 between the
    own-center affinity and the best affinity, summed over valid samples.
    Shared by the dense pull term and the windowed AE path so the two
    lowerings cannot drift apart."""
    e_k = spatial_emb[kps[:, 0], kps[:, 1]]                         # [P,2]
    s_k = sigma[kps[:, 0], kps[:, 1]]                               # [P,2]
    d = jnp.exp(-jnp.sum((e_k[:, None, :] - center_emb[None, :, :]) ** 2
                         * s_k[:, None, :], axis=-1))               # [P,M]
    d = jnp.where(inst_valid[None, :], d, -jnp.inf)
    d_max = jnp.max(d, axis=1)                                      # [P]
    return jnp.sum(jnp.where(val, jnp.abs(d[:, idx] - d_max), 0.0))


def _ae_pull_term(ae: jnp.ndarray, targets: Targets, xym: jnp.ndarray):
    """Seed/var pull term (ref :307-311): per boundary pixel, L1 between the
    own-center affinity and the best affinity over all centers. Returns
    v_loss [B, M] (zero for invalid instances)."""
    B, H, W, _ = ae.shape

    def per_image(ae_i, centers, inst_valid, points, pt_valid):
        spatial_emb = jnp.tanh(ae_i[..., 0:2]) + xym
        sigma = jnp.exp(ae_i[..., 2:4])
        centers_int = centers.astype(jnp.int32)
        ci = jnp.clip(centers_int[:, 0], 0, H - 1)
        cj = jnp.clip(centers_int[:, 1], 0, W - 1)
        center_emb = xym[ci, cj]                                    # [M,2]

        def per_instance(idx):
            v = _pull_term_one(spatial_emb, sigma, center_emb,
                               inst_valid, points[idx], pt_valid[idx], idx)
            return v * inst_valid[idx].astype(jnp.float32)

        return jax.vmap(per_instance)(jnp.arange(points.shape[0]))

    return jax.vmap(per_image)(ae, targets.centers, targets.inst_valid,
                               targets.points, targets.pt_valid)


def ae_loss(ae: jnp.ndarray, targets: Targets, xym: jnp.ndarray,
            cfg: LossConfig = LossConfig(), cnt=None, r2=None) -> jnp.ndarray:
    """ae [B,H,W,4]; xym [H,W,2] from coordinate_grid.

    Default (ae_window=None): dense fused implementation — exact reference
    semantics, one broadcast pass over [B,M,H,W] instead of M per-instance
    target rasterizations. A fixed ae_window keeps the windowed per-instance
    path (approximate for instances whose reference window exceeds the crop).
    """
    planar = isinstance(ae, (tuple, list))
    if cfg.ae_window is None:
        impl = cfg.ae_impl
        if impl == "auto":
            impl = os.environ.get("ISEG_AE_IMPL", "auto")
        if impl == "auto":
            from instance_segmentation_tpu.losses import ae_pallas
            H_, W_ = ae[0].shape[1:3] if planar else ae.shape[1:3]
            impl = ("pallas"
                    if (jax.default_backend() == "tpu"
                        and ae_pallas.supported(H_, W_, targets.points.shape[1]))
                    else "dense")
        i_loss, v_loss = _ae_instance_focal_dense(ae, targets, xym, impl,
                                                  cnt, r2)
        if v_loss is None:                  # dense path: XLA pull term
            ae_nhwc = jnp.stack(ae, axis=-1) if planar else ae
            v_loss = _ae_pull_term(ae_nhwc, targets, xym)           # [B,M]
        n = jnp.sum(targets.inst_valid, axis=1).astype(jnp.float32)  # [B]
        per = jnp.where(n > 0,
                        (jnp.sum(i_loss, axis=1) + jnp.sum(v_loss, axis=1))
                        / jnp.clip(n, 1.0, None), 0.0)
        B = ae[0].shape[0] if planar else ae.shape[0]
        return cfg.ae_weight * jnp.sum(per) / B
    return _ae_loss_windowed(jnp.stack(ae, axis=-1) if planar else ae,
                             targets, xym, cfg)


def _ae_loss_windowed(ae: jnp.ndarray, targets: Targets, xym: jnp.ndarray,
                      cfg: LossConfig = LossConfig()) -> jnp.ndarray:
    """Per-instance crop-window AE loss (cfg.ae_window set)."""
    B, H, W, _ = ae.shape

    def per_image(ae_i, centers, inst_valid, points, pt_valid):
        spatial_emb = jnp.tanh(ae_i[..., 0:2]) + xym                     # [H,W,2]
        sigma = jnp.exp(ae_i[..., 2:4])                                   # [H,W,2]
        n = jnp.sum(inst_valid)

        centers_int = centers.astype(jnp.int32)                           # [M,2]
        ci = jnp.clip(centers_int[:, 0], 0, H - 1)
        cj = jnp.clip(centers_int[:, 1], 0, W - 1)
        center_emb = xym[ci, cj]                                          # [M,2] (ref :282,:296)

        def per_instance(idx):
            # vmapped over instances (a lax.scan here costs ~1.6 ms of pure
            # loop overhead per instance on TPU); invalid slots are zeroed.
            kps = points[idx]                                             # [P,2] int
            val = pt_valid[idx]                                           # [P]
            valid_f = inst_valid[idx].astype(jnp.float32)

            big = jnp.int32(1 << 20)
            kmin = jnp.min(jnp.where(val[:, None], kps, big), axis=0)
            kmax = jnp.max(jnp.where(val[:, None], kps, -big), axis=0)
            mask_size = (kmax - kmin) * 2                                 # (ref :288)
            lt = jnp.clip(centers_int[idx] - mask_size // 2, 0, 2048)     # (ref :289)
            rb = centers_int[idx] + mask_size // 2
            rb = jnp.stack([jnp.clip(rb[0], 0, H), jnp.clip(rb[1], 0, W)])
            c_emb = center_emb[idx]                                       # [2]

            # ae_loss dispatches ae_window=None to the dense path, so the
            # window extent is always set here
            wh_, ww_ = cfg.ae_window
            origin = jnp.clip(centers_int[idx] - jnp.array([wh_ // 2, ww_ // 2]),
                              0, jnp.array([H - wh_, W - ww_]))
            emb_w = jax.lax.dynamic_slice(
                spatial_emb, (origin[0], origin[1], 0), (wh_, ww_, 2))
            sig_w = jax.lax.dynamic_slice(
                sigma, (origin[0], origin[1], 0), (wh_, ww_, 2))

            rows = jnp.arange(wh_)[:, None] + origin[0]
            cols = jnp.arange(ww_)[None, :] + origin[1]
            window = ((rows >= lt[0]) & (rows < rb[0]) &
                      (cols >= lt[1]) & (cols < rb[1])).astype(jnp.float32)
            window = window * valid_f

            kps_rel = kps - origin
            val_in = val & ((kps_rel[:, 0] >= 0) & (kps_rel[:, 0] < wh_) &
                            (kps_rel[:, 1] >= 0) & (kps_rel[:, 1] < ww_))
            pred = jnp.exp(-jnp.sum((emb_w - c_emb) ** 2 * sig_w, axis=-1))
            tgt = gaussian_window_target(kps_rel, val_in, wh_, ww_)
            i_loss = focal_heatmap_loss(pred, tgt, window=window)

            v_loss = _pull_term_one(spatial_emb, sigma, center_emb,
                                    inst_valid, kps, val, idx)
            return i_loss * valid_f, v_loss * valid_f

        i_losses, v_losses = jax.vmap(per_instance)(jnp.arange(points.shape[0]))
        inst_l, var_l = jnp.sum(i_losses), jnp.sum(v_losses)
        return jnp.where(n > 0, (inst_l + var_l) / jnp.clip(n.astype(jnp.float32), 1.0, None), 0.0)

    per = jax.vmap(per_image)(ae, targets.centers, targets.inst_valid,
                              targets.points, targets.pt_valid)
    return cfg.ae_weight * jnp.sum(per) / B


# ---------------------------------------------------------------------------
# Tangent loss (ref TangentLoss :320-351)
# ---------------------------------------------------------------------------

def tangent_loss(tan: jnp.ndarray, targets: Targets,
                 cfg: LossConfig = LossConfig()) -> jnp.ndarray:
    """tan [B,H,W,2] or a planar (t0, t1) pair of [B,H,W] planes;
    1 - cos(pred, inward normal) at boundary samples.

    Dense formulation, exactly equal to the reference's per-sample mean
    (ref TangentLoss loss.py:320-351): cos is linear in the GT normal, so
        Σ_s (1 - cos_s) = n_valid - Σ_pix <t̂[pix], Σ_{s at pix} nrm_s>.
    The summed-normal map is scattered once from constants (no gradient flows
    through the scatter), and the differentiable part is a fused elementwise
    pass over the dense field — the per-sample gather (and its serializing
    scatter-add backward) disappears.

    The planar layout is the fast path: the NHWC [B,H,W,2] form pads the TPU
    lane dim 64x, so its normalize/dot chain measured 9.7 ms/iter and its
    [B*HW, 2] scatter 11.8 ms at batch 8; planar planes + per-channel flat
    scatters run the same math lane-dense.
    """
    planar = isinstance(tan, (tuple, list))
    if planar:
        t0, t1 = tan
        B, H, W = t0.shape
    else:
        B, H, W, _ = tan.shape
        t0, t1 = tan[..., 0], tan[..., 1]
    pts = targets.points.reshape(B, -1, 2)                                # [B,S,2]
    val = targets.pt_valid.reshape(B, -1)

    from instance_segmentation_tpu.losses import rasterize_pallas
    P = targets.points.shape[2]
    if (rasterize_pallas.supported(H, W, P)
            and cfg.ae_impl != "dense"
            and os.environ.get("ISEG_AE_IMPL", "") != "dense"
            and not os.environ.get("ISEG_RASTER_XLA")
            and (rasterize_pallas.INTERPRET
                 or jax.default_backend() == "tpu")):
        # MXU path: weighted one-hot matmuls from the packed point list —
        # replaces the compacted [B*HW] scatter pipeline (extract + gathers
        # + 2 scatter-adds under a lax.cond), which measured ~12.8 ms/iter
        # at batch 8 (cond.7 at 0.8% HBM peak, round-5 roofline).
        nmap0, nmap1 = rasterize_pallas.rasterize_nmap(
            targets.points, targets.pt_valid, targets.normals, H, W)
        nmap0 = jax.lax.stop_gradient(nmap0)
        nmap1 = jax.lax.stop_gradient(nmap1)
    else:
        nrm = targets.normals.reshape(B, -1, 2) * val[..., None]
        safe = jnp.clip(pts, 0, jnp.array([H - 1, W - 1]))
        flat = (safe[..., 0] * W + safe[..., 1]
                + (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None])    # [B,S]
        flat = jnp.where(val, flat, B * H * W)
        nmap0, nmap1 = _compacted_scatter_add(
            nrm, flat, val, B * H * W, cfg.sample_budget, jnp.float32,
            planar=True)
        nmap0 = jax.lax.stop_gradient(nmap0).reshape(B, H, W)
        nmap1 = jax.lax.stop_gradient(nmap1).reshape(B, H, W)

    # sqrt(max(n2, eps^2)) == clip(sqrt(n2), eps) in value, but its gradient
    # at n2 == 0 is 0 instead of 0 * inf = NaN. The dense form normalizes
    # EVERY pixel (the per-sample form only touched boundary pixels), so
    # underflowed-to-zero activations otherwise poison the whole backward —
    # observed as training NaN at ~step 1700 of the overfit demo.
    n2 = t0 * t0 + t1 * t1
    inv = 1.0 / jnp.sqrt(jnp.maximum(n2, _EPS * _EPS))
    dot = jnp.sum((t0 * nmap0 + t1 * nmap1) * inv, axis=(1, 2))           # [B]
    n_val = jnp.sum(val, axis=1).astype(jnp.float32)
    per = jnp.where(n_val > 0, (n_val - dot) / jnp.clip(n_val, 1.0, None), 0.0)
    return cfg.tan_weight * jnp.mean(per)


# ---------------------------------------------------------------------------
# Composition (ref ComposeLoss :354-384)
# ---------------------------------------------------------------------------

def compose_loss(outputs, targets: Targets, anchors: jnp.ndarray,
                 cfg: LossConfig = LossConfig()) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """outputs = (kp, ae, tan, regression, classification) from EfficientSeg."""
    kp, ae, tan, regression, classification = outputs
    H, W = kp.shape[1], kp.shape[2]
    xym = coordinate_grid(H, W)

    cls_l, reg_l = det_focal_loss(classification, regression, anchors,
                                  targets.det_ann, cfg)
    # the per-instance sample-count map is shared: kp's dense binary target
    # is its any-over-instances union, and the AE focal/pull terms consume
    # it directly (one scatter instead of three point-list lowerings). On
    # TPU the Pallas rasterizer produces cnt + min-r2 + union together from
    # the point list (one one-hot matmul per live slab) — the XLA scatter it
    # replaces was buffer-pass-bound at 9.7 ms/iter b8 and the reshape +
    # union reduce another 4 ms (losses/rasterize_pallas.py docstring).
    cnt = r2 = union = None
    if cfg.ae_window is None:
        from instance_segmentation_tpu.losses import rasterize_pallas
        # ae_impl == "dense" is also the "no Pallas anywhere" escape hatch:
        # tools/check_tpu_parity.py compiles the SAME loss for cpu AND tpu
        # backends in one process (jit(..., backend=...)), where a
        # default_backend() gate alone would route the cpu lowering into
        # pallas_call and fail
        if (rasterize_pallas.supported(H, W, targets.points.shape[2])
                and cfg.ae_impl != "dense"
                and os.environ.get("ISEG_AE_IMPL", "") != "dense"
                and not os.environ.get("ISEG_RASTER_XLA")
                and (rasterize_pallas.INTERPRET
                     or jax.default_backend() == "tpu")):
            cnt, r2, union = rasterize_pallas.rasterize_cnt_r2(
                targets.points, targets.pt_valid, H, W)
        else:
            cnt = ae_sample_count(targets, H, W)
    if targets.kp_tgt is not None:
        kp_l = kp_focal_loss(kp, targets.kp_tgt)
    elif union is not None:
        kp_l = kp_focal_loss_from_union(kp, union)
    elif cnt is not None:
        kp_l = kp_focal_loss_from_cnt(kp, cnt)
    else:
        kp_l = kp_focal_loss_from_points(kp, targets)
    ae_l = ae_loss(ae, targets, xym, cfg, cnt, r2)
    tan_l = tangent_loss(tan, targets, cfg)

    total = cls_l + reg_l + kp_l + ae_l + tan_l
    stats = {
        "cls_loss": cls_l, "wh_loss": reg_l, "kp_loss": kp_l,
        "ae_loss": ae_l, "tan_loss": tan_l, "total_loss": total,
    }
    return total, stats
