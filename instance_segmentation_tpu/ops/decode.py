"""Fully on-device decode: boxes -> NMS -> boundary peaks -> affinity grouping
-> polygon assembly. Fixed shapes end to end; one host transfer of packed
polygon buffers at the very end.

Re-design of ref utils/decode.py (decode_output :444-461, decode_boxes
:377-419, decode_single :422-441, group_kp :288-374, select_points :71-85,
aug_group :167-204, find_internal_point :51-68, cartesian2polar :88-128) and
utils/nms.py. The reference round-trips device<->host four times per image and
loops over objects in Python/cv2; here every stage is static-shape XLA.

Performance notes (profiled on TPU v5e):
  * top_k / argsort run at the TOP level on batched [B, N] arrays — a top_k
    under vmap lowers to a stable full sort (~50x slower than the native
    batched TopK path);
  * the 3x3 peak test is 8 shifted maxes (fusable elementwise) instead of a
    reduce-window, which picked a hostile layout;
  * NMS runs max_dets leader steps, not pre_nms sequential steps;
  * per-object member extraction is one global (object, row-major) sort plus
    per-object dynamic slices.

Output coordinate convention matches the reference: polygons/centers are
(x, y) at ORIGINAL image resolution (after the inverse of the val resize,
ref utils/tranform.py:157-171 detransform_pixel).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from instance_segmentation_tpu.losses.losses import coordinate_grid
from instance_segmentation_tpu.ops.compaction import (
    blocked_cumsum, extract_k_indices as _extract_k_indices)
from instance_segmentation_tpu.ops.geometry import point_in_polygon


@dataclass(frozen=True)
class DecodeConfig:
    """Static decode parameters (ref configs/decode_cfg.yaml)."""

    cls_th: float = 0.3
    iou_th: float = 0.2
    kp_th: int = 20000            # boundary peak budget (top-K)
    obj_pixel_th: int = 2
    wh_delta: float = 0.1
    pre_nms: int = 512            # boxes entering NMS
    max_dets: int = 96            # detections kept
    max_poly: int = 1024          # polygon vertex budget per object
    pair_candidates: int = 12     # points tried for the internal-point fallback
    exact_topk: bool = True       # exact batched top_k (reference tie
                                  # semantics); False uses approx_max_k
                                  # (recall 0.95 — lowers on TPU/axon and CPU;
                                  # measured 6.6 vs 31.0 ms standalone at B=8
                                  # k=20000, but detection membership may
                                  # differ near the threshold)
    group_mode: str = "affinity"  # "affinity": reference Gaussian-affinity
                                  # argmax (ref group_kp :326-328);
                                  # "kmeans": refine assignments with
                                  # fixed-iteration Lloyd clustering of the
                                  # keypoint embeddings seeded at the detected
                                  # centers (the reference ships this as an
                                  # unused alternative, utils/kmeans.py)
    kmeans_iters: int = 5


class Detections(NamedTuple):
    boxes: jnp.ndarray       # [B, D, 4] (x1,y1,x2,y2) input-res
    scores: jnp.ndarray      # [B, D]
    classes: jnp.ndarray     # [B, D] int32
    det_valid: jnp.ndarray   # [B, D] bool — survived score threshold + NMS
    polygons: jnp.ndarray    # [B, D, Q, 2] float32 (x, y) original-res
    poly_len: jnp.ndarray    # [B, D] int32
    centers: jnp.ndarray     # [B, D, 2] float32 (x, y) original-res
    obj_valid: jnp.ndarray   # [B, D] bool — has a valid polygon


# ---------------------------------------------------------------------------
# Box decode + fixed-size class-aware NMS (ref decode_boxes :377-419,
# BBoxTransform/ClipBoxes utils/utils.py:318-363, torchvision batched_nms)
# ---------------------------------------------------------------------------

def bbox_transform(anchors: jnp.ndarray, regression: jnp.ndarray,
                   h: int, w: int) -> jnp.ndarray:
    """anchors [A,4] (y1,x1,y2,x2) + deltas [...,A,4] (dy,dx,dh,dw)
    -> clipped boxes [...,A,4] (x1,y1,x2,y2)."""
    yca = (anchors[:, 0] + anchors[:, 2]) / 2
    xca = (anchors[:, 1] + anchors[:, 3]) / 2
    ha = anchors[:, 2] - anchors[:, 0]
    wa = anchors[:, 3] - anchors[:, 1]
    wb = jnp.exp(regression[..., 3]) * wa
    hb = jnp.exp(regression[..., 2]) * ha
    yc = regression[..., 0] * ha + yca
    xc = regression[..., 1] * wa + xca
    x1 = jnp.clip(xc - wb / 2, 0, None)
    y1 = jnp.clip(yc - hb / 2, 0, None)
    x2 = jnp.clip(xc + wb / 2, None, w - 1)
    y2 = jnp.clip(yc + hb / 2, None, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _iou_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [K,4] xyxy boxes -> [K,K]."""
    x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
    inter = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.clip(union, 1e-8, None)


def greedy_nms(boxes: jnp.ndarray, valid: jnp.ndarray, iou_th: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted [K,4] boxes; returns keep mask [K].

    Exact greedy semantics (torchvision nms, strict >) via K sequential
    steps. Used by tests as the semantics oracle; the fast path
    (`leader_nms`) runs only max_dets steps.
    """
    K = boxes.shape[0]
    iou = _iou_xyxy(boxes)
    rank = jnp.arange(K)

    def body(i, keep):
        sup = jnp.any((iou[i] > iou_th) & keep & (rank < i))
        return keep.at[i].set(valid[i] & ~sup)

    keep0 = jnp.zeros((K,), bool).at[0].set(valid[0])
    return jax.lax.fori_loop(1, K, body, keep0)


def leader_nms(boxes: jnp.ndarray, valid: jnp.ndarray, iou_th: float,
               max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning the first `max_out` kept indices directly.

    Identical result to `greedy_nms` truncated to max_out, computed as a
    FIXPOINT iteration instead of a sequential scan: iterate
        keep_i <- valid_i & not exists j < i: keep_j & iou_ij > th
    until unchanged. The greedy recurrence has a unique fixpoint (induction
    over rank), and each sweep pins at least one more rank prefix, so the
    loop terminates in <= K sweeps — in practice the depth of the longest
    suppression chain (2-6). A max_out-step lax.scan cost 7.9 ms at
    pre_nms=512 on v5e (~80 us loop overhead per tiny step); a handful of
    [K,K] sweeps is ~0.3 ms.

    Returns (indices [max_out] into boxes, keep_valid [max_out]).
    """
    K = boxes.shape[0]
    iou = _iou_xyxy(boxes)
    rank = jnp.arange(K)
    # sup[j, i]: keeping j suppresses i (strictly lower rank suppresses)
    sup = (iou > iou_th) & (rank[:, None] < rank[None, :])

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < K, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(keep[:, None] & sup, axis=0)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, ~valid, 0))

    order = jnp.argsort(jnp.where(keep, rank, K + rank))      # kept first, by rank
    idx = order[:max_out]
    ok = keep[idx]
    return jnp.where(ok, idx, -1), ok


def decode_boxes(classification: jnp.ndarray, regression: jnp.ndarray,
                 anchors: jnp.ndarray, h: int, w: int, cfg: DecodeConfig):
    """Batched box decode. Returns (boxes[B,D,4] xyxy, scores, classes, valid)."""
    scores = jnp.max(classification, axis=-1)                # [B, A]
    classes = jnp.argmax(classification, axis=-1)            # [B, A]
    boxes = bbox_transform(anchors, regression, h, w)        # [B, A, 4]
    masked = jnp.where(scores > cfg.cls_th, scores, -1.0)
    top_s, top_i = jax.lax.top_k(masked, cfg.pre_nms)        # batched fast path
    b_k = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    c_k = jnp.take_along_axis(classes, top_i, axis=1)
    valid_k = top_s > cfg.cls_th
    # class-aware NMS via coordinate offsetting (one NMS for all classes)
    off = (c_k.astype(jnp.float32) * (w + h) * 2.0)[..., None]
    shifted = b_k + off * jnp.array([1.0, 0.0, 1.0, 0.0])
    order, keep = jax.vmap(lambda b, v: leader_nms(b, v, cfg.iou_th, cfg.max_dets))(
        shifted, valid_k)
    order = jnp.clip(order, 0, cfg.pre_nms - 1)
    return (jnp.take_along_axis(b_k, order[..., None], axis=1),
            jnp.take_along_axis(top_s, order, axis=1),
            jnp.take_along_axis(c_k, order, axis=1),
            keep)


# ---------------------------------------------------------------------------
# Boundary-peak selection (ref select_points :71-85, nms_hm :42-48)
# ---------------------------------------------------------------------------

def _monotonic_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Bitcast f32 -> u32 with an order-preserving transform (desc on floats
    == desc on uints)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(u >> 31 == 1, ~u, u | jnp.uint32(0x80000000))


def exact_topk_indices(flat: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k WITHOUT sorting: [B, N] f32 -> (values [B,k], indices [B,k]).

    Binary-search the k-th value in uint32 bit space (18 cheap full
    reduces), build the exact-k mask (value ties broken by index order), and
    compact indices with matmul-scan counting
    (blocked_cumsum/_extract_k_indices — NO cumsum+searchsorted, which
    lowers to a 23.8 ms scalar-gather while loop on TPU at this size).

    Measured on v5e at [B, 512*1024], k=20000 (tools/microbench_topk.py):
    the bisect costs 1.7 ms at B=1 / 5.5 ms at B=8 — faster than
    lax.top_k (5.5 / 5.4) and 4-5x faster than a 3-pass 256-way partition
    variant (6.8 / 29.5) that was briefly shipped in round 3: the wide
    passes do T/log2-bracket times more compare-reduce WORK (N*T*3 vs
    N*18), and even at B=1 the VPU work dominates the 18 small-kernel
    dispatch latencies the partition form was built to avoid.

    Returned indices are in ascending index order (row-major for flattened
    images) — which matches the reference's member ordering
    (kp_mask.nonzero(), decode.py:312) even better than top_k's value order.
    """
    B, N = flat.shape
    k = min(k, N)
    u = _monotonic_u32(flat)                                   # [B, N]
    idx = _extract_k_indices(_exact_k_mask(u, k), k)
    vals = jnp.take_along_axis(flat, idx, axis=1)
    return vals, idx


def _bisect_band(u: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binary-search the k-th value band of [B, ...] monotonic-u32 values:
    returns per-row (lo, hi) with count(>lo) > k >= count(>hi). Counts are
    ORDER-FREE, so `u` may be any layout/flattening of the map (the packed
    path passes the lane-dense s2d tensor)."""
    B = u.shape[0]
    u2 = u.reshape(B, -1)

    def bisect(i, state):
        lo, hi = state                          # count(>lo) > k >= count(>hi)
        mid = lo + (hi - lo) // 2               # no uint32 overflow
        cnt = jnp.sum((u2 > mid[:, None]).astype(jnp.int32), axis=1)
        lo = jnp.where(cnt > k, mid, lo)
        hi = jnp.where(cnt > k, hi, mid)
        return lo, hi

    lo0 = jnp.zeros((B,), jnp.uint32)
    hi0 = jnp.full((B,), jnp.uint32(0xFFFFFFFF))
    # invariant needs count(>hi0)<=k; true since count(>max)=0. lo0: if
    # count(>0)<=k the loop converges to hi=small anyway; use lo=0 which in
    # monotonic space is below all finite floats.
    # 18 iterations narrow the threshold to 14 low mantissa bits (~2^-9
    # relative precision); elements inside the residual value band are taken
    # in index order instead of value order — indistinguishable for logits,
    # and the exact-k count is preserved.
    return jax.lax.fori_loop(0, 18, bisect, (lo0, hi0))


def _exact_k_mask(u: jnp.ndarray, k: int,
                  bounds: Tuple[jnp.ndarray, jnp.ndarray] = None) -> jnp.ndarray:
    """[B, N] monotonic-u32 values -> boolean mask selecting exactly k per
    row (the top k by value, ties broken by index order)."""
    lo, hi = bounds if bounds is not None else _bisect_band(u, k)
    gt = u > hi[:, None]                                        # count <= k
    band = (u > lo[:, None]) & ~gt                              # count(gt|band) > k
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
    tie_rank = blocked_cumsum(band.astype(jnp.float32))
    return gt | (band & (tie_rank <= (k - n_gt)))               # exactly k per row


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a [..., H, W] map, zero-filling (zero = masked-out, matching the
    zero-padded masked map of ref select_points :84)."""
    y = jnp.roll(x, (dy, dx), axis=(-2, -1))
    if dy > 0:
        y = y.at[..., :dy, :].set(0.0)
    elif dy < 0:
        y = y.at[..., dy:, :].set(0.0)
    if dx > 0:
        y = y.at[..., :, :dx].set(0.0)
    elif dx < 0:
        y = y.at[..., :, dx:].set(0.0)
    return y


def select_peaks_batch(hm: jnp.ndarray, k: int,
                       exact: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched top-k + 3x3 peak test on [B, H, W] heatmaps.

    Returns (flat indices [B, k] int32, valid [B, k] bool). Matches the
    reference's quirk of running the 3x3 max test on the top-k-masked map
    (select_points :79-85): a selected pixel survives only if it is the max
    of its 3x3 neighbourhood in the masked map (masked-out neighbours count
    as 0). The index mask is realized as a dense threshold at the k-th value
    (identical up to exact float ties).
    """
    B, H, W = hm.shape
    k = min(k, H * W)
    flat = hm.reshape(B, -1)
    if exact:
        top_v, top_i = exact_topk_indices(flat, k)
    else:
        top_v, top_i = jax.lax.approx_max_k(flat, k, recall_target=0.95)
    top_i = top_i.astype(jnp.int32)
    thresh = jnp.min(top_v, axis=1)
    masked = jnp.where(hm >= thresh[:, None, None], hm, 0.0)
    hmax = masked
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            hmax = jnp.maximum(hmax, _shift2d(masked, dy, dx))
    peak = jnp.take_along_axis(hmax.reshape(B, -1), top_i, axis=1) == top_v
    return top_i, peak


def select_peaks(hm: jnp.ndarray, k: int,
                 exact: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-image wrapper over select_peaks_batch."""
    idx, ok = select_peaks_batch(hm[None], k, exact=exact)
    return idx[0], ok[0]


def _s2d_shift(x4: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Full-res shift (out[r,c] = in[r-dy, c-dx], zero fill) of an s2d(4)
    map given as [B, hc, wc, 4, 4] (phase dims qy, qx). |dy|, |dx| < 4."""
    if dy:
        pad = jnp.zeros_like(x4[:, :1])
        if dy > 0:
            carry = jnp.concatenate([pad, x4[:, :-1]], axis=1)   # cell above
            x4 = jnp.concatenate(
                [carry[..., 4 - dy:, :], x4[..., :4 - dy, :]], axis=3)
        else:
            carry = jnp.concatenate([x4[:, 1:], pad], axis=1)    # cell below
            x4 = jnp.concatenate(
                [x4[..., -dy:, :], carry[..., :-dy, :]], axis=3)
    if dx:
        pad = jnp.zeros_like(x4[:, :, :1])
        if dx > 0:
            carry = jnp.concatenate([pad, x4[:, :, :-1]], axis=2)
            x4 = jnp.concatenate(
                [carry[..., 4 - dx:], x4[..., :4 - dx]], axis=4)
        else:
            carry = jnp.concatenate([x4[:, :, 1:], pad], axis=2)
            x4 = jnp.concatenate(
                [x4[..., -dx:], carry[..., :-dx]], axis=4)
    return x4


def _gather_phase_rows(cells: jnp.ndarray, cell_idx: jnp.ndarray,
                       onehot: jnp.ndarray) -> jnp.ndarray:
    """cells [B, ncells, C, 16], cell_idx [B, K], onehot [B, K, 16] ->
    [B, K, C]: one VECTORIZED contiguous-row gather plus a one-hot phase
    reduction (per-element lane gathers run at scalar rate on TPU)."""
    B, _, C, r2 = cells.shape
    rows = jnp.take_along_axis(cells.reshape(B, -1, C * r2),
                               cell_idx[..., None], axis=1)
    return jnp.einsum("bkcq,bkq->bkc", rows.reshape(B, -1, C, r2), onehot)


def _select_peaks_s2d(kp_full: jnp.ndarray, kp_s2d: jnp.ndarray, k: int,
                      extra_cells: jnp.ndarray = None):
    """select_peaks_batch on the packed layout: identical row-major top-k
    semantics (the exact-k mask runs on the full-res flat map), but all
    VALUE work — the thresholded masked map, the 8 shifted maxes, and the
    value/peak lookups — runs on the lane-dense s2d(4) tensor
    [B, H/4, W/4, 16]. Per-pixel values are exactly those of the full-res
    formulation. Returns (flat indices [B,k], peak-valid [B,k], extra_vals):
    `extra_cells` [B, ncells, C, 16] rides along in the SAME row gather as
    the peak test (one gather pass instead of two) and comes back as
    [B, k, C] values at the selected pixels."""
    B, H, W = kp_full.shape
    k = min(k, H * W)
    wc = W // 4
    # the bisect's 18 count-reduces are order-free: run them on the
    # lane-dense s2d tensor; only the tie-ordered mask/extraction read the
    # row-major full-res map
    bounds = _bisect_band(_monotonic_u32(kp_s2d), k)
    u = _monotonic_u32(kp_full.reshape(B, -1))
    top_i = _extract_k_indices(_exact_k_mask(u, k, bounds), k)

    rr = top_i // W
    cc = top_i % W
    cell_idx = (rr // 4) * wc + (cc // 4)
    q = (rr % 4) * 4 + (cc % 4)
    onehot = jax.nn.one_hot(q, 16, dtype=kp_s2d.dtype)
    cells = kp_s2d.reshape(B, -1, 1, 16)
    top_v = _gather_phase_rows(cells, cell_idx, onehot)[..., 0]

    thresh = jnp.min(top_v, axis=1)
    x4 = kp_s2d.reshape(B, H // 4, wc, 4, 4)
    masked = jnp.where(x4 >= thresh[:, None, None, None, None], x4, 0.0)
    hmax = masked
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            hmax = jnp.maximum(hmax, _s2d_shift(masked, dy, dx))
    gather_cells = hmax.reshape(B, -1, 1, 16)
    if extra_cells is not None:
        gather_cells = jnp.concatenate([gather_cells, extra_cells], axis=2)
    got = _gather_phase_rows(gather_cells, cell_idx, onehot)
    extra_vals = got[..., 1:] if extra_cells is not None else None
    return top_i, got[..., 0] == top_v, extra_vals


# ---------------------------------------------------------------------------
# Affinity grouping + polygon assembly (ref group_kp :288-374, aug_group)
# ---------------------------------------------------------------------------

def _polar_angle(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Angle in [0, 2pi) (ref cartesian2polar :88-113 via atan2 equivalence)."""
    return jnp.mod(jnp.arctan2(dy, dx), 2.0 * jnp.pi)


def _find_internal_point(pts: jnp.ndarray, n: jnp.ndarray, default: jnp.ndarray,
                         n_pairs: int) -> jnp.ndarray:
    """Internal point for the polar sort (ref find_internal_point :51-68).

    Try the box center, then the member mean, then midpoints of `n_pairs`
    member points spread evenly over the member list (the reference tries
    all O(n^2) pairs on host; we bound the fallback, which in practice only
    triggers on degenerate shapes — spreading the candidates over the whole
    perimeter keeps concave shapes covered where a prefix would be colinear).
    `pts` is [Q,2] (x,y) with slots >= n replicated.
    """
    def inside(p):
        return point_in_polygon(p, pts)

    mean = jnp.sum(jnp.where(jnp.arange(pts.shape[0])[:, None] < n, pts, 0.0), axis=0) \
        / jnp.clip(n.astype(jnp.float32), 1.0, None)

    span = jnp.clip(n.astype(jnp.float32) - 1.0, 0.0, None)
    cand_idx = jnp.round(
        jnp.linspace(0.0, 1.0, n_pairs) * span).astype(jnp.int32)
    cand = jnp.take(pts, cand_idx, axis=0)                     # [P0, 2]
    mids = (cand[:, None, :] + cand[None, :, :]) / 2.0         # [P0, P0, 2]
    mids = mids.reshape(-1, 2)
    ok = jax.vmap(inside)(mids)
    first = jnp.argmax(ok)                                     # first inside midpoint
    pair_pt = jnp.where(jnp.any(ok), mids[first], default)

    return jnp.where(inside(default), default,
                     jnp.where(inside(mean), mean, pair_pt))


def assemble_objects(kp_rc: jnp.ndarray, kp_valid: jnp.ndarray,
                     assign: jnp.ndarray,
                     boxes: jnp.ndarray, det_valid: jnp.ndarray,
                     in_h: int, in_w: int, orig_h: int, orig_w: int,
                     scale_int: float, cfg: DecodeConfig):
    """Batched object assembly.

    kp_rc [B,K,2] float (row,col) input-res; assign [B,K] -> detection index;
    boxes [B,D,4] xyxy input-res. Returns (polygons [B,D,Q,2] (x,y) orig-res,
    poly_len [B,D], centers [B,D,2], obj_valid [B,D]).

    TPU shape: one global (object, row-major) sort per image (batched sort at
    top level) + per-object dynamic slices; the Q-sized polar sorts run as a
    single batched [B*D, Q] argsort.
    """
    B, K, _ = kp_rc.shape
    D = boxes.shape[1]
    Q = cfg.max_poly

    # detransform to original resolution (ref tranform.py:157-171: corner-to-
    # corner affine, no offset) — (x, y) order from here on.
    tw = int(round(orig_w / scale_int))
    th = int(round(orig_h / scale_int))
    sx = (orig_w - 1) / (tw - 1)
    sy = (orig_h - 1) / (th - 1)
    kp_xy = jnp.stack([jnp.clip(kp_rc[..., 1] * sx, 0, orig_w - 1),
                       jnp.clip(kp_rc[..., 0] * sy, 0, orig_h - 1)], axis=-1)  # [B,K,2]

    centers = jnp.stack(
        [jnp.clip((boxes[..., 0] + boxes[..., 2]) / 2 * sx, 0, orig_w - 1),
         jnp.clip((boxes[..., 1] + boxes[..., 3]) / 2 * sy, 0, orig_h - 1)],
        axis=-1)                                                  # [B,D,2] (x,y)
    # ghost-filter box size uses the integer scale (ref compute_scale :34-35)
    wh = jnp.stack([(boxes[..., 2] - boxes[..., 0]) * scale_int,
                    (boxes[..., 3] - boxes[..., 1]) * scale_int], axis=-1)  # [B,D,2]

    # ghost filter (ref group_kp :351-355) without per-key gathers (random
    # element gathers run at ~8 ns/element on v5e): each kp has exactly one
    # assignment, so test against ALL objects and select with (d == assign) —
    # one fused [B,K,D] compare-reduce.
    half = (0.5 + cfg.wh_delta) * wh                                  # [B,D,2]
    d_iota = jnp.arange(D, dtype=assign.dtype)
    cx, cy = centers[..., 0][:, None, :], centers[..., 1][:, None, :]
    hx, hy = half[..., 0][:, None, :], half[..., 1][:, None, :]
    in_own = ((assign[..., None] == d_iota) & det_valid[:, None, :] &
              (kp_xy[..., 0:1] > cx - hx) & (kp_xy[..., 0:1] < cx + hx) &
              (kp_xy[..., 1:2] > cy - hy) & (kp_xy[..., 1:2] < cy + hy))
    sel = kp_valid & jnp.any(in_own, axis=-1)                         # [B,K]

    # single global sort per image: members of object d form a contiguous run
    # in row-major order (reference member ordering, kp_mask.nonzero() :312).
    # Multi-operand lax.sort carries the coordinates through the sorting
    # network — argsort + take_along_axis pays a 786k-element gather.
    SHIFT = in_h * in_w                   # static: rm_key < SHIFT, keys unique
    assert (D + 1) * SHIFT < 2 ** 31, (
        f"sort keys overflow int32: {D + 1} objects x {SHIFT} pixels")
    rm_key = kp_rc[..., 0].astype(jnp.int32) * in_w + kp_rc[..., 1].astype(jnp.int32)
    obj = jnp.where(sel, assign.astype(jnp.int32), D)                 # [B,K]
    key = obj * SHIFT + rm_key                                        # unique keys
    _, xs, ys = jax.lax.sort((key, kp_xy[..., 0], kp_xy[..., 1]),
                             dimension=-1, num_keys=1)
    # per-object starts/counts by direct counting (a vmapped searchsorted
    # over the sorted keys lowers to a scalar-gather while loop on TPU —
    # 23.8 ms at this size; one [B,D,K] compare-sum fuses to ~nothing)
    counts = jnp.sum(
        (obj[:, None, :] == jnp.arange(D, dtype=jnp.int32)[None, :, None])
        .astype(jnp.int32), axis=-1)                                  # [B,D]
    starts = jnp.cumsum(counts, axis=1) - counts                      # [B,D]
    n = jnp.minimum(counts, Q)                                        # [B,D]

    # member extraction out[b,d,q] = sorted[b, starts[b,d]+q]: contiguous-run
    # windows, NOT random gathers. Fetch each object's aligned 128-block rows
    # (row gathers are vector-rate), then apply the in-block offset with 7
    # binary sub-shifts (pure selects). A flat take_along_axis here cost
    # 12.4 ms; this is ~0.4 ms.
    BLK = 128
    Kp = ((K + BLK - 1) // BLK) * BLK
    xs = jnp.pad(xs, ((0, 0), (0, Kp - K)))
    ys = jnp.pad(ys, ((0, 0), (0, Kp - K)))
    nbk = Kp // BLK
    # a run starting at fine <= BLK-1 needs fine + Q slots: ceil((Q+BLK-1)/BLK)
    # blocks (Q // BLK + 1 only coincides when Q % BLK <= 1, e.g. default 1024)
    nwin = (Q + 2 * BLK - 2) // BLK
    coarse, fine = starts // BLK, starts % BLK
    blk_idx = jnp.clip(coarse[..., None] + jnp.arange(nwin), 0, nbk - 1)
    blk_idx = blk_idx.reshape(B, D * nwin)[..., None]                 # [B,D*nwin,1]
    win_x = jnp.take_along_axis(xs.reshape(B, nbk, BLK), blk_idx,
                                axis=1).reshape(B, D, nwin * BLK)
    win_y = jnp.take_along_axis(ys.reshape(B, nbk, BLK), blk_idx,
                                axis=1).reshape(B, D, nwin * BLK)
    for bit in range(7):                                              # BLK = 2^7
        s = 1 << bit
        on = ((fine >> bit) & 1).astype(bool)[..., None]              # [B,D,1]
        win_x = jnp.where(on, jnp.pad(win_x[..., s:], ((0, 0), (0, 0), (0, s))),
                          win_x)
        win_y = jnp.where(on, jnp.pad(win_y[..., s:], ((0, 0), (0, 0), (0, s))),
                          win_y)
    pts = jnp.stack([win_x[..., :Q], win_y[..., :Q]], axis=-1)        # [B,D,Q,2]

    # replicate last valid vertex into padding slots
    q_iota = jnp.arange(Q)
    last = jnp.take_along_axis(
        pts, jnp.clip(n - 1, 0, Q - 1)[..., None, None].astype(jnp.int32), axis=2)
    pts = jnp.where(q_iota[None, None, :, None] < n[..., None, None], pts, last)

    ip = jax.vmap(jax.vmap(
        lambda p, nn, c: _find_internal_point(p, nn, c, cfg.pair_candidates)))(
        pts, n, centers)                                              # [B,D,2]

    ang = _polar_angle(pts[..., 0] - ip[..., 0:1], pts[..., 1] - ip[..., 1:2])
    ang = jnp.where(q_iota[None, None, :] < n[..., None], ang, jnp.inf)
    # stable multi-operand sort == stable argsort + gather, minus the gather
    _, px, py = jax.lax.sort((ang, pts[..., 0], pts[..., 1]),
                             dimension=-1, num_keys=1, is_stable=True)
    poly = jnp.stack([px, py], axis=-1)
    last2 = jnp.take_along_axis(
        poly, jnp.clip(n - 1, 0, Q - 1)[..., None, None].astype(jnp.int32), axis=2)
    poly = jnp.where(q_iota[None, None, :, None] < n[..., None, None], poly, last2)

    # validity: non-degenerate raster area (ref aug_group :187-189 fillPoly
    # sum > 0 ~ shoelace area >= 0.5) + center inside (ref :201-204)
    y2 = jnp.roll(poly[..., 1], -1, axis=-1)
    x2 = jnp.roll(poly[..., 0], -1, axis=-1)
    area = 0.5 * jnp.abs(jnp.sum(poly[..., 0] * y2 - x2 * poly[..., 1], axis=-1))
    inside = jax.vmap(jax.vmap(lambda c, p: point_in_polygon(c, p)))(centers, poly)
    enough = det_valid & (counts >= cfg.obj_pixel_th)
    ok = enough & (area >= 0.5) & inside

    n = jnp.where(enough, n, 0)
    poly = jnp.where(enough[..., None, None], poly, 0.0)
    return poly, n, centers, ok


def render_masks(dets: "Detections", h: int, w: int,
                 max_masks: int | None = None) -> jnp.ndarray:
    """Rasterize decoded polygons to instance masks ON DEVICE.

    dets: a Detections batch; returns bool [B, D', h, w] with D' =
    max_masks or D. Replaces the reference's host-side cv2.fillPoly in the
    eval protocol (ref utils/eval_util.py:118, utils/image.py:180-185) —
    masks never round-trip through the host (the north-star requirement).
    Invalid detections render empty.
    """
    from instance_segmentation_tpu.ops.geometry import rasterize_polygon

    polys = dets.polygons
    valid = dets.obj_valid
    if max_masks is not None:
        polys = polys[:, :max_masks]
        valid = valid[:, :max_masks]
    # polygons are (x, y); rasterize_polygon expects (row, col)
    polys_rc = jnp.stack([polys[..., 1], polys[..., 0]], axis=-1)
    masks = jax.vmap(jax.vmap(lambda p: rasterize_polygon(p, h, w)))(polys_rc)
    return masks & valid[..., None, None]


def decode_centers(conf_hm: jnp.ndarray, cls_hm: jnp.ndarray, wh_map: jnp.ndarray,
                   num_centers: int, iou_th: float = 0.5,
                   max_out: int = 96):
    """Center-heatmap detection decode (alternative anchor-free path).

    On-device re-design of ref decode_ct_hm (utils/decode.py:254-285, the
    reference's CenterNet-style path, unused on its live path but part of the
    decode inventory): select top center peaks from a confidence map, read
    per-center class and (h, w) size, then class-aware NMS on the implied
    boxes with the reference's 0.5 IoU threshold (ref :278 py_cpu_nms).

    conf_hm [H,W], cls_hm [H,W] int, wh_map [H,W,2] ((h,w) per pixel).
    Returns (centers_rc [M,2] int32, classes [M], confs [M], whs [M,2], valid [M]).
    """
    H, W = conf_hm.shape
    flat_idx, ok = select_peaks(conf_hm, num_centers)
    rr = (flat_idx // W).astype(jnp.float32)
    cc = (flat_idx % W).astype(jnp.float32)
    conf = conf_hm.reshape(-1)[flat_idx]
    ok = ok & (conf > 0)
    cls = cls_hm.reshape(-1)[flat_idx].astype(jnp.int32)
    wh = wh_map.reshape(-1, 2)[flat_idx]                         # [K,2] (h,w)

    boxes = jnp.stack([cc - wh[:, 1] / 2, rr - wh[:, 0] / 2,
                       cc + wh[:, 1] / 2, rr + wh[:, 0] / 2], axis=-1)
    order = jnp.argsort(-jnp.where(ok, conf, -jnp.inf))
    boxes_s, ok_s = boxes[order], ok[order]
    off = (cls[order].astype(jnp.float32) * (H + W) * 2.0)[:, None]
    keep_idx, keep_ok = leader_nms(
        boxes_s + off * jnp.array([1.0, 0.0, 1.0, 0.0]), ok_s, iou_th, max_out)
    keep_idx = jnp.clip(keep_idx, 0, boxes_s.shape[0] - 1)
    sel = order[keep_idx]
    centers = jnp.stack([rr[sel], cc[sel]], axis=-1).astype(jnp.int32)
    return centers, cls[sel], conf[sel], wh[sel], keep_ok


def decode_output(outputs, anchors: jnp.ndarray, orig_h: int, orig_w: int,
                  scale_int: float, cfg: DecodeConfig = DecodeConfig()) -> Detections:
    """Full decode of a model forward pass (ref decode_output :444-461).

    outputs = (kp, ae, tan, regression, classification); all on device,
    batched end to end.
    """
    kp, ae, tan, regression, classification = outputs
    B, H, W, _ = kp.shape

    def select():
        return select_peaks_batch(kp[..., 0], cfg.kp_th, exact=cfg.exact_topk)

    def ae_at(flat_idx):
        return jnp.take_along_axis(ae.reshape(B, -1, 4),
                                   flat_idx[..., None], axis=1)

    return _decode_core(select, ae_at, regression, classification, anchors,
                        H, W, orig_h, orig_w, scale_int, cfg)


def decode_output_packed(outputs, anchors: jnp.ndarray, orig_h: int,
                         orig_w: int, scale_int: float,
                         cfg: DecodeConfig = DecodeConfig()) -> Detections:
    """Decode from the packed space-to-depth head layout (the inference fast
    path, models/unet_decoder.UNetDecoder.packed).

    outputs = (kp_full [B,H,W] f32, heads_s2d [B,H/4,W/4,7*16] f32,
    regression, classification) with heads_s2d channel c*16 + qy*4 + qx,
    head order (kp, ae0..3, tan0, tan1). Exactly the same math as
    decode_output on the unpacked maps: the kp map is already dense, and the
    ae values are gathered straight from the s2d tensor with integer index
    arithmetic (full-res flat index -> (cell, phase) -> packed channel).
    """
    kp_full, heads_s2d, regression, classification = outputs
    B, H, W = kp_full.shape
    r2 = 16
    wc = W // 4
    nheads = heads_s2d.shape[-1] // r2
    cells = heads_s2d.reshape(B, -1, nheads, r2)           # [B, ncells, 7, 16]
    state = {}

    def select():
        flat_idx, ok, ae_vals = _select_peaks_s2d(
            kp_full, heads_s2d[..., :r2], cfg.kp_th,
            extra_cells=cells[:, :, 1:5])
        state["ae"] = ae_vals
        return flat_idx, ok

    def ae_at(flat_idx):
        return state["ae"]

    return _decode_core(select, ae_at, regression, classification, anchors,
                        H, W, orig_h, orig_w, scale_int, cfg)


def _decode_core(select, ae_at, regression, classification, anchors,
                 H: int, W: int, orig_h: int, orig_w: int, scale_int: float,
                 cfg: DecodeConfig) -> Detections:
    """Shared decode body: `select()` returns the boundary-peak top-k
    (flat indices [B,K], peak-valid [B,K]); `ae_at(flat_idx)` gathers the
    [B,K,4] embedding/sigma values at those pixels."""
    xym = coordinate_grid(H, W)

    boxes, scores, classes, det_valid = decode_boxes(
        classification, regression, anchors, H, W, cfg)

    flat_idx, kp_ok = select()                                        # [B,K]
    rr = (flat_idx // W).astype(jnp.float32)
    cc = (flat_idx % W).astype(jnp.float32)
    kp_rc = jnp.stack([rr, cc], axis=-1)                              # [B,K,2]

    ae_flat = ae_at(flat_idx)
    # the coordinate frame is analytic (losses.coordinate_grid: i/1023,
    # 2*j/2047) — compute it from (rr, cc) instead of gathering the grid
    xym_flat = jnp.stack([rr / 1023.0, cc * (2.0 / 2047.0)], axis=-1)
    emb = jnp.tanh(ae_flat[..., 0:2]) + xym_flat                      # [B,K,2]
    sig = jnp.exp(ae_flat[..., 2:4])                                  # [B,K,2]

    ci = jnp.clip(((boxes[..., 1] + boxes[..., 3]) / 2).astype(jnp.int32), 0, H - 1)
    cj = jnp.clip(((boxes[..., 0] + boxes[..., 2]) / 2).astype(jnp.int32), 0, W - 1)
    c_emb = xym[ci, cj]                                               # [B,D,2]

    contained = ((kp_rc[..., 0:1] >= boxes[..., None, :, 1]) &
                 (kp_rc[..., 0:1] <= boxes[..., None, :, 3]) &
                 (kp_rc[..., 1:2] >= boxes[..., None, :, 0]) &
                 (kp_rc[..., 1:2] <= boxes[..., None, :, 2]))         # [B,K,D]
    contained = contained & det_valid[:, None, :]

    dists = jnp.exp(-jnp.sum(
        (emb[:, :, None, :] - c_emb[:, None, :, :]) ** 2 * sig[:, :, None, :],
        axis=-1))                                                     # [B,K,D]
    scored = dists * contained.astype(jnp.float32)
    # NB: kps contained in no box get score 0 everywhere and argmax slot 0 —
    # the reference behaves identically (group_kp :328 argmax over the masked
    # affinity), relying on the ghost filter to drop strays.
    assign = jnp.argmax(scored, axis=-1)                              # [B,K]

    if cfg.group_mode == "kmeans":
        # optional Lloyd refinement in embedding space, seeded at the center
        # embeddings (on-device version of the reference's alternative
        # grouping, utils/kmeans.py:16-93); box containment still applies.
        from instance_segmentation_tpu.ops.kmeans import kmeans as _kmeans

        def refine(e, seeds, kv):
            labels, _ = _kmeans(e, seeds, valid=kv, num_iters=cfg.kmeans_iters)
            return labels
        km = jax.vmap(refine)(emb, c_emb, kp_ok)                      # [B,K]
        in_box = jnp.take_along_axis(
            contained, jnp.clip(km, 0, contained.shape[-1] - 1)[..., None],
            axis=-1)[..., 0]
        assign = jnp.where((km < contained.shape[-1]) & in_box, km, assign)

    polys, lens, centers, obj_ok = assemble_objects(
        kp_rc, kp_ok, assign, boxes, det_valid,
        H, W, orig_h, orig_w, scale_int, cfg)
    return Detections(boxes=boxes, scores=scores, classes=classes,
                      det_valid=det_valid, polygons=polys, poly_len=lens,
                      centers=centers, obj_valid=obj_ok)


def forward_and_decode(model, variables, images, anchors, orig_h: int,
                       orig_w: int, scale_int: float,
                       cfg: DecodeConfig = DecodeConfig()) -> Detections:
    """Compose a model forward with the full decode, taking the packed
    space-to-depth fast path (UNetDecoder.packed + decode_output_packed)
    whenever the input resolution allows — measured 144 -> 192 img/s at B3
    512x1024 batch 8 on v5e (full-res head maps with 1-4 trailing channels
    pad the 128-lane dim 8-128x; the packed layout stays lane-dense end to
    end). Falls back to the standard maps otherwise. Same math either way.
    """
    packed = (images.shape[1] % 4 == 0 and images.shape[2] % 4 == 0
              and getattr(getattr(model, "cfg", None), "quant", "none") == "none")
    outputs = model.apply(variables, images, train=False, packed_heads=packed)
    decode = decode_output_packed if packed else decode_output
    return decode(outputs, anchors, orig_h, orig_w, scale_int, cfg)
