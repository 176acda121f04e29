"""Fully on-device decode: boxes -> NMS -> boundary peaks -> affinity grouping
-> polygon assembly. Fixed shapes end to end; one host transfer of packed
polygon buffers at the very end.

Re-design of ref utils/decode.py (decode_output :444-461, decode_boxes
:377-419, decode_single :422-441, group_kp :288-374, select_points :71-85,
aug_group :167-204, find_internal_point :51-68, cartesian2polar :88-128) and
utils/nms.py. The reference round-trips device<->host four times per image and
loops over objects in Python/cv2; here every stage is static-shape XLA.

Output coordinate convention matches the reference: polygons/centers are
(x, y) at ORIGINAL image resolution (after the inverse of the val resize,
ref utils/tranform.py:157-171 detransform_pixel), ready for mask
rasterization in the Cityscapes eval protocol.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from instance_segmentation_tpu.losses.losses import coordinate_grid
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
    steps: box i is kept iff no higher-ranked kept box overlaps it. Used by
    tests as the semantics oracle; the fast path below (`leader_nms`) runs
    only max_dets steps.
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

    Identical result to `greedy_nms` truncated to max_out, but runs max_out
    sequential steps instead of K: each step picks the highest-ranked
    still-alive box (the next greedy keeper, since boxes are score-sorted)
    and suppresses everything it overlaps. Sequential depth drops from
    pre_nms (512) to max_dets (96) — the decode NMS stops being
    latency-bound on TPU.

    Returns (indices [max_out] into boxes, keep_valid [max_out]).
    """
    K = boxes.shape[0]
    iou = _iou_xyxy(boxes)
    rank = jnp.arange(K)

    def body(carry, _):
        alive = carry
        any_alive = jnp.any(alive)
        # first alive index (boxes are score-sorted)
        lead = jnp.argmax(alive)
        sup = (iou[lead] > iou_th) | (rank == lead)
        alive = alive & ~sup
        return alive, (jnp.where(any_alive, lead, -1), any_alive)

    _, (idx, ok) = jax.lax.scan(body, valid, None, length=max_out)
    return idx, ok


def decode_boxes(classification: jnp.ndarray, regression: jnp.ndarray,
                 anchors: jnp.ndarray, h: int, w: int, cfg: DecodeConfig):
    """Per-batch box decode. Returns (boxes[B,D,4] xyxy, scores, classes, valid)."""

    def per_image(cls_prob, reg):
        scores = jnp.max(cls_prob, axis=-1)                  # [A]
        classes = jnp.argmax(cls_prob, axis=-1)              # [A]
        boxes = bbox_transform(anchors, reg, h, w)           # [A, 4]
        masked = jnp.where(scores > cfg.cls_th, scores, -1.0)
        top_s, top_i = jax.lax.top_k(masked, cfg.pre_nms)    # sorted desc
        b_k = boxes[top_i]
        c_k = classes[top_i]
        valid_k = top_s > cfg.cls_th
        # class-aware NMS via coordinate offsetting (one NMS for all classes)
        off = (c_k.astype(jnp.float32) * (w + h) * 2.0)[:, None]
        order, keep = leader_nms(b_k + off * jnp.array([1.0, 0.0, 1.0, 0.0]),
                                 valid_k, cfg.iou_th, cfg.max_dets)
        order = jnp.clip(order, 0, cfg.pre_nms - 1)
        return (b_k[order], top_s[order], c_k[order], keep)

    return jax.vmap(per_image)(classification, regression)


# ---------------------------------------------------------------------------
# Boundary-peak selection (ref select_points :71-85, nms_hm :42-48)
# ---------------------------------------------------------------------------

def select_peaks(hm: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k + 3x3 peak test on a [H,W] heatmap.

    Returns (flat indices [k] int32, valid [k] bool). Matches the reference's
    quirk of running the 3x3 max test on the top-k-масked map (select_points
    :79-85): a selected pixel survives only if it is the max of its 3x3
    neighbourhood *in the masked map* (masked-out neighbours count as 0).
    """
    H, W = hm.shape
    k = min(k, H * W)
    flat = hm.reshape(-1)
    top_v, top_i = jax.lax.top_k(flat, k)
    # Dense threshold mask instead of scattering the top-k indices (TPU
    # scatters serialize): identical to the index mask except on exact float
    # ties at the k-th value, where extra tied pixels also join the masked
    # map for the peak test (measure-zero for continuous logits).
    thresh = top_v[-1]
    masked = jnp.where(hm >= thresh, hm, 0.0)
    # torch F.max_pool2d pads with -inf; masked-out pixels are exact 0s here,
    # matching ref select_points :84 (mat * mask before the 3x3 peak test).
    hmax = jax.lax.reduce_window(masked, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    peak = hmax.reshape(-1)[top_i] == top_v
    return top_i, peak


# ---------------------------------------------------------------------------
# Affinity grouping + polygon assembly (ref group_kp :288-374, aug_group)
# ---------------------------------------------------------------------------

def _polar_angle(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Angle in [0, 2pi) (ref cartesian2polar :88-113 via atan2 equivalence)."""
    return jnp.mod(jnp.arctan2(dy, dx), 2.0 * jnp.pi)


def _find_internal_point(pts: jnp.ndarray, n: jnp.ndarray, default: jnp.ndarray,
                         n_pairs: int) -> jnp.ndarray:
    """Internal point for the polar sort (ref find_internal_point :51-68).

    Try the box center, then the member mean, then midpoints of the first
    `n_pairs` member points (the reference tries all O(n^2) pairs on host; we
    bound the fallback, which in practice only triggers on degenerate shapes).
    `pts` is [Q,2] (x,y) with slots >= n replicated.
    """
    def inside(p):
        return point_in_polygon(p, pts)

    mean = jnp.sum(jnp.where(jnp.arange(pts.shape[0])[:, None] < n, pts, 0.0), axis=0) \
        / jnp.clip(n.astype(jnp.float32), 1.0, None)

    cand = pts[:n_pairs]                                       # [P0, 2]
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
    """Per-image object assembly.

    kp_rc [K,2] float (row,col) input-res; assign [K] -> detection index;
    boxes [D,4] xyxy input-res. Returns (polygons [D,Q,2] (x,y) orig-res,
    poly_len [D], centers [D,2], obj_valid [D]).

    TPU shape: instead of one argsort over all K keypoints per object
    (D x K log K), the keypoints are sorted ONCE by (object, row-major
    position) and each object reads its contiguous run via dynamic slice —
    per-object work drops to the Q-sized polar sort.
    """
    D = boxes.shape[0]
    Q = cfg.max_poly
    K = kp_rc.shape[0]

    # detransform to original resolution (ref tranform.py:157-171: corner-to-
    # corner affine, no offset) — (x, y) order from here on.
    tw = int(round(orig_w / scale_int))
    th = int(round(orig_h / scale_int))
    sx = (orig_w - 1) / (tw - 1)
    sy = (orig_h - 1) / (th - 1)
    kp_xy = jnp.stack([jnp.clip(kp_rc[:, 1] * sx, 0, orig_w - 1),
                       jnp.clip(kp_rc[:, 0] * sy, 0, orig_h - 1)], axis=-1)  # [K,2]

    centers_in = jnp.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                            (boxes[:, 1] + boxes[:, 3]) / 2], axis=-1)       # [D,2] (x,y)
    centers = jnp.stack([jnp.clip(centers_in[:, 0] * sx, 0, orig_w - 1),
                         jnp.clip(centers_in[:, 1] * sy, 0, orig_h - 1)], axis=-1)
    # ghost-filter box size uses the integer scale (ref compute_scale :34-35)
    wh = jnp.stack([(boxes[:, 2] - boxes[:, 0]) * scale_int,
                    (boxes[:, 3] - boxes[:, 1]) * scale_int], axis=-1)       # [D,2] (w,h)

    # ghost filter evaluated per keypoint against its assigned object
    # (ref group_kp :351-355) — each kp has exactly one assignment.
    own_c = centers[assign]                                  # [K,2]
    own_wh = wh[assign]                                      # [K,2]
    half = (0.5 + cfg.wh_delta) * own_wh
    ghost = ((kp_xy[:, 0] > own_c[:, 0] - half[:, 0]) &
             (kp_xy[:, 0] < own_c[:, 0] + half[:, 0]) &
             (kp_xy[:, 1] > own_c[:, 1] - half[:, 1]) &
             (kp_xy[:, 1] < own_c[:, 1] + half[:, 1]))
    sel = kp_valid & ghost & det_valid[assign]

    # single global sort: members of object d form a contiguous run in
    # row-major order (reference member ordering, kp_mask.nonzero() :312).
    SHIFT = 1 << 20                                          # > in_h * in_w
    rm_key = kp_rc[:, 0].astype(jnp.int32) * in_w + kp_rc[:, 1].astype(jnp.int32)
    key = jnp.where(sel, assign.astype(jnp.int32) * SHIFT + rm_key,
                    jnp.int32(D * SHIFT))
    perm = jnp.argsort(key)
    key_sorted = key[perm]
    kp_sorted = kp_xy[perm]                                  # [K,2]
    bounds = jnp.searchsorted(key_sorted, jnp.arange(D + 1, dtype=jnp.int32) * SHIFT)
    starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]   # [D]

    def per_object(d):
        count = counts[d]
        slice_len = min(Q, K)
        start = jnp.clip(starts[d], 0, K - slice_len)
        offset = starts[d] - start                           # >0 only near the tail

        def build(_):
            pts = jax.lax.dynamic_slice_in_dim(kp_sorted, start, slice_len, axis=0)
            pts = jnp.roll(pts, -offset, axis=0)             # run starts at slot 0
            if slice_len < Q:
                pts = jnp.concatenate(
                    [pts, jnp.zeros((Q - slice_len, 2), pts.dtype)], axis=0)
            n = jnp.minimum(count, Q)
            # replicate last valid vertex into padding slots
            last = pts[jnp.clip(n - 1, 0, Q - 1)]
            pts = jnp.where(jnp.arange(Q)[:, None] < n, pts, last)

            center = centers[d]
            ip = _find_internal_point(pts, n, center, cfg.pair_candidates)
            ang = _polar_angle(pts[:, 0] - ip[0], pts[:, 1] - ip[1])
            ang = jnp.where(jnp.arange(Q) < n, ang, jnp.inf)
            s_order = jnp.argsort(ang)
            poly = pts[s_order]
            poly = jnp.where(jnp.arange(Q)[:, None] < n, poly,
                             poly[jnp.clip(n - 1, 0, Q - 1)])

            # validity: non-degenerate raster area (ref aug_group :187-189
            # fillPoly sum > 0 ~ shoelace area >= 0.5) + center inside
            # (ref :201-204)
            y2 = jnp.roll(poly[:, 1], -1)
            x2 = jnp.roll(poly[:, 0], -1)
            area = 0.5 * jnp.abs(jnp.sum(poly[:, 0] * y2 - x2 * poly[:, 1]))
            inside = point_in_polygon(center, poly)
            ok = (area >= 0.5) & inside
            return poly, n, ok

        enough = det_valid[d] & (count >= cfg.obj_pixel_th)
        poly, n, ok = build(None)
        n = jnp.where(enough, n, 0)
        return (jnp.where(enough, poly, 0.0), n, enough & ok)

    # vmapped (not lax.map): all objects assemble in parallel — the batched
    # Q-sized sorts and point-in-polygon tests vectorize across D, which
    # beats skipping work for inactive slots on TPU.
    polys, lens, ok = jax.vmap(per_object)(jnp.arange(D))
    return polys, lens, centers, ok


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

    outputs = (kp, ae, tan, regression, classification); all on device.
    """
    kp, ae, tan, regression, classification = outputs
    B, H, W, _ = kp.shape
    xym = coordinate_grid(H, W)

    boxes, scores, classes, det_valid = decode_boxes(
        classification, regression, anchors, H, W, cfg)

    def per_image(kp_i, ae_i, boxes_i, det_valid_i):
        flat_idx, kp_ok = select_peaks(kp_i[..., 0], cfg.kp_th)
        rr = (flat_idx // W).astype(jnp.float32)
        cc = (flat_idx % W).astype(jnp.float32)
        kp_rc = jnp.stack([rr, cc], axis=-1)                       # [K,2]

        ae_flat = ae_i.reshape(-1, 4)[flat_idx]                    # [K,4]
        xym_flat = xym.reshape(-1, 2)[flat_idx]
        emb = jnp.tanh(ae_flat[:, 0:2]) + xym_flat                 # [K,2]
        sig = jnp.exp(ae_flat[:, 2:4])                             # [K,2]

        ci = jnp.clip(((boxes_i[:, 1] + boxes_i[:, 3]) / 2).astype(jnp.int32), 0, H - 1)
        cj = jnp.clip(((boxes_i[:, 0] + boxes_i[:, 2]) / 2).astype(jnp.int32), 0, W - 1)
        c_emb = xym[ci, cj]                                        # [D,2]

        lt_r = boxes_i[:, 1]; lt_c = boxes_i[:, 0]
        rb_r = boxes_i[:, 3]; rb_c = boxes_i[:, 2]
        contained = ((kp_rc[:, 0:1] >= lt_r[None, :]) & (kp_rc[:, 0:1] <= rb_r[None, :]) &
                     (kp_rc[:, 1:2] >= lt_c[None, :]) & (kp_rc[:, 1:2] <= rb_c[None, :]))
        contained = contained & det_valid_i[None, :]

        dists = jnp.exp(-jnp.sum((emb[:, None, :] - c_emb[None, :, :]) ** 2
                                 * sig[:, None, :], axis=-1))      # [K,D]
        scored = dists * contained.astype(jnp.float32)
        # NB: kps contained in no box get score 0 everywhere and argmax slot 0
        # — the reference behaves identically (group_kp :328 argmax over the
        # masked affinity), relying on the ghost filter to drop strays.
        assign = jnp.argmax(scored, axis=1)                        # [K]

        return assemble_objects(kp_rc, kp_ok, assign, boxes_i, det_valid_i,
                                H, W, orig_h, orig_w, scale_int, cfg)

    polys, lens, centers, obj_ok = jax.vmap(per_image)(kp, ae, boxes, det_valid)
    return Detections(boxes=boxes, scores=scores, classes=classes,
                      det_valid=det_valid, polygons=polys, poly_len=lens,
                      centers=centers, obj_valid=obj_ok)
