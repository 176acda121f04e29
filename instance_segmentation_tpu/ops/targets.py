"""On-device, static-shape target generation.

Re-design of ref utils/target_generator.py:292-318 (`generate_all_annotations`)
— which the reference executes as per-instance numpy/cv2 Python loops on host
*inside the loss on every training step* (models/loss.py:367), its main
throughput bottleneck. Here the whole thing is vectorized jit code over padded
label arrays, so targets render on the TPU in microseconds and never touch
the host.

Label packing convention (see data/packing.py):
    polys:   f32 [M, V, 2]  (row, col), replication-padded vertices
    n_verts: i32 [M]
    cls_ids: i32 [M]        (-1 for padding instances)

Produced targets (batch dims added by vmap):
    det_ann: f32 [M, 5]     (x1, y1, x2, y2, cls) with -1 rows for padding
                            (ref target_generator.py:295-307)
    centers: f32 [M, 2]     box centers, (row, col) (ref :314)
    points:  i32 [M, P, 2]  dense boundary samples, 2px max-norm spacing
                            (ref dense_sample_polygon :235-271)
    normals: f32 [M, P, 2]  inward unit normals per sample (ref :253-263)
    pt_valid: bool [M, P]
    kp_tgt:  f32 [H, W]     binary boundary mask = union of samples
                            (ref generate_instance_mask :98-113 -> kp_annotations :311-312)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instance_segmentation_tpu.ops.geometry import point_in_polygon


class Targets(NamedTuple):
    det_ann: jnp.ndarray      # [B, M, 5]
    centers: jnp.ndarray      # [B, M, 2] (row, col) float
    inst_valid: jnp.ndarray   # [B, M] bool
    points: jnp.ndarray       # [B, M, P, 2] int32 (row, col)
    normals: jnp.ndarray      # [B, M, P, 2] float32
    pt_valid: jnp.ndarray     # [B, M, P] bool
    kp_tgt: jnp.ndarray       # [B, H, W] float32 binary


def _sample_one_polygon(poly: jnp.ndarray,
                        max_points: int, h: int, w: int):
    """Dense boundary sampling of one REPLICATION-PADDED polygon (padded
    edges are zero-length and emit no samples, so no vertex count is
    needed; zero-padded polygons would emit phantom edges — pack with
    pack_batch/pack_polygon).

    Reproduces ref target_generator.py:235-271: walk each edge in steps of 2
    pixels of max-norm distance, emitting the integer point and the edge's
    inward unit normal; points within 2px of the border are dropped
    (ref :261 `1 < p < h-2`).
    """
    v0 = poly                                  # [V, 2]
    v1 = jnp.roll(poly, -1, axis=0)
    d = v1 - v0                                # [V, 2] (drow, dcol)
    max_dist = jnp.maximum(jnp.abs(d[:, 0]), jnp.abs(d[:, 1]))  # float [V]
    # sample count per edge: len(range(0, int(max_dist), 2))
    m_int = jnp.floor(max_dist).astype(jnp.int32)
    n_samp = jnp.where(max_dist > 0, (m_int + 1) // 2, 0)       # [V]

    # inward normal per edge (ref :253-263): n = (-dcol, drow), normalized,
    # flipped if midpoint + n/|max(n)| falls outside the polygon.
    normal = jnp.stack([-d[:, 1], d[:, 0]], axis=-1)
    norm_len = jnp.clip(jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True)),
                        1e-4, None)
    normal = normal / norm_len
    step = normal / jnp.clip(jnp.abs(jnp.max(normal, axis=-1, keepdims=True)), 1e-8, None)
    test_pts = (v0 + v1) / 2.0 + step                           # [V, 2]
    inside = point_in_polygon(test_pts, poly)                   # [V]
    normal = jnp.where(inside[:, None], normal, -normal)

    cum = jnp.cumsum(n_samp)                                    # [V]
    total = cum[-1]
    slots = jnp.arange(max_points)
    # edge index = count of cum entries <= slot (== searchsorted side="right";
    # a vmapped searchsorted lowers to a ~36ms while-loop on TPU, the
    # broadcast compare-sum is a fused [P, V] reduction)
    edge = jnp.sum((cum[None, :] <= slots[:, None]).astype(jnp.int32), axis=1)
    edge_c = jnp.clip(edge, 0, poly.shape[0] - 1)
    # per-slot edge data via one-hot matmul: [P,V] @ [V,6] on the MXU.
    # Index gathers (v0/d/normal/max_dist/cum at edge_c) run at scalar rates
    # on TPU (~8 ns/element); the one-hot contraction is exact (single
    # nonzero product per row) and batches over instances.
    onehot = (edge_c[:, None] == jnp.arange(poly.shape[0])[None, :]
              ).astype(jnp.float32)                             # [P, V]
    cum_prev = cum - n_samp                                     # exclusive cumsum
    data = jnp.concatenate(
        [v0, d, normal, max_dist[:, None], cum_prev[:, None].astype(jnp.float32)],
        axis=-1)                                                # [V, 8]
    # Precision pin: TPU matmuls default to bf16 operands; v0 coords (ulp 4 at
    # 512-2048) and cum_prev (thousands, ulp 8-16) would truncate and displace
    # samples by tens of px along edges. HIGHEST keeps the selection exact.
    g = jnp.matmul(onehot, data, precision=jax.lax.Precision.HIGHEST)  # [P, 8]
    v0_s, d_s, nrm = g[:, 0:2], g[:, 2:4], g[:, 4:6]
    start = g[:, 7]
    k = (slots.astype(jnp.float32) - start) * 2.0               # step along edge
    md = jnp.maximum(g[:, 6], 1e-8)
    pts = v0_s + d_s / md[:, None] * k[:, None]                 # [P, 2] float

    in_bounds = ((pts[:, 0] > 1) & (pts[:, 0] < h - 2) &
                 (pts[:, 1] > 1) & (pts[:, 1] < w - 2))
    valid = (slots < total) & in_bounds
    pts_i = pts.astype(jnp.int32)                               # trunc == floor (coords >= 0)
    return pts_i, nrm, valid


def generate_targets(polys: jnp.ndarray, n_verts: jnp.ndarray, cls_ids: jnp.ndarray,
                     h: int, w: int, max_points: int = 2048,
                     dense_kp: bool = True) -> Targets:
    """Batch target generation. polys [B,M,V,2], n_verts [B,M], cls_ids [B,M].

    dense_kp=False skips rasterizing the dense [H, W] boundary mask (a ~15 ms
    TPU scatter at full scale); the kp focal loss then consumes the point
    list directly (losses.kp_focal_loss_from_points — exact same value)."""

    inst_valid = cls_ids >= 0                                   # [B, M]

    # det boxes from polygon extents; padding vertices replicate a valid vertex
    # so min/max are exact (ref :295: boxes from polygon.min/max).
    ymin = jnp.min(polys[..., 0], axis=-1)
    ymax = jnp.max(polys[..., 0], axis=-1)
    xmin = jnp.min(polys[..., 1], axis=-1)
    xmax = jnp.max(polys[..., 1], axis=-1)
    det = jnp.stack([xmin, ymin, xmax, ymax, cls_ids.astype(jnp.float32)], axis=-1)
    det = jnp.where(inst_valid[..., None], det, -1.0)           # [B, M, 5]

    centers = jnp.stack([(ymin + ymax) / 2.0, (xmin + xmax) / 2.0], axis=-1)  # [B,M,2]

    sample = jax.vmap(jax.vmap(
        lambda p: _sample_one_polygon(p, max_points, h, w)))
    points, normals, pt_valid = sample(polys)
    pt_valid = pt_valid & inst_valid[..., None]

    # binary boundary mask: scatter 1s at all valid sample pixels
    # (ref generate_instance_mask :98-113; kp_annotations = mask >= 0 :312)
    if dense_kp:
        def _rasterize(pts, valid):
            flat = pts.reshape(-1, 2)
            vals = valid.reshape(-1).astype(jnp.float32)
            img = jnp.zeros((h, w), jnp.float32)
            safe = jnp.clip(flat, 0, jnp.array([h - 1, w - 1]))
            return img.at[safe[:, 0], safe[:, 1]].max(vals)

        kp_tgt = jax.vmap(_rasterize)(points, pt_valid)
    else:
        kp_tgt = None

    return Targets(det_ann=det, centers=centers, inst_valid=inst_valid,
                   points=points, normals=normals, pt_valid=pt_valid,
                   kp_tgt=kp_tgt)


def gaussian_window_target(points: jnp.ndarray, pt_valid: jnp.ndarray,
                           h: int, w: int, radius: int = 3) -> jnp.ndarray:
    """Gaussian-splatted keypoint target for ONE instance -> [h, w].

    Equivalent to ref generate_kp_mask (target_generator.py:274-278): a
    radius-3 CenterNet gaussian (sigma = diameter/6) max-splatted at every
    boundary sample. Implemented scatter-light: scatter binary impulses, then
    max over gaussian-weighted shifts. Because the gaussian factorizes and
    the impulses are non-negative, the 2D max-splat separates exactly into a
    column pass then a row pass (2*(2r+1) shifts instead of (2r+1)^2).
    """
    impulses = jnp.zeros((h, w), jnp.float32)
    safe = jnp.clip(points, 0, jnp.array([h - 1, w - 1]))
    impulses = impulses.at[safe[:, 0], safe[:, 1]].max(pt_valid.astype(jnp.float32))

    diameter = 2 * radius + 1
    sigma = diameter / 6.0

    def _shift(x, d, axis):
        y = jnp.roll(x, d, axis=axis)
        idx = [slice(None), slice(None)]
        idx[axis] = slice(0, d) if d > 0 else slice(d, None)
        return y.at[tuple(idx)].set(0.0) if d != 0 else y

    tmp = impulses
    for dx in range(-radius, radius + 1):
        if dx == 0:
            continue
        g = math.exp(-(dx * dx) / (2.0 * sigma * sigma))
        tmp = jnp.maximum(tmp, g * _shift(impulses, dx, axis=1))
    out = tmp
    for dy in range(-radius, radius + 1):
        if dy == 0:
            continue
        g = math.exp(-(dy * dy) / (2.0 * sigma * sigma))
        out = jnp.maximum(out, g * _shift(tmp, dy, axis=0))
    return out
