"""Vectorized polygon geometry on device.

Replaces the reference's OpenCV host geometry (cv2.pointPolygonTest at
utils/decode.py:58-66 and utils/target_generator.py:255, cv2.fillPoly at
utils/image.py:180-185) with static-shape jit ops.

Conventions:
  * polygons are float32 [V, 2] in (row, col) = (y, x) order with replication
    padding: vertices beyond `n_verts` repeat the last valid vertex, so the
    edge list v_i -> v_{(i+1) % V} contains exactly the valid edges (including
    the closing edge) plus zero-length edges that contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_polygon(poly, max_verts: int):
    """numpy-side helper: pad [n,2] -> [max_verts,2] with replication.

    Polygons longer than max_verts are decimated by uniform index sampling
    (shape-preserving vertex subsample).
    """
    import numpy as np

    poly = np.asarray(poly, dtype=np.float32).reshape(-1, 2)
    n = poly.shape[0]
    if n == 0:
        return np.zeros((max_verts, 2), np.float32), 0
    if n > max_verts:
        idx = np.linspace(0, n - 1, max_verts).round().astype(np.int64)
        idx = np.unique(idx)
        poly = poly[idx]
        n = poly.shape[0]
    out = np.concatenate([poly, np.repeat(poly[-1:], max_verts - n, axis=0)], axis=0)
    return out, n


def point_in_polygon(points: jnp.ndarray, poly: jnp.ndarray) -> jnp.ndarray:
    """Even-odd (crossing number) point-in-polygon test.

    points: [..., 2] (row, col); poly: [V, 2] replication-padded.
    Returns bool[...]: True when strictly inside (matches the `> 0` use of
    cv2.pointPolygonTest in the reference; boundary points are not inside).
    """
    py, px = points[..., 0:1], points[..., 1:2]            # [..., 1]
    ay, ax = poly[:, 0], poly[:, 1]                        # [V]
    by, bx = jnp.roll(ay, -1), jnp.roll(ax, -1)
    # horizontal ray toward +x; count crossings of edges spanning the ray's y
    cond = (ay > py) != (by > py)                          # [..., V]
    denom = by - ay
    t = jnp.where(cond, (py - ay) / jnp.where(denom == 0, 1.0, denom), 0.0)
    x_int = ax + t * (bx - ax)
    crossing = cond & (px < x_int)
    return jnp.sum(crossing.astype(jnp.int32), axis=-1) % 2 == 1


def polygon_area(poly: jnp.ndarray, n_verts: jnp.ndarray) -> jnp.ndarray:
    """|shoelace| area of a replication-padded polygon (zero edges drop out)."""
    y, x = poly[:, 0], poly[:, 1]
    y2, x2 = jnp.roll(y, -1), jnp.roll(x, -1)
    cross = x * y2 - x2 * y
    return 0.5 * jnp.abs(jnp.sum(cross))


def rasterize_polygon(poly: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Even-odd scanline rasterization of one padded polygon -> bool [h, w].

    Matches cv2.fillPoly semantics closely (pixel centers tested against the
    polygon); exact edge-pixel tie-breaking may differ by <=1px on boundaries.
    Cost: O(h * w * V) elementwise — fine for per-detection mask rendering,
    and fully fused by XLA.
    """
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    ay, ax = poly[:, 0], poly[:, 1]
    by, bx = jnp.roll(ay, -1), jnp.roll(ax, -1)
    # [h, V]: edges crossing each row
    cond = (ay[None, :] > rows) != (by[None, :] > rows)
    denom = by - ay
    t = jnp.where(cond, (rows - ay[None, :]) / jnp.where(denom == 0, 1.0, denom)[None, :], 0.0)
    x_int = jnp.where(cond, ax[None, :] + t * (bx - ax)[None, :], jnp.inf)  # [h, V]
    # Count intersections left of each pixel center without materializing
    # [h, V, w]: sort the per-row intersection xs and binary-search the pixel
    # columns; odd left-crossing count == inside (even-odd rule).
    x_sorted = jnp.sort(x_int, axis=1)                       # [h, V] (inf-padded)
    cols_row = jnp.broadcast_to(cols, (h, w))
    idx = jax.vmap(lambda xs, c: jnp.searchsorted(xs, c, side="left"))(x_sorted, cols_row)
    return (idx % 2) == 1
