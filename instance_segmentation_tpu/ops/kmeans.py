"""Fixed-iteration on-device k-means with an outlier gate.

The reference ships a torch Lloyd's k-means with a per-cluster max-distance
gate that relabels far points as outliers (ref utils/kmeans.py:16-93: cluster
centers seeded from given initial states, iterate assign/update, points
farther than `max_distance` from every center get label == num_clusters).
It is imported by the decode module as an alternative grouping strategy; here
it is a first-class on-device op usable as an optional refinement of the
Gaussian-affinity assignment (ops/decode.py), with a static iteration count
(`lax.fori_loop`) instead of the reference's convergence loop.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance matrix [N, K] (ref kmeans.py:96-112)."""
    return jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)


def pairwise_cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity [N, K] (ref kmeans.py:115-130)."""
    an = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8, None)
    bn = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8, None)
    return 1.0 - an @ bn.T


def kmeans(points: jnp.ndarray, init_centers: jnp.ndarray,
           valid: jnp.ndarray | None = None,
           max_distance: float = jnp.inf, num_iters: int = 10,
           distance: str = "euclidean") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd iterations with an outlier gate.

    points [N, D], init_centers [K, D]. Returns (labels [N] int32 in [0, K]
    where K marks outliers, centers [K, D]). Points with `valid`False are
    ignored in updates and labeled K.
    """
    n, _ = points.shape
    k = init_centers.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    dist_fn = pairwise_cosine if distance == "cosine" else pairwise_distance

    def body(_, centers):
        d = dist_fn(points, centers)                       # [N, K]
        labels = jnp.argmin(d, axis=1)
        member = (jax.nn.one_hot(labels, k, dtype=points.dtype)
                  * valid[:, None])                        # [N, K]
        counts = jnp.clip(member.sum(axis=0), 1.0, None)   # [K]
        new_centers = (member.T @ points) / counts[:, None]
        return new_centers

    centers = jax.lax.fori_loop(0, num_iters, body, init_centers)
    d = dist_fn(points, centers)
    best = jnp.min(d, axis=1)
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    labels = jnp.where(valid & (best <= max_distance), labels, k)
    return labels, centers
