"""Brute-force k-nearest-neighbor distances.

Replaces the reference's sklearn NearestNeighbors round-trip through host
memory (/root/reference/gslam/utils.py:26-30) with an on-device distance
matrix + top_k, which for the map-initialization sizes involved (a few
thousand points) is a single MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGH = jax.lax.Precision.HIGHEST


def knn_distances(points: jax.Array, k: int) -> jax.Array:
    """Euclidean distances to the k nearest neighbors (self included).

    Args:
      points: [n, d]
    Returns:
      [n, k] sorted ascending (column 0 is the zero self-distance).
    """
    sq = jnp.sum(points * points, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        points, points.T, precision=HIGH
    )
    d2 = jnp.maximum(d2, 0.0)
    neg_topk, _ = jax.lax.top_k(-d2, k)
    return jnp.sqrt(-neg_topk)


def mean_knn_scale(points: jax.Array, k: int = 4) -> jax.Array:
    """Mean distance to the k-1 nearest neighbors, per point ([n])."""
    d = knn_distances(points, k)
    return jnp.mean(d[:, 1:], axis=-1)
