"""Pinhole camera model.

The Camera dataclass is host-side metadata (height/width are static Python
ints so they can parameterize jit specializations); the intrinsics matrix is
a device array. Backprojection mirrors the reference semantics
(/root/reference/gslam/primitives.py:350-395) as a pure function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

HIGH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class Camera:
    K: jax.Array  # [3, 3] intrinsics
    height: int
    width: int

    def scaled(self, factor: float) -> "Camera":
        """Camera for an image scaled by `factor` (e.g. 0.5 for half-res)."""
        s = jnp.array(
            [[factor, 0, 0], [0, factor, 0], [0, 0, 1]], dtype=jnp.float32
        )
        return Camera(
            K=jnp.matmul(s, self.K, precision=HIGH),
            height=int(round(self.height * factor)),
            width=int(round(self.width * factor)),
        )


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """[H, W, 2] grid of pixel-center (u, v) = (x, y) coordinates."""
    vs, us = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    return jnp.stack([us, vs], axis=-1)


def backproject(K: jax.Array, depth: jax.Array) -> jax.Array:
    """Lift a depth map to camera-frame 3D points.

    Args:
      K: [3, 3] intrinsics.
      depth: [H, W] depth map.
    Returns:
      [H*W, 3] camera-frame points (pixel (u,v) at integer coordinates,
      matching the reference's integer-grid convention).
    """
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    uv = pixel_grid(H, W)
    xs = (uv[..., 0] - cx) * depth / fx
    ys = (uv[..., 1] - cy) * depth / fy
    pts = jnp.stack([xs, ys, depth], axis=-1)
    return pts.reshape(-1, 3)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [4,4] rigid transform to [N,3] points."""
    return jnp.matmul(pts, T[:3, :3].T, precision=HIGH) + T[:3, 3]
