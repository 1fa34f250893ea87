"""EWA perspective projection of 3D Gaussians (pure jnp, differentiable).

Replaces the reference's external CUDA `fully_fused_projection`
(/root/reference/gslam/rasterization.py:153-170) with a vectorized XLA
formulation: the whole op is elementwise/small-matrix math over N splats, so
XLA fuses it into a handful of VPU kernels — no custom kernel needed. Unlike
the CUDA op, gradients come from autodiff and flow to means, quats, scales
AND the camera viewmat (camera-pose gradients are what the tracking frontend
optimizes on).

Conventions (matching gsplat semantics so behavior parity holds):
  * viewmat is world-to-camera, [4, 4].
  * quats are wxyz and need not be normalized.
  * 2D covariance gets +eps2d on the diagonal ("classic" mode low-pass).
  * radius = ceil(3 * sigma_max) from the eigenvalues of the blurred 2D cov;
    a splat is "visible" iff radius > 0, depth in (near, far), det > 0, and
    its 3-sigma box touches the image.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import quaternion_to_matrix

HIGH = jax.lax.Precision.HIGHEST


class ProjectionOutput(NamedTuple):
    means2d: jax.Array  # [N, 2] pixel coords
    depths: jax.Array  # [N] camera-space z
    conics: jax.Array  # [N, 3] inverse 2D covariance (a, b, c) upper triangle
    radii: jax.Array  # [N] float, 0 for culled splats
    valid: jax.Array  # [N] bool


def _quat_scale_to_cov3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """Covariance = R diag(s^2) R^T for activated scales. [N,4],[N,3] -> [N,3,3]."""
    R = quaternion_to_matrix(quats)
    M = R * scales[..., None, :]
    return jnp.einsum("...ij,...kj->...ik", M, M, precision=HIGH)


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """Public helper mirroring gsplat's quat_scale_to_covar_preci covar output
    (used by the split densification strategy; /root/reference/gslam/insertion.py:88)."""
    return _quat_scale_to_cov3d(quats, scales)


def project_gaussians(
    means: jax.Array,  # [N, 3] world-space centers
    quats: jax.Array,  # [N, 4] wxyz
    scales: jax.Array,  # [N, 3] activated (exp'd) scales
    viewmat: jax.Array,  # [4, 4] world-to-camera
    K: jax.Array,  # [3, 3]
    width: int,
    height: int,
    near: float = 0.01,
    far: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    alive: jax.Array | None = None,  # [N] bool live-mask; dead splats culled
) -> ProjectionOutput:
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = jnp.matmul(means, R.T, precision=HIGH) + t  # [N, 3]
    z = p_cam[..., 2]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    in_depth = (z > near) & (z < far)
    z_safe = jnp.where(in_depth, z, 1.0)

    # EWA Jacobian with gsplat's frustum clamping of x/z, y/z so that splats
    # just outside the FOV keep finite Jacobians.
    tan_fov_x = 0.5 * width / fx
    tan_fov_y = 0.5 * height / fy
    lim_x = 1.3 * tan_fov_x
    lim_y = 1.3 * tan_fov_y
    tx = z_safe * jnp.clip(p_cam[..., 0] / z_safe, -lim_x, lim_x)
    ty = z_safe * jnp.clip(p_cam[..., 1] / z_safe, -lim_y, lim_y)

    cov3d_world = _quat_scale_to_cov3d(quats, scales)  # [N, 3, 3]
    cov3d_cam = jnp.einsum(
        "ij,njk,lk->nil", R, cov3d_world, R, precision=HIGH
    )  # [N, 3, 3]

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    c00, c01, c02 = cov3d_cam[..., 0, 0], cov3d_cam[..., 0, 1], cov3d_cam[..., 0, 2]
    c11, c12, c22 = cov3d_cam[..., 1, 1], cov3d_cam[..., 1, 2], cov3d_cam[..., 2, 2]

    # cov2d = J Sigma J^T, expanded (J is 2x3 with zeros at (0,1) and (1,0)).
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    a = a + eps2d
    c = c + eps2d
    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # 3-sigma radius from the larger eigenvalue of the blurred covariance.
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    v_max = jnp.maximum(mid + disc, mid - disc)
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(v_max, 0.0)))
    radius = jax.lax.stop_gradient(radius)

    mean2d = jnp.stack(
        [fx * p_cam[..., 0] * inv_z + cx, fy * p_cam[..., 1] * inv_z + cy], axis=-1
    )

    inside = (
        (mean2d[..., 0] + radius > 0)
        & (mean2d[..., 0] - radius < width)
        & (mean2d[..., 1] + radius > 0)
        & (mean2d[..., 1] - radius < height)
    )
    valid = in_depth & det_ok & inside & (radius > radius_clip)
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius, 0.0)

    return ProjectionOutput(
        means2d=mean2d, depths=z, conics=conic, radii=radius, valid=valid
    )
