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


def _cov3d_components(quats: jax.Array, scales: jax.Array):
    """Upper-triangular world covariance as six [N] vectors.

    Batched tiny-matrix einsums pad onto the MXU catastrophically (each 3x3
    becomes a full tile), so the whole EWA covariance chain is written as
    elementwise VPU arithmetic over the splat axis.
    """
    # rotation entries straight from quaternion components as [N] vectors —
    # an [N, 3, 3] intermediate would pad its 3-lane minor axis to 128 and
    # spend the whole op relayouting.
    q = quats / jnp.maximum(
        jnp.sqrt(jnp.sum(quats * quats, axis=-1, keepdims=True)), 1e-12
    )
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy_, xz_, yz_ = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    s0, s1, s2 = scales[..., 0], scales[..., 1], scales[..., 2]
    m00 = (1.0 - 2.0 * (yy + zz)) * s0
    m01 = (2.0 * (xy_ - wz)) * s1
    m02 = (2.0 * (xz_ + wy)) * s2
    m10 = (2.0 * (xy_ + wz)) * s0
    m11 = (1.0 - 2.0 * (xx + zz)) * s1
    m12 = (2.0 * (yz_ - wx)) * s2
    m20 = (2.0 * (xz_ - wy)) * s0
    m21 = (2.0 * (yz_ + wx)) * s1
    m22 = (1.0 - 2.0 * (xx + yy)) * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22
    return c00, c01, c02, c11, c12, c22


def _rotate_cov(R: jax.Array, c):
    """Sigma_cam = R Sigma_world R^T, expanded elementwise.

    R is one camera's [3,3]; c are the six [N] world-covariance components.
    Returns the six camera-frame components as [N] vectors.
    """
    c00, c01, c02, c11, c12, c22 = c

    def row_sigma(r):  # (R Sigma) row given R row r = (a, b, d)
        a, b, d = r[0], r[1], r[2]
        return (
            a * c00 + b * c01 + d * c02,
            a * c01 + b * c11 + d * c12,
            a * c02 + b * c12 + d * c22,
        )

    s0 = row_sigma(R[0])
    s1 = row_sigma(R[1])
    s2 = row_sigma(R[2])

    def dot_row(s, r):
        return s[0] * r[0] + s[1] * r[1] + s[2] * r[2]

    return (
        dot_row(s0, R[0]), dot_row(s0, R[1]), dot_row(s0, R[2]),
        dot_row(s1, R[1]), dot_row(s1, R[2]), dot_row(s2, R[2]),
    )


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
    # world->camera transform, elementwise (a [N,3]@[3,3] matmul pads to the
    # MXU tile and runs ~1000x below peak for this shape)
    mx, my, mz = means[..., 0], means[..., 1], means[..., 2]
    px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
    py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
    z = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]

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
    tx = z_safe * jnp.clip(px / z_safe, -lim_x, lim_x)
    ty = z_safe * jnp.clip(py / z_safe, -lim_y, lim_y)

    cov_world = _cov3d_components(quats, scales)
    c00, c01, c02, c11, c12, c22 = _rotate_cov(R, cov_world)

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # J rows: [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

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

    mean2d = jnp.stack([fx * px * inv_z + cx, fy * py * inv_z + cy], axis=-1)

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
