"""Differentiable rigid-transform math (pure jnp).

Provides the learnable camera-pose parameterization used by both the tracking
frontend and the mapping backend: a fixed base world-to-camera matrix ``Rt``
composed with a small learnable delta expressed as a Zhou-6D rotation plus a
translation, matching the semantics of the reference pose model
(/root/reference/gslam/primitives.py:40-100) while being a flat pytree that
jit/vmap/grad compose over.

All functions are batched over leading dimensions and differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# This codebase runs with the platform-default matmul precision (bfloat16 on
# TPU MXU). Geometry math is precision-critical, so every matmul in this
# module requests full float32 precision explicitly.
HIGH = jax.lax.Precision.HIGHEST

# The 6D identity rotation (two orthonormal columns of I).
# NumPy on purpose: a module-level jnp array is an eagerly-committed device
# buffer, and capturing such a buffer inside a jitted program flips
# XLA:TPU (axon) into a ~200x slower compilation of the program's scatters
# (measured 1 ms -> 197 ms on the binning pipeline; scripts/profile_bins15/
# 16.py). A NumPy constant converts at trace time, which is safe.
IDENTITY_6D = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype=np.float32)


def _normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Zhou et al. continuous 6D rotation -> rotation matrix.

    Gram-Schmidt on the two 3-vectors; rows of the returned matrix are the
    orthonormalized basis (matches the reference convention, which stacks
    b1,b2,b3 as rows; see /root/reference/gslam/primitives.py:15-36).

    Args:
      d6: [..., 6]
    Returns:
      [..., 3, 3]
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit-normalizes wxyz quaternions and converts to rotation matrices.

    Args:
      q: [..., 4] (w, x, y, z), not necessarily normalized.
    Returns:
      [..., 3, 3]
    """
    q = _normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrix -> wxyz unit quaternion with non-negative real part.

    Branch-free formulation: computes all four quaternion candidates (one per
    largest-diagonal case) and selects the best-conditioned, analogous to the
    reference (/root/reference/gslam/primitives.py:288-347) but without
    boolean indexing so it jits and vmaps.

    Args:
      m: [..., 3, 3]
    Returns:
      [..., 4] (w, x, y, z)
    """
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [f[..., i] for i in range(9)]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    cand = cand / denom
    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return jnp.where(q[..., 0:1] < 0.0, -q, q)


def so3_hat(w: jax.Array) -> jax.Array:
    """[..., 3] axis-angle vector -> [..., 3, 3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], -1),
            jnp.stack([wz, zeros, -wx], -1),
            jnp.stack([-wy, wx, zeros], -1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues exponential map: axis-angle [..., 3] -> rotation [..., 3, 3].

    Uses Taylor expansions near zero so gradients are stable at the identity.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < 1e-8
    # `where` both-branch trick: evaluate the exact branch at a safe theta so
    # its (unused) gradient is finite at the identity.
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    K = so3_hat(w)
    K2 = jnp.matmul(K, K, precision=HIGH)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3] (inverse of so3_exp)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # Safe-sqrt both-branch trick: at R = I the gradient of ||vee|| is NaN,
    # so the norm is computed on a guarded value and the small-angle branch
    # (scale -> 1/2) is selected instead.
    sin_sq = 0.25 * jnp.sum(vee * vee, axis=-1)
    small = sin_sq < 1e-14
    sin_t = jnp.clip(jnp.sqrt(jnp.where(small, 1.0, sin_sq)), 0.0, 1.0)
    # atan2 is well-conditioned over the whole range (unlike arccos in f32).
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(small, 0.5, theta / (2.0 * sin_t))
    return scale[..., None] * vee


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) exponential: [..., 6] (rho, w) -> [..., 4, 4] homogeneous matrix."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    c = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (safe_sq * theta)
    )
    K = so3_hat(w)
    K2 = jnp.matmul(K, K, precision=HIGH)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b[..., None, None] * K + c[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", V, rho, precision=HIGH)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


class PoseDelta(NamedTuple):
    """Learnable world-to-camera pose: base @ delta(dR6, dt).

    ``base`` is a frozen 4x4 world-to-camera matrix; ``d_rot6`` and ``d_t``
    are the learnable delta (zero-initialized: d_rot6 is *added to* the 6D
    identity). Matches the reference PoseZhou composition order
    (/root/reference/gslam/primitives.py:82-92).
    """

    base: jax.Array  # [..., 4, 4]
    d_rot6: jax.Array  # [..., 6]
    d_t: jax.Array  # [..., 3]


def identity_pose_delta(base: jax.Array | None = None) -> PoseDelta:
    if base is None:
        base = jnp.eye(4, dtype=jnp.float32)
    batch = base.shape[:-2]
    return PoseDelta(
        base=base.astype(jnp.float32),
        d_rot6=jnp.zeros(batch + (6,), jnp.float32),
        d_t=jnp.zeros(batch + (3,), jnp.float32),
    )


def pose_matrix(p: PoseDelta) -> jax.Array:
    """Realize a PoseDelta into a 4x4 world-to-camera matrix (differentiable)."""
    rot = rotation_6d_to_matrix(p.d_rot6 + IDENTITY_6D)
    top = jnp.concatenate([rot, p.d_t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), top.shape[:-2] + (1, 4)
    )
    delta = jnp.concatenate([top, bottom], axis=-2)
    return jnp.matmul(p.base, delta, precision=HIGH)


def rebase_pose(p: PoseDelta) -> PoseDelta:
    """Fold the current delta into the base, resetting the delta to identity."""
    return identity_pose_delta(pose_matrix(p))


def invert_se3(m: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid [..., 4, 4] transform."""
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", Rt, t, precision=HIGH)
    top = jnp.concatenate([Rt, new_t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
