"""Continuous-time trajectory: cumulative cubic B-spline on SO(3) x R^3.

JAX re-design of the reference Trajectory module
(/root/reference/gslam/trajectory.py:100-249), which builds on pypose
Lie-group tensors: here control rotations are axis-angle Log/Exp composed
with the standard cumulative-basis coefficients, so interpolation,
velocity, and acceleration are pure differentiable functions of the control
point arrays — the whole spline fit (e.g. against IMU accelerometer
residuals) runs inside one jitted Adam loop.

Basis (uniform cumulative cubic B-spline, u in [0,1)):
    c1 = (5 + 3u - 3u^2 + u^3)/6, c2 = (1 + 3u + 3u^2 - 2u^3)/6, c3 = u^3/6
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import (
    HIGH, quaternion_to_matrix, so3_exp, so3_log,
)


class Spline(NamedTuple):
    rot_cps: jax.Array  # [M, 3, 3] control rotations (world-from-body)
    pos_cps: jax.Array  # [M, 3] control translations
    interval: float
    start_time: float
    n_active: jax.Array  # [] int32 number of valid control points


def init_spline(num_cps: int, interval: float, start_time: float) -> Spline:
    return Spline(
        rot_cps=jnp.tile(jnp.eye(3, dtype=jnp.float32), (num_cps, 1, 1)),
        pos_cps=jnp.zeros((num_cps, 3), jnp.float32),
        interval=float(interval),
        start_time=float(start_time),
        n_active=jnp.zeros((), jnp.int32),
    )


def _segment(sp: Spline, t: jax.Array):
    seg = jnp.floor((t - sp.start_time) / sp.interval)
    seg = jnp.clip(seg, 1, sp.n_active.astype(jnp.float32) - 2.0)
    u = (t - (seg * sp.interval + sp.start_time)) / sp.interval
    return seg.astype(jnp.int32), u


def _gather4(cps: jax.Array, seg: jax.Array):
    idx = seg[..., None] + jnp.arange(-1, 3)
    idx = jnp.clip(idx, 0, cps.shape[0] - 1)
    return cps[idx]


def spline_pose(sp: Spline, times: jax.Array):
    """Interpolate world-from-body poses at `times` [T].
    Returns (R [T,3,3], p [T,3])."""
    seg, u = _segment(sp, times)
    u2, u3 = u * u, u * u * u
    c1 = (5.0 + 3 * u - 3 * u2 + u3) / 6.0
    c2 = (1.0 + 3 * u + 3 * u2 - 2 * u3) / 6.0
    c3 = u3 / 6.0

    R4 = _gather4(sp.rot_cps, seg)  # [T, 4, 3, 3]
    d = jnp.einsum("tkji,tkjl->tkil", R4[:, :-1], R4[:, 1:], precision=HIGH)
    w = so3_log(d)  # [T, 3, 3vec]
    R = R4[:, 0]
    for k, c in enumerate((c1, c2, c3)):
        R = jnp.einsum(
            "tij,tjl->til", R, so3_exp(w[:, k] * c[:, None]), precision=HIGH
        )

    p4 = _gather4(sp.pos_cps, seg)  # [T, 4, 3]
    dp = p4[:, 1:] - p4[:, :-1]
    p = p4[:, 0] + c1[:, None] * dp[:, 0] + c2[:, None] * dp[:, 1] \
        + c3[:, None] * dp[:, 2]
    return R, p


def spline_velocity(sp: Spline, times: jax.Array) -> jax.Array:
    """Translational velocity [T, 3] (world frame)."""
    seg, u = _segment(sp, times)
    u2 = u * u
    c1 = (3.0 - 6 * u + 3 * u2) / 6.0
    c2 = (3.0 + 6 * u - 6 * u2) / 6.0
    c3 = (3 * u2) / 6.0
    p4 = _gather4(sp.pos_cps, seg)
    dp = p4[:, 1:] - p4[:, :-1]
    v = c1[:, None] * dp[:, 0] + c2[:, None] * dp[:, 1] + c3[:, None] * dp[:, 2]
    return v / sp.interval


def spline_acceleration(sp: Spline, times: jax.Array) -> jax.Array:
    """Translational acceleration [T, 3] (world frame)."""
    seg, u = _segment(sp, times)
    c1 = u - 1.0
    c2 = 1.0 - 2 * u
    c3 = u
    p4 = _gather4(sp.pos_cps, seg)
    dp = p4[:, 1:] - p4[:, :-1]
    a = c1[:, None] * dp[:, 0] + c2[:, None] * dp[:, 1] + c3[:, None] * dp[:, 2]
    return a / sp.interval**2


def seed_from_poses(
    sp: Spline, times: jax.Array, rot: jax.Array, pos: jax.Array
) -> Spline:
    """Seed control points by nearest-sample assignment of measured poses."""
    num_cps = sp.rot_cps.shape[0]
    cp_times = sp.start_time + jnp.arange(num_cps) * sp.interval
    nearest = jnp.argmin(
        jnp.abs(cp_times[:, None] - times[None, :]), axis=1
    )
    n_active = jnp.minimum(
        jnp.floor((times.max() - sp.start_time) / sp.interval).astype(jnp.int32) + 1,
        num_cps,
    )
    return sp._replace(
        rot_cps=rot[nearest], pos_cps=pos[nearest], n_active=n_active
    )


@partial(jax.jit, static_argnames=("n_steps",))
def fit_spline(
    sp: Spline,
    pose_times: jax.Array,  # [T]
    rot_meas: jax.Array,  # [T, 3, 3]
    pos_meas: jax.Array,  # [T, 3]
    accel_times: jax.Array | None = None,  # [A]
    accel_meas: jax.Array | None = None,  # [A, 3] world-frame acceleration
    n_steps: int = 200,
    lr: float = 1e-2,
    accel_weight: float = 1e-3,
) -> tuple[Spline, jax.Array]:
    """Refine control points against pose (and optionally accelerometer)
    residuals with in-jit Adam. Rotations are optimized in the tangent space
    of the current control rotations."""

    def loss_fn(params):
        s = sp._replace(
            rot_cps=jnp.einsum(
                "mij,mjl->mil", sp.rot_cps, so3_exp(params["dw"]),
                precision=HIGH,
            ),
            pos_cps=params["p"],
        )
        R, p = spline_pose(s, pose_times)
        rot_res = so3_log(
            jnp.einsum("tji,tjl->til", R, rot_meas, precision=HIGH)
        )
        loss = jnp.mean(jnp.sum((p - pos_meas) ** 2, -1))
        loss = loss + jnp.mean(jnp.sum(rot_res**2, -1))
        if accel_times is not None:
            a = spline_acceleration(s, accel_times)
            loss = loss + accel_weight * jnp.mean(
                jnp.sum((a - accel_meas) ** 2, -1)
            )
        return loss

    params = {"dw": jnp.zeros_like(sp.pos_cps), "p": sp.pos_cps}
    mu = jax.tree_util.tree_map(jnp.zeros_like, params)
    nu = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, i):
        params, mu, nu = carry
        loss, g = jax.value_and_grad(loss_fn)(params)
        t = (i + 1).astype(jnp.float32)
        mu = jax.tree_util.tree_map(lambda m, gg: 0.9 * m + 0.1 * gg, mu, g)
        nu = jax.tree_util.tree_map(
            lambda v, gg: 0.999 * v + 0.001 * gg * gg, nu, g
        )
        params = jax.tree_util.tree_map(
            lambda p, m, v: p
            - lr * (m / (1 - 0.9**t)) / (jnp.sqrt(v / (1 - 0.999**t)) + 1e-8),
            params, mu, nu,
        )
        return (params, mu, nu), loss

    (params, _, _), losses = jax.lax.scan(
        step, (params, mu, nu), jnp.arange(n_steps)
    )
    out = sp._replace(
        rot_cps=jnp.einsum(
            "mij,mjl->mil", sp.rot_cps, so3_exp(params["dw"]), precision=HIGH
        ),
        pos_cps=params["p"],
    )
    return out, losses


def rot_cps_from_quats(quats: jax.Array) -> jax.Array:
    return quaternion_to_matrix(quats)
