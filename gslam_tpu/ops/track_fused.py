"""Fused tracking render: per-tile projection + Pallas blend, zero per-eval
gathers or scatters.

Tracking re-renders the same frozen map ~36 times per frame while only the
camera pose changes. The generic path pays per evaluation for (a) gathering
per-tile splat parameters, (b) the gather-transpose scatter-adds in the
backward, and (c) [N]-level projection. All three are pose-independent in
*structure*: the tile lists are frozen per frame, and the 3D splat
parameters are constants.

So this path gathers everything ONCE per frame into splat-minor [T, c, M]
row tensors (world means, world covariance components, opacity, color,
beta), and each evaluation:

  1. projects per (tile, slot) with elementwise EWA math in [T, 1, M] form
     (work is duplicated ~3x across tiles vs [N] projection — negligible),
  2. calls the Pallas blend kernel on the row tensors directly.

Under autodiff the pose cotangent is a pure reduction over [T, M] — there
is no gather between pose and loss, hence no scatter-add in the backward.
The constants' gradients are never requested, so XLA drops those paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.mapping.gaussians import GaussianMap
from gslam_tpu.ops.blend_pallas import blend_tiles_rows
from gslam_tpu.ops.projection import _cov3d_components
from gslam_tpu.ops.rasterize import CameraBins, RenderConfig


class TileGather(NamedTuple):
    """Per-frame, pose-independent gathered tile data (splat-minor rows)."""

    m3d: jax.Array  # [T, 3, M] world means
    cov6: jax.Array  # [T, 6, M] world covariance components
    opac: jax.Array  # [T, 1, M] sigmoid opacity, 0 at invalid slots
    color: jax.Array  # [T, 3, M] sigmoid colors
    beta: jax.Array  # [T, 1, M] clamped uncertainties


def gather_tracking_tiles(
    gmap: GaussianMap, bins: CameraBins, cam: int = 0
) -> TileGather:
    """Build row-layout per-tile tensors from the map + one camera's bins."""
    ids = bins.tile_gauss[cam]  # [T, M]
    mask = bins.tile_mask[cam]

    cov6 = jnp.stack(_cov3d_components(gmap.quats, jnp.exp(gmap.log_scales)))

    def rows(x_nc):  # [C_rows, N] -> [T, C_rows, M]
        return jnp.swapaxes(x_nc[:, ids], 0, 1)

    opac = jax.nn.sigmoid(gmap.logit_opacities)
    opac = jnp.where(gmap.alive, opac, 0.0)
    color = jax.nn.sigmoid(gmap.logit_colors)
    beta = jnp.maximum(jnp.exp(gmap.log_uncertainties), 0.01)

    return TileGather(
        m3d=rows(gmap.means.T),
        cov6=rows(cov6),
        opac=jnp.where(mask, opac[ids], 0.0)[:, None, :],
        color=rows(color.T),
        beta=rows(beta[None, :]),
    )


def render_tracking_fused(
    tg: TileGather,
    viewmat: jax.Array,  # [4, 4] (differentiable)
    K: jax.Array,
    width: int,
    height: int,
    cfg: RenderConfig,
):
    """Differentiable render of the pre-gathered tiles at `viewmat`.

    Returns (rgb [H,W,3], depth [H,W], beta [H,W], alpha [H,W]).
    """
    ts = cfg.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)

    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    # all per-(tile, slot) math on 2D [T, M] arrays: a [T, 1, M] middle axis
    # would pad its sublane dim 1 -> 8 and waste 8x bandwidth in autodiff
    mx = tg.m3d[:, 0, :]
    my = tg.m3d[:, 1, :]
    mz = tg.m3d[:, 2, :]
    px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
    py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
    z = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]

    in_depth = (z > cfg.near) & (z < cfg.far)
    z_safe = jnp.where(in_depth, z, 1.0)
    lim_x = 1.3 * 0.5 * width / fx
    lim_y = 1.3 * 0.5 * height / fy
    tx = z_safe * jnp.clip(px / z_safe, -lim_x, lim_x)
    ty = z_safe * jnp.clip(py / z_safe, -lim_y, lim_y)

    # rotate world covariance rows into the camera frame
    cw = [tg.cov6[:, i, :] for i in range(6)]
    c00w, c01w, c02w, c11w, c12w, c22w = cw

    def row_sigma(r):
        a, b, d = r[0], r[1], r[2]
        return (
            a * c00w + b * c01w + d * c02w,
            a * c01w + b * c11w + d * c12w,
            a * c02w + b * c12w + d * c22w,
        )

    s0, s1, s2 = row_sigma(R[0]), row_sigma(R[1]), row_sigma(R[2])

    def dot_row(s, r):
        return s[0] * r[0] + s[1] * r[1] + s[2] * r[2]

    c00 = dot_row(s0, R[0])
    c01 = dot_row(s0, R[1])
    c02 = dot_row(s0, R[2])
    c11 = dot_row(s1, R[1])
    c12 = dot_row(s1, R[2])
    c22 = dot_row(s2, R[2])

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + cfg.eps2d
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    cc = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + cfg.eps2d

    det = a * cc - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)

    xy_rows = jnp.stack(
        [fx * px * inv_z + cx, fy * py * inv_z + cy], axis=1
    )  # [T, 2, M]
    con_rows = jnp.stack(
        [cc / det_safe, -b / det_safe, a / det_safe], axis=1
    )  # [T, 3, M]
    op_rows = jnp.where(
        in_depth & det_ok, tg.opac[:, 0, :], 0.0
    )[:, None, :]  # [T, 1, M]
    feat_rows = jnp.concatenate(
        [tg.color, z[:, None, :], tg.beta], axis=1
    )  # [T, 5, M]

    out, t_final, _touched = blend_tiles_rows(
        xy_rows, con_rows, op_rows, feat_rows, ts, tiles_x,
        (cfg.alpha_cut, cfg.alpha_clamp, cfg.visibility_min_T),
    )
    bg = jnp.concatenate([
        jnp.zeros(3, jnp.float32), jnp.zeros(1, jnp.float32),
        jnp.full((1,), cfg.beta_background, jnp.float32),
    ])
    out = out + t_final[..., None] * bg[None, None, :]

    def untile(img_flat):
        extra = img_flat.shape[2:]
        img = img_flat.reshape((tiles_y, tiles_x, ts, ts) + extra)
        img = jnp.swapaxes(img, 1, 2)
        return img.reshape((tiles_y * ts, tiles_x * ts) + extra)[:height, :width]

    return (
        untile(out[..., :3]), untile(out[..., 3]), untile(out[..., 4]),
        untile(1.0 - t_final),
    )
