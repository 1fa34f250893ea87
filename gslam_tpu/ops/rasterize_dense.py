"""Dense (all-splats-per-pixel) reference renderer for correctness tests.

This is the oracle for the tiled rasterizer's golden-image tests: it sorts
ALL splats globally by depth and evaluates every splat at every pixel with
the exact same alpha/transmittance formulas as gslam_tpu.ops.rasterize, so
on scenes where no tile truncation occurs the two must agree to float
precision. O(H*W*N) memory/compute — small scenes only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslam_tpu.ops.projection import project_gaussians
from gslam_tpu.ops.rasterize import RenderConfig

HIGH = jax.lax.Precision.HIGHEST


def render_dense(
    means, quats, log_scales, logit_opacities, logit_colors, log_uncertainties,
    alive, viewmats, Ks, width: int, height: int,
    bg_rgb=None, cfg: RenderConfig = RenderConfig(),
):
    if bg_rgb is None:
        bg_rgb = jnp.zeros((3,), jnp.float32)

    opacities = jax.nn.sigmoid(logit_opacities)
    colors = jax.nn.sigmoid(logit_colors)
    scales = jnp.exp(log_scales)
    betas = jnp.maximum(jnp.exp(log_uncertainties), 0.01)

    def one_cam(viewmat, K):
        proj = project_gaussians(
            means, quats, scales, viewmat, K, width, height,
            near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
            radius_clip=cfg.radius_clip, alive=alive,
        )
        order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
        xy = proj.means2d[order]
        con = proj.conics[order]
        op = jnp.where(proj.valid, opacities, 0.0)[order]
        feat = jnp.concatenate(
            [colors, proj.depths[:, None], betas[:, None]], axis=-1
        )[order]

        vs, us = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.float32),
            jnp.arange(width, dtype=jnp.float32),
            indexing="ij",
        )
        pix = jnp.stack([us.reshape(-1), vs.reshape(-1)], -1)  # [P, 2]

        d = pix[:, None, :] - xy[None, :, :]  # [P, N, 2]
        dx, dy = d[..., 0], d[..., 1]
        sigma = 0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy) \
            + con[None, :, 1] * dx * dy
        alpha = op[None, :] * jnp.exp(-sigma)
        ok = (sigma >= 0.0) & (alpha >= cfg.alpha_cut)
        alpha = jnp.where(ok, jnp.minimum(alpha, cfg.alpha_clamp), 0.0)

        log_1m = jnp.log1p(-alpha)
        logT_incl = jnp.cumsum(log_1m, axis=-1)
        T = jnp.exp(logT_incl - log_1m)
        w = alpha * T
        out = jnp.einsum("pn,nf->pf", w, feat, precision=HIGH)
        t_final = jnp.exp(logT_incl[..., -1])
        bg = jnp.concatenate(
            [bg_rgb, jnp.zeros((1,)), jnp.full((1,), cfg.beta_background)]
        )
        out = out + t_final[:, None] * bg[None, :]

        touched_sorted = jnp.sum(
            (ok & (T > cfg.visibility_min_T)).astype(jnp.int32), axis=0
        )
        n = means.shape[0]
        n_touched = jnp.zeros((n,), jnp.int32).at[order].set(touched_sorted)

        img = out.reshape(height, width, -1)
        return (
            img[..., :3], (1.0 - t_final).reshape(height, width),
            img[..., 3], img[..., 4], proj.radii, n_touched,
        )

    return jax.vmap(one_cam)(viewmats, Ks)
