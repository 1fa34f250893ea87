"""Loss terms for tracking and mapping.

Each function mirrors a term of the reference objective so quality parity is
checkable term-by-term:
  * tracking photometric ('active-nerf'): frontend.py:113-138
  * mapping photometric + log-beta prior: backend.py:277-283
  * isotropic scale regularizer: backend.py:287-296
  * edge-aware depth total variation: utils.py:136-161, backend.py:297-302
  * masked depth L1 for RGB-D mode: frontend.py:134-137, backend.py:320-324
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tracking_photometric(
    rendered: jax.Array,  # [..., 3] exposure-corrected render
    gt: jax.Array,  # [..., 3]
    betas: jax.Array,  # [...]
    kind: str = "active-nerf",
) -> jax.Array:
    err = rendered - gt
    if kind == "l1":
        return jnp.mean(jnp.abs(err))
    if kind == "mse":
        return jnp.mean(err**2)
    if kind == "active-nerf":
        return jnp.mean(jnp.sum(err**2, axis=-1) * betas**-2.0)
    raise ValueError(kind)


def mapping_photometric(
    rendered: jax.Array,  # [C, H, W, 3] exposure-corrected
    gt: jax.Array,
    betas: jax.Array,  # [C, H, W]
    active_gs: bool = True,
    cam_mask: jax.Array | None = None,  # [C] bool: padded window slots
) -> jax.Array:
    err2 = jnp.sum((rendered - gt) ** 2, axis=-1)  # [C, H, W]
    if cam_mask is not None:
        w = cam_mask.astype(jnp.float32)[:, None, None]
        denom = jnp.maximum(jnp.sum(w) * err2.shape[1] * err2.shape[2], 1.0)
    else:
        w = jnp.ones((1, 1, 1), jnp.float32)
        denom = err2.size
    if not active_gs:
        return jnp.sum(err2 * w) / (3.0 * denom)  # plain mse over channels
    loss = jnp.sum(err2 / (2.0 * betas**2) * w) / denom
    prior = jnp.sum(jnp.log(betas) ** 2 * 0.5 * w) / denom
    return loss + prior


def isotropic_scale_loss(
    log_scales: jax.Array,  # [cap, 3]
    visible: jax.Array,  # [cap] bool
) -> jax.Array:
    mean_scale = jnp.exp(
        jax.lax.stop_gradient(jnp.mean(log_scales, axis=1, keepdims=True))
    )
    dev = jnp.abs(jnp.exp(log_scales) - mean_scale)
    return jnp.sum(jnp.where(visible[:, None], dev, 0.0))


def edge_aware_depth_tv(
    depth: jax.Array,  # [C, H, W]
    rgb: jax.Array,  # [C, H, W, 3]
    mask: jax.Array,  # [C, H, W] bool (alpha > 0.4 in the reference)
) -> jax.Array:
    gdx = jnp.abs(depth[..., :, :-1] - depth[..., :, 1:])
    gdy = jnp.abs(depth[..., :-1, :] - depth[..., 1:, :])
    gix = jnp.mean(jnp.abs(rgb[..., :, :-1, :] - rgb[..., :, 1:, :]), axis=-1)
    giy = jnp.mean(jnp.abs(rgb[..., :-1, :, :] - rgb[..., 1:, :, :]), axis=-1)
    gdx = gdx * jnp.exp(-gix)
    gdy = gdy * jnp.exp(-giy)
    return (
        jnp.sum(jnp.where(mask[..., :, :-1], gdx, 0.0))
        + jnp.sum(jnp.where(mask[..., :-1, :], gdy, 0.0))
    )


def masked_depth_l1(
    rendered_depth: jax.Array,
    gt_depth: jax.Array,
    cam_mask: jax.Array | None = None,
    alpha: jax.Array | None = None,
    alpha_min: float = 0.0,
) -> jax.Array:
    """Mean |rendered - gt| depth over valid pixels.

    Valid = sensor depth present (gt > 0, reference frontend.py:134-137),
    optionally restricted to well-covered pixels (alpha > alpha_min). The
    alpha mask is stop-gradiented: it selects WHICH pixels constrain the
    pose, it is not itself an objective (otherwise the optimizer could
    shrink coverage to shed residuals). Unmapped pixels render depth ~0,
    so without the alpha mask a mostly-unexplored view contributes a
    large pose-independent residual that drowns the informative pixels —
    the r4 gate's f16 basin jump survived a 0.01-weighted unmasked term
    for exactly this reason (docs/TRACKING_STUDY.md)."""
    valid = gt_depth > 0.0
    if cam_mask is not None:
        valid = valid & cam_mask[:, None, None]
    if alpha is not None and alpha_min > 0.0:
        valid = valid & (jax.lax.stop_gradient(alpha) > alpha_min)
    err = jnp.where(valid, jnp.abs(rendered_depth - gt_depth), 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def apply_exposure(rgb: jax.Array, exposure: jax.Array) -> jax.Array:
    """Affine exposure: rgb * exp(a) + b. exposure [..., 2] broadcasts over pixels."""
    a = exposure[..., 0]
    b = exposure[..., 1]
    shape = a.shape + (1,) * (rgb.ndim - a.ndim)
    return rgb * jnp.exp(a).reshape(shape) + b.reshape(shape)
