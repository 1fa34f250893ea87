"""Pruning strategies over the fixed-capacity buffer.

Mirrors the reference's pruning policies (/root/reference/gslam/pruning.py)
— low opacity, oversized screen footprint, ill-conditioned (visible but
never contributing) — as pure mask computations; applying a prune is just
clearing live bits, no tensor surgery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gslam_tpu.mapping.gaussians import GaussianMap


def low_opacity_mask(gmap: GaussianMap, min_opacity: float = 0.2) -> jax.Array:
    return jax.nn.sigmoid(gmap.logit_opacities) < min_opacity


def large_radius_mask(max_radii: jax.Array, max_radius: float = 256.0) -> jax.Array:
    """max_radii: [cap] max screen radius across rendered views."""
    return max_radii > max_radius


def ill_conditioned_mask(
    radii: jax.Array,  # [C, cap]
    n_touched: jax.Array,  # [C, cap]
    max_views: int = 3,
) -> jax.Array:
    useless = (radii > 0) & (n_touched == 0)
    return jnp.sum(useless.astype(jnp.int32), axis=0) > max_views


def young_invisible_mask(
    gmap: GaussianMap,
    visibility_counts: jax.Array,  # [cap]
    latest_kf_age,
    min_visibility: int = 3,
    age_window: int = 3,
) -> jax.Array:
    """PruneByVisibility semantics (defined but unused in the reference)."""
    young = gmap.ages > (latest_kf_age - age_window)
    return young & (visibility_counts < min_visibility)


def apply_prune(gmap: GaussianMap, remove_mask: jax.Array) -> GaussianMap:
    return gmap._replace(alive=gmap.alive & ~remove_mask)


def opacity_decay(
    gmap: GaussianMap, radii: jax.Array, decay: float = 0.995
) -> GaussianMap:
    """Decay the raw opacity logit of splats visible in >1 window view.

    Faithful to the reference, which multiplies the *logit* parameter
    (/root/reference/gslam/backend.py:356-359).
    """
    seen = jnp.sum((radii > 0).astype(jnp.int32), axis=0) > 1
    return gmap._replace(
        logit_opacities=jnp.where(
            seen & gmap.alive, gmap.logit_opacities * decay, gmap.logit_opacities
        )
    )
