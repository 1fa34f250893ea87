"""Masked Adam over the fixed-capacity Gaussian buffer.

Functional equivalent of the reference's per-field fused torch Adam
optimizers (/root/reference/gslam/backend.py:565-602) with the optimizer-
state surgery replaced by in-place semantics: moments live in arrays the
same shape as the parameters; inserted slots get zeroed moments (the
reference concatenates zeros: insertion.py:52-61) while the shared step
count keeps running, and dead slots are simply masked out of the update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.mapping.gaussians import GaussianMap, TRAINABLE_FIELDS


class MaskedAdamState(NamedTuple):
    mu: dict  # field -> first moment, same shape as param
    nu: dict  # field -> second moment
    count: jax.Array  # [] int32 shared step counter


# Per-field learning rates; reference defaults at backend.py:50-58.
DEFAULT_LRS = {
    "means": 0.0016,
    "quats": 0.005,
    "log_scales": 0.005,
    "logit_opacities": 0.025,
    "logit_colors": 0.01,
    "log_uncertainties": 0.0025,
}


def init_adam(gmap: GaussianMap) -> MaskedAdamState:
    zeros = {f: jnp.zeros_like(getattr(gmap, f)) for f in TRAINABLE_FIELDS}
    return MaskedAdamState(
        mu=dict(zeros), nu={k: v.copy() for k, v in zeros.items()},
        count=jnp.zeros((), jnp.int32),
    )


def adam_step(
    gmap: GaussianMap,
    grads: dict,
    state: MaskedAdamState,
    lrs: dict | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    update_mask: jax.Array | None = None,  # [cap] bool; default = alive
) -> tuple[GaussianMap, MaskedAdamState]:
    if lrs is None:
        lrs = DEFAULT_LRS
    if update_mask is None:
        update_mask = gmap.alive
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t

    new_params, new_mu, new_nu = {}, {}, {}
    for f in TRAINABLE_FIELDS:
        p = getattr(gmap, f)
        g = grads[f]
        m = b1 * state.mu[f] + (1.0 - b1) * g
        v = b2 * state.nu[f] + (1.0 - b2) * g * g
        step = lrs[f] * (m / c1) / (jnp.sqrt(v / c2) + eps)
        mask = update_mask if p.ndim == 1 else update_mask[:, None]
        new_params[f] = jnp.where(mask, p - step, p)
        new_mu[f] = jnp.where(mask, m, state.mu[f])
        new_nu[f] = jnp.where(mask, v, state.nu[f])

    return gmap.with_trainable(new_params), MaskedAdamState(new_mu, new_nu, count)


def zero_state_at(state: MaskedAdamState, slots: jax.Array) -> MaskedAdamState:
    """Zero Adam moments at `slots` (used on insertion; out-of-range dropped)."""
    mu = {
        f: v.at[slots].set(0.0, mode="drop") for f, v in state.mu.items()
    }
    nu = {
        f: v.at[slots].set(0.0, mode="drop") for f, v in state.nu.items()
    }
    return MaskedAdamState(mu, nu, state.count)


class VectorAdamState(NamedTuple):
    """Adam over a flat vector (poses / exposure)."""

    mu: jax.Array
    nu: jax.Array
    count: jax.Array


def init_vector_adam(x: jax.Array) -> VectorAdamState:
    return VectorAdamState(
        jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros((), jnp.int32)
    )


def vector_adam_step(
    x: jax.Array, g: jax.Array, s: VectorAdamState, lr: float,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> tuple[jax.Array, VectorAdamState]:
    count = s.count + 1
    t = count.astype(jnp.float32)
    m = b1 * s.mu + (1 - b1) * g
    v = b2 * s.nu + (1 - b2) * g * g
    step = lr * (m / (1 - b1**t)) / (jnp.sqrt(v / (1 - b2**t)) + eps)
    return x - step, VectorAdamState(m, v, count)
