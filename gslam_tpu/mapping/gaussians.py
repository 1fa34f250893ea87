"""Fixed-capacity Gaussian map buffer.

The reference stores splats as 7 growable torch Parameters and performs
concat/boolean-mask surgery on them AND their Adam states on every
insert/prune (/root/reference/gslam/map.py:13-43, insertion.py:27-65,
pruning.py:10-53). Under XLA that would retrace/reallocate constantly, so the
TPU design is a donated fixed-capacity pytree-of-arrays with a live mask:

  * insertion = scatter writes into dead slots (+ zeroing optimizer moments),
  * pruning   = clearing live bits,
  * rendering = the live mask rides into the projector's cull test.

Shapes never change, so every jitted step compiles exactly once. (Buffer
donation is deliberately not used: it is ~6000x slower on the axon TPU
backend — docs/PERF.md.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Fields optimized by the mapping backend (everything but ages/alive).
TRAINABLE_FIELDS = (
    "means", "quats", "log_scales", "logit_opacities", "logit_colors",
    "log_uncertainties",
)


class GaussianMap(NamedTuple):
    means: jax.Array  # [cap, 3]
    quats: jax.Array  # [cap, 4] wxyz, unnormalized
    log_scales: jax.Array  # [cap, 3]
    logit_opacities: jax.Array  # [cap]
    logit_colors: jax.Array  # [cap, 3]
    log_uncertainties: jax.Array  # [cap]
    ages: jax.Array  # [cap] int32: frame index at insertion
    alive: jax.Array  # [cap] bool

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def n_live(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def render_kwargs(self) -> dict:
        """Keyword arguments for gslam_tpu.ops.render."""
        return dict(
            means=self.means,
            quats=self.quats,
            log_scales=self.log_scales,
            logit_opacities=self.logit_opacities,
            logit_colors=self.logit_colors,
            log_uncertainties=self.log_uncertainties,
            alive=self.alive,
        )

    def trainable(self) -> dict:
        return {f: getattr(self, f) for f in TRAINABLE_FIELDS}

    def with_trainable(self, params: dict) -> "GaussianMap":
        return self._replace(**params)


def empty_map(capacity: int) -> GaussianMap:
    return GaussianMap(
        means=jnp.zeros((capacity, 3), jnp.float32),
        quats=jnp.concatenate(
            [jnp.ones((capacity, 1), jnp.float32), jnp.zeros((capacity, 3), jnp.float32)],
            axis=-1,
        ),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        logit_opacities=jnp.full((capacity,), -10.0, jnp.float32),
        logit_colors=jnp.zeros((capacity, 3), jnp.float32),
        log_uncertainties=jnp.zeros((capacity,), jnp.float32),
        ages=jnp.zeros((capacity,), jnp.int32),
        alive=jnp.zeros((capacity,), bool),
    )


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over `values[mask]` (lower median). values [n] or [n, d]."""
    if values.ndim == 1:
        v = jnp.where(mask, values, jnp.inf)
        v = jnp.sort(v)
        k = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - 1, 0) // 2
        return v[k]
    v = jnp.where(mask[:, None], values, jnp.inf)
    v = jnp.sort(v, axis=0)
    k = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - 1, 0) // 2
    return v[k]


def compact_free_slots(alive: jax.Array, n: int) -> jax.Array:
    """Indices of the first `n` dead slots; capacity (out-of-range) when fewer."""
    cap = alive.shape[0]
    return jnp.nonzero(~alive, size=n, fill_value=cap)[0].astype(jnp.int32)


def compact_map(gmap: GaussianMap, opt_state=None, stable: bool = True,
                return_order: bool = False):
    """In-place live-slot compaction: permute live splats to the front.

    The fixed-capacity design (SURVEY §5.7's north star) never moves data —
    inserts scatter into dead slots, prunes clear live bits — so slots
    fragment over a long run. Everything is mask-correct regardless, but a
    dense prefix (a) makes `compact_free_slots` scans trivially cheap,
    (b) keeps memory traffic for the live set contiguous, and (c) is the
    primitive a capacity-growth copy builds on. A pure permutation gather,
    jit-safe (call it under cond every K frames, or host-side).

    Returns (gmap, opt_state) with the same shapes; optimizer moments are
    permuted identically so moment/parameter pairing is preserved. With
    `return_order` the applied permutation is also returned so any OTHER
    per-slot state (e.g. the fused runtime's per-keyframe visibility
    columns) can be permuted consistently.
    """
    order = jnp.argsort(~gmap.alive, stable=stable)  # live first, stable

    def perm(x):
        return x[order]

    gmap2 = GaussianMap(
        means=perm(gmap.means),
        quats=perm(gmap.quats),
        log_scales=perm(gmap.log_scales),
        logit_opacities=perm(gmap.logit_opacities),
        logit_colors=perm(gmap.logit_colors),
        log_uncertainties=perm(gmap.log_uncertainties),
        ages=perm(gmap.ages),
        alive=perm(gmap.alive),
    )
    if opt_state is None:
        opt2 = None
    else:
        opt2 = type(opt_state)(
            mu={f: perm(v) for f, v in opt_state.mu.items()},
            nu={f: perm(v) for f, v in opt_state.nu.items()},
            count=opt_state.count,
        )
    if return_order:
        return gmap2, opt2, order
    return gmap2, opt2


def grow_map(gmap: GaussianMap, opt_state, new_capacity: int):
    """Host-side capacity growth: copy into a larger buffer (compacted).

    The reference grows by torch.cat on every insert
    (/root/reference/gslam/insertion.py:27-65); here growth is a rare,
    geometric, host-triggered event (the next jitted step recompiles once
    for the new shape — amortized away by doubling)."""
    if new_capacity < gmap.capacity:
        raise ValueError("grow_map cannot shrink")
    gmap, opt_state = compact_map(gmap, opt_state)
    pad = new_capacity - gmap.capacity
    big = empty_map(new_capacity)

    def cat(small, template):
        return jnp.concatenate([small, template[:pad]], axis=0)

    gmap2 = GaussianMap(
        means=cat(gmap.means, big.means),
        quats=cat(gmap.quats, big.quats),
        log_scales=cat(gmap.log_scales, big.log_scales),
        logit_opacities=cat(gmap.logit_opacities, big.logit_opacities),
        logit_colors=cat(gmap.logit_colors, big.logit_colors),
        log_uncertainties=cat(gmap.log_uncertainties, big.log_uncertainties),
        ages=cat(gmap.ages, big.ages),
        alive=cat(gmap.alive, big.alive),
    )
    if opt_state is None:
        return gmap2, None
    opt2 = type(opt_state)(
        mu={f: jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
            for f, v in opt_state.mu.items()},
        nu={f: jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
            for f, v in opt_state.nu.items()},
        count=opt_state.count,
    )
    return gmap2, opt2
