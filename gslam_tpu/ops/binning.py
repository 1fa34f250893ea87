"""Tile binning for the rasterizer: static-shape XLA replacement for the
reference's CUDA `isect_tiles` + `isect_offset_encode`
(/root/reference/gslam/rasterization.py:261-274).

The CUDA pipeline builds a dynamically-sized list of (tile, depth)-sorted
splat references. XLA requires static shapes, so we use a fixed pair budget:

  1. every projected splat computes its covered tile rectangle (clamped to a
     `max_span x max_span` window centered on the splat so the enumeration
     bound is static);
  2. pair slots are assigned by an exclusive cumsum of per-splat tile counts
     and written with one scatter (overflow beyond the budget is dropped,
     farthest-splat-first is NOT guaranteed — keep the budget generous and
     monitor `n_pairs`);
  3. one lexicographic `lax.sort` over (tile_id, depth) orders every tile's
     splats front-to-back;
  4. per-tile [start, count) ranges come from a vectorized binary search, and
     a [T, capacity] gather materializes the per-tile splat lists the blend
     kernel consumes (truncation keeps the *nearest* splats, which are the
     ones that matter under alpha compositing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    tile_gauss: jax.Array  # [T, capacity] int32 splat indices, front-to-back
    tile_mask: jax.Array  # [T, capacity] bool validity
    tile_counts: jax.Array  # [T] int32 splats intersecting each tile (pre-truncation)
    n_pairs: jax.Array  # [] int32 total pairs requested (monitor vs budget)


def bin_gaussians(
    means2d: jax.Array,  # [N, 2]
    radii: jax.Array,  # [N] (0 = culled)
    depths: jax.Array,  # [N]
    valid: jax.Array,  # [N] bool
    tile_size: int,
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    capacity: int,
    max_span: int = 16,
) -> TileBins:
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y
    sentinel = jnp.int32(num_tiles)

    x, y = means2d[:, 0], means2d[:, 1]
    r = radii

    tx0 = jnp.clip(jnp.floor((x - r) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / tile_size), 0, tiles_y - 1).astype(jnp.int32)

    # Clamp oversized footprints to a max_span window centered on the splat.
    tcx = jnp.clip(jnp.floor(x / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    tcy = jnp.clip(jnp.floor(y / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    big_x = span_x > max_span
    big_y = span_y > max_span
    tx0 = jnp.where(big_x, jnp.clip(tcx - max_span // 2, 0, tiles_x - max_span), tx0)
    ty0 = jnp.where(big_y, jnp.clip(tcy - max_span // 2, 0, tiles_y - max_span), ty0)
    span_x = jnp.where(big_x, max_span, span_x)
    span_y = jnp.where(big_y, max_span, span_y)

    counts = jnp.where(valid, span_x * span_y, 0)
    offsets = jnp.cumsum(counts) - counts  # exclusive
    n_pairs = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # Enumerate a fixed max_span x max_span local grid per splat. The local
    # (dx, dy) come from division by the CONSTANT max_span (a shift on TPU —
    # variable-divisor integer division lowers to a bit-serial loop and was
    # ~90% of binning cost); the compact pair index j = dy*span_x + dx still
    # packs each splat's pairs densely at offsets[i].
    k = jnp.arange(max_span * max_span, dtype=jnp.int32)  # [K]
    dy = (k // max_span)[None, :]
    dx = (k % max_span)[None, :]
    pair_ok = (
        (dx < span_x[:, None]) & (dy < span_y[:, None]) & valid[:, None]
    )
    j = dy * span_x[:, None] + dx
    tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
    idx = offsets[:, None] + j
    idx = jnp.where(pair_ok, idx, max_pairs)  # dropped by mode='drop'

    pair_tile = jnp.full((max_pairs,), sentinel, dtype=jnp.int32)
    pair_depth = jnp.full((max_pairs,), jnp.inf, dtype=jnp.float32)
    pair_id = jnp.zeros((max_pairs,), dtype=jnp.int32)

    # unique_indices=True is load-bearing: slot indices are unique by
    # construction (dense cumsum packing; all dropped entries share the
    # out-of-range sentinel), and without the hint XLA:TPU picks a slow
    # scatter path — measured 60 ms vs 0.1 ms per scatter at 12.8M updates.
    flat_idx = idx.reshape(-1)
    pair_tile = pair_tile.at[flat_idx].set(
        jnp.broadcast_to(tile, pair_ok.shape).reshape(-1).astype(jnp.int32),
        mode="drop", unique_indices=True,
    )
    depth_b = jnp.broadcast_to(depths[:, None], pair_ok.shape).reshape(-1)
    pair_depth = pair_depth.at[flat_idx].set(
        depth_b.astype(jnp.float32), mode="drop", unique_indices=True
    )
    gid = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], pair_ok.shape
    ).reshape(-1)
    pair_id = pair_id.at[flat_idx].set(gid, mode="drop", unique_indices=True)

    sorted_tile, _sorted_depth, sorted_id = jax.lax.sort(
        (pair_tile, pair_depth, pair_id), dimension=-1, num_keys=2
    )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(jnp.int32)
    tile_counts = ends - starts

    slot = jnp.arange(capacity, dtype=jnp.int32)[None, :]  # [1, capacity]
    gather_idx = starts[:, None] + slot
    tile_mask = slot < tile_counts[:, None]
    gather_idx = jnp.where(tile_mask, gather_idx, 0)
    tile_gauss = sorted_id[gather_idx]

    return TileBins(
        tile_gauss=tile_gauss,
        tile_mask=tile_mask,
        tile_counts=tile_counts,
        n_pairs=n_pairs.astype(jnp.int32),
    )
