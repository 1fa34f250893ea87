#!/usr/bin/env python3
"""Bisect inside bin_gaussians stage by stage with real data."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, args_fn, iters=10, warm=3):
    import jax

    for i in range(warm):
        jax.block_until_ready(fn(*args_fn(i)))
    t0 = time.time()
    for i in range(iters):
        out = fn(*args_fn(warm + i))
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig
    from gslam_tpu.ops.projection import project_gaussians

    W, H = 320, 240
    N = 50_000
    rng = np.random.default_rng(0)
    fx = fy = 280.0
    K = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    z = rng.uniform(1.2, 4.5, N).astype(np.float32)
    u = rng.uniform(0, W, N).astype(np.float32)
    v = rng.uniform(0, H, N).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fy, z], -1)
    gmap = empty_map(N)._replace(
        means=jnp.asarray(means),
        quats=jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.016, (N, 3)) * z[:, None]).astype(np.float32)
        ),
        alive=jnp.ones((N,), bool),
    )
    rcfg = RenderConfig()
    eye = jnp.eye(4)
    ts, tiles_x, tiles_y = 16, -(-W // 16), -(-H // 16)
    scales = jnp.exp(gmap.log_scales)

    p = project_gaussians(
        means=gmap.means, quats=gmap.quats, scales=scales, viewmat=eye, K=K,
        width=W, height=H, near=rcfg.near, far=rcfg.far, eps2d=rcfg.eps2d,
        radius_clip=rcfg.radius_clip, alive=gmap.alive,
    )
    m2d = jax.block_until_ready(p.means2d)
    radii = p.radii * 1.5
    depths = p.depths
    valid = p.valid

    max_pairs = 8 * N
    capacity = 512
    max_span = 16
    num_tiles = tiles_x * tiles_y
    sentinel = jnp.int32(num_tiles)

    def stages(m2d, radii, depths, valid, upto):
        x, y = m2d[:, 0], m2d[:, 1]
        r = radii
        tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((x + r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((y + r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        tcx = jnp.clip(jnp.floor(x / ts), 0, tiles_x - 1).astype(jnp.int32)
        tcy = jnp.clip(jnp.floor(y / ts), 0, tiles_y - 1).astype(jnp.int32)
        span_x = tx1 - tx0 + 1
        span_y = ty1 - ty0 + 1
        big_x = span_x > max_span
        big_y = span_y > max_span
        tx0 = jnp.where(big_x, jnp.clip(tcx - max_span // 2, 0, tiles_x - max_span), tx0)
        ty0 = jnp.where(big_y, jnp.clip(tcy - max_span // 2, 0, tiles_y - max_span), ty0)
        span_x = jnp.where(big_x, max_span, span_x)
        span_y = jnp.where(big_y, max_span, span_y)
        counts = jnp.where(valid, span_x * span_y, 0)
        offsets = jnp.cumsum(counts) - counts
        if upto == 1:
            return offsets.sum()
        k = jnp.arange(max_span * max_span, dtype=jnp.int32)
        dy = (k // max_span)[None, :]
        dx = (k % max_span)[None, :]
        pair_ok = (dx < span_x[:, None]) & (dy < span_y[:, None]) & valid[:, None]
        j = dy * span_x[:, None] + dx
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        idx = offsets[:, None] + j
        idx = jnp.where(pair_ok, idx, max_pairs)
        if upto == 2:
            return idx.sum() + tile.sum()
        flat_idx = idx.reshape(-1)
        pair_tile = jnp.full((max_pairs,), sentinel, dtype=jnp.int32).at[
            flat_idx
        ].set(jnp.broadcast_to(tile, pair_ok.shape).reshape(-1).astype(jnp.int32),
              mode="drop")
        depth_b = jnp.broadcast_to(depths[:, None], pair_ok.shape).reshape(-1)
        pair_depth = jnp.full((max_pairs,), jnp.inf).at[flat_idx].set(
            depth_b.astype(jnp.float32), mode="drop")
        gid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], pair_ok.shape
        ).reshape(-1)
        pair_id = jnp.zeros((max_pairs,), jnp.int32).at[flat_idx].set(
            gid, mode="drop")
        if upto == 3:
            return pair_tile.sum() + pair_depth[0] + pair_id.sum()
        sorted_tile, _sd, sorted_id = jax.lax.sort(
            (pair_tile, pair_depth, pair_id), dimension=-1, num_keys=2
        )
        if upto == 4:
            return sorted_tile.sum() + sorted_id.sum()
        tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(jnp.int32)
        tile_counts = ends - starts
        if upto == 5:
            return tile_counts.sum()
        slot = jnp.arange(capacity, dtype=jnp.int32)[None, :]
        gather_idx = starts[:, None] + slot
        tile_mask = slot < tile_counts[:, None]
        gather_idx = jnp.where(tile_mask, gather_idx, 0)
        tile_gauss = sorted_id[gather_idx]
        return tile_gauss.sum()

    import functools

    for upto, name in [(1, "spans+cumsum"), (2, "enumerate"),
                       (3, "scatter"), (4, "sort"), (5, "searchsorted"),
                       (6, "final gather")]:
        f = jax.jit(functools.partial(stages, upto=upto))
        dt = timeit(lambda a, b, c, d: f(a, b, c, d),
                    lambda i: (m2d + i * 1e-6, radii, depths, valid))
        print(f"upto {name:14s}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
