#!/usr/bin/env python3
"""Cumulative bisection of the CURRENT bin_gaussians (with unique_indices):
real projected inputs, stages added one at a time, all args passed (no big
closures)."""

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
    from gslam_tpu.ops.binning import bin_gaussians

    W, H = 320, 240
    N = 50_000
    rng = np.random.default_rng(0)
    fx = fy = 280.0
    Kmat = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
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
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    eye = jnp.eye(4)
    ts, tiles_x, tiles_y = 16, W // 16, H // 16
    num_tiles = tiles_x * tiles_y
    MAXP = rcfg.pairs_per_gaussian * N
    CAP = rcfg.tile_capacity
    max_span = 16

    p = project_gaussians(
        means=gmap.means, quats=gmap.quats, scales=jnp.exp(gmap.log_scales),
        viewmat=eye, K=Kmat, width=W, height=H, near=rcfg.near, far=rcfg.far,
        eps2d=rcfg.eps2d, radius_clip=rcfg.radius_clip, alive=gmap.alive,
    )
    m2d = jax.block_until_ready(p.means2d)
    radii = jax.block_until_ready(p.radii * 1.5)
    depths = jax.block_until_ready(p.depths)
    valid = jax.block_until_ready(p.valid)

    print(f"device: {jax.devices()[0]}", flush=True)
    # NB: do NOT compute radii[valid].mean() here — eager boolean indexing
    # builds a big-constants executable that poisons every subsequent
    # dispatch in this process to ~180 ms (see .claude/skills/verify).

    # stage helpers share the real front-end (incl. big-splat clamping)
    def front(m2d, radii, depths, valid):
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
        k = jnp.arange(max_span * max_span, dtype=jnp.int32)
        dy = (k // max_span)[None, :]
        dx = (k % max_span)[None, :]
        pair_ok = (dx < span_x[:, None]) & (dy < span_y[:, None]) & valid[:, None]
        j = dy * span_x[:, None] + dx
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        idx = jnp.where(pair_ok, offsets[:, None] + j, MAXP)
        return idx.reshape(-1), tile, pair_ok

    def scatters(m2d, radii, depths, valid):
        flat_idx, tile, pair_ok = front(m2d, radii, depths, valid)
        pt = jnp.full((MAXP,), num_tiles, jnp.int32).at[flat_idx].set(
            jnp.broadcast_to(tile, pair_ok.shape).reshape(-1),
            mode="drop", unique_indices=True)
        pd = jnp.full((MAXP,), jnp.inf).at[flat_idx].set(
            jnp.broadcast_to(depths[:, None], pair_ok.shape).reshape(-1),
            mode="drop", unique_indices=True)
        pi = jnp.zeros((MAXP,), jnp.int32).at[flat_idx].set(
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                             pair_ok.shape).reshape(-1),
            mode="drop", unique_indices=True)
        return pt, pd, pi

    @jax.jit
    def s_scatter(m2d, radii, depths, valid):
        pt, pd, pi = scatters(m2d, radii, depths, valid)
        return pt.sum() + pd[0] + pi.sum()

    @jax.jit
    def s_sort(m2d, radii, depths, valid):
        pt, pd, pi = scatters(m2d, radii, depths, valid)
        st, sd, si = jax.lax.sort((pt, pd, pi), dimension=-1, num_keys=2)
        return st.sum() + sd[0] + si.sum()

    @jax.jit
    def s_search(m2d, radii, depths, valid):
        pt, pd, pi = scatters(m2d, radii, depths, valid)
        st, sd, si = jax.lax.sort((pt, pd, pi), dimension=-1, num_keys=2)
        tr = jnp.arange(num_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(st, tr, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(st, tr, side="right").astype(jnp.int32)
        return starts.sum() + ends.sum() + si.sum()

    @jax.jit
    def s_full(m2d, radii, depths, valid):
        b = bin_gaussians(m2d, radii, depths, valid, ts, tiles_x, tiles_y,
                          MAXP, CAP)
        return b.tile_gauss.sum() + b.tile_counts.sum() + b.n_pairs

    for name, fn in [("scatters only", s_scatter), ("+ sort", s_sort),
                     ("+ searchsorted", s_search), ("full bin_gaussians", s_full)]:
        dt = timeit(lambda a, b, c, d, f=fn: f(a, b, c, d),
                    lambda i: (m2d + i * 1e-6, radii, depths, valid))
        print(f"{name:24s}{dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
