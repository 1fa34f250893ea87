#!/usr/bin/env python3
"""Test unique_indices scatter + direct big-sort alternatives."""

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
    K = 256
    MAXP = 8 * N
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
    rcfg = RenderConfig()
    eye = jnp.eye(4)
    ts, tiles_x, tiles_y = 16, 20, 15
    p = project_gaussians(
        means=gmap.means, quats=gmap.quats, scales=jnp.exp(gmap.log_scales),
        viewmat=eye, K=Kmat, width=W, height=H, near=rcfg.near, far=rcfg.far,
        eps2d=rcfg.eps2d, radius_clip=rcfg.radius_clip, alive=gmap.alive,
    )
    m2d = jax.block_until_ready(p.means2d)
    radii = jax.block_until_ready(p.radii * 1.5)
    depths = jax.block_until_ready(p.depths)
    valid = jax.block_until_ready(p.valid)
    max_span = 16

    def front(m2d, radii, depths, valid):
        x, y = m2d[:, 0], m2d[:, 1]
        r = radii
        tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((x + r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((y + r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        span_x = tx1 - tx0 + 1
        span_y = ty1 - ty0 + 1
        counts = jnp.where(valid, span_x * span_y, 0)
        offsets = jnp.cumsum(counts) - counts
        k = jnp.arange(K, dtype=jnp.int32)
        dy = (k // max_span)[None, :]
        dx = (k % max_span)[None, :]
        pair_ok = (dx < span_x[:, None]) & (dy < span_y[:, None]) & valid[:, None]
        j = dy * span_x[:, None] + dx
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        idx = jnp.where(pair_ok, offsets[:, None] + j, MAXP).reshape(-1)
        return idx, tile, pair_ok

    @jax.jit
    def scatter_unique(m2d, radii, depths, valid):
        idx, tile, pair_ok = front(m2d, radii, depths, valid)
        pt = jnp.full((MAXP,), 300, jnp.int32).at[idx].set(
            tile.reshape(-1), mode="drop", unique_indices=True)
        db = jnp.broadcast_to(depths[:, None], (N, K)).reshape(-1)
        pd = jnp.full((MAXP,), jnp.inf).at[idx].set(
            db, mode="drop", unique_indices=True)
        gid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)).reshape(-1)
        pi = jnp.zeros((MAXP,), jnp.int32).at[idx].set(
            gid, mode="drop", unique_indices=True)
        return pt.sum() + pd[0] + pi.sum()

    dt = timeit(lambda a, b, c, d: scatter_unique(a, b, c, d),
                lambda i: (m2d + i * 1e-6, radii, depths, valid))
    print(f"3 scatters unique:        {dt*1e3:8.2f} ms", flush=True)

    # one packed scatter (tile 9b | depth-quant 14b | low bits spare) + id
    @jax.jit
    def scatter_packed(m2d, radii, depths, valid):
        idx, tile, pair_ok = front(m2d, radii, depths, valid)
        dq = jnp.clip((depths * 1024.0), 0, (1 << 14) - 1).astype(jnp.int32)
        key = (tile.reshape(-1) << 14) | jnp.broadcast_to(
            dq[:, None], (N, K)).reshape(-1)
        pk = jnp.full((MAXP,), jnp.int32(2**30)).at[idx].set(
            key, mode="drop", unique_indices=True)
        gid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)).reshape(-1)
        pi = jnp.zeros((MAXP,), jnp.int32).at[idx].set(
            gid, mode="drop", unique_indices=True)
        ks, ids = jax.lax.sort((pk, pi), dimension=-1, num_keys=1)
        return ks.sum() + ids.sum()

    dt = timeit(lambda a, b, c, d: scatter_packed(a, b, c, d),
                lambda i: (m2d + i * 1e-6, radii, depths, valid))
    print(f"packed scatter + sort:    {dt*1e3:8.2f} ms", flush=True)

    # no scatter at all: sort the 12.8M enumeration directly
    @jax.jit
    def direct_sort(m2d, radii, depths, valid):
        _, tile, pair_ok = front(m2d, radii, depths, valid)
        dq = jnp.clip((depths * 1024.0), 0, (1 << 14) - 1).astype(jnp.int32)
        key = jnp.where(
            pair_ok, (tile << 14) | dq[:, None], jnp.int32(2**30)
        ).reshape(-1)
        gid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)).reshape(-1)
        ks, ids = jax.lax.sort((key, gid), dimension=-1, num_keys=1)
        return ks[:MAXP].sum() + ids[:MAXP].sum()

    dt = timeit(lambda a, b, c, d: direct_sort(a, b, c, d),
                lambda i: (m2d + i * 1e-6, radii, depths, valid))
    print(f"direct 12.8M sort:        {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
