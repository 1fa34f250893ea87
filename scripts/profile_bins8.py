#!/usr/bin/env python3
"""Bisect bins6-fast (0.1ms) vs bins7-slow (183ms): same scatters, front-end
with and without the big-splat clamp, same process."""

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

    def front(m2d, radii, depths, valid, clamp):
        x, y = m2d[:, 0], m2d[:, 1]
        r = radii
        tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((x + r) / ts), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((y + r) / ts), 0, tiles_y - 1).astype(jnp.int32)
        span_x = tx1 - tx0 + 1
        span_y = ty1 - ty0 + 1
        if clamp:
            tcx = jnp.clip(jnp.floor(x / ts), 0, tiles_x - 1).astype(jnp.int32)
            tcy = jnp.clip(jnp.floor(y / ts), 0, tiles_y - 1).astype(jnp.int32)
            big_x = span_x > max_span
            big_y = span_y > max_span
            tx0 = jnp.where(big_x, jnp.clip(tcx - max_span // 2, 0, tiles_x - max_span), tx0)
            ty0 = jnp.where(big_y, jnp.clip(tcy - max_span // 2, 0, tiles_y - max_span), ty0)
            span_x = jnp.where(big_x, max_span, span_x)
            span_y = jnp.where(big_y, max_span, span_y)
        counts = jnp.where(valid, span_x * span_y, 0)
        offsets = jnp.cumsum(counts) - counts
        k = jnp.arange(K, dtype=jnp.int32)
        dy = (k // max_span)[None, :]
        dx = (k % max_span)[None, :]
        pair_ok = (dx < span_x[:, None]) & (dy < span_y[:, None]) & valid[:, None]
        j = dy * span_x[:, None] + dx
        tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)
        idx = jnp.where(pair_ok, offsets[:, None] + j, MAXP)
        return idx.reshape(-1), tile, pair_ok

    def make(clamp):
        @jax.jit
        def f(m2d, radii, depths, valid):
            flat_idx, tile, pair_ok = front(m2d, radii, depths, valid, clamp)
            pt = jnp.full((MAXP,), 300, jnp.int32).at[flat_idx].set(
                jnp.broadcast_to(tile, pair_ok.shape).reshape(-1),
                mode="drop", unique_indices=True)
            pd = jnp.full((MAXP,), jnp.inf).at[flat_idx].set(
                jnp.broadcast_to(depths[:, None], pair_ok.shape).reshape(-1),
                mode="drop", unique_indices=True)
            pi = jnp.zeros((MAXP,), jnp.int32).at[flat_idx].set(
                jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                                 pair_ok.shape).reshape(-1),
                mode="drop", unique_indices=True)
            return pt.sum() + pd[0] + pi.sum()
        return f

    for name, clamp in [("no clamp (bins6)", False), ("with clamp (bins7)", True)]:
        fn = make(clamp)
        dt = timeit(lambda a, b, c, d, f=fn: f(a, b, c, d),
                    lambda i: (m2d + i * 1e-6, radii, depths, valid))
        print(f"{name:24s}{dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
