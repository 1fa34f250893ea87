#!/usr/bin/env python3
"""Bisect compute_bins: projection vs bin_gaussians vs vmap composition."""

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
    from functools import partial

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, compute_bins
    from gslam_tpu.ops.projection import project_gaussians
    from gslam_tpu.ops.binning import bin_gaussians

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
        logit_opacities=jnp.full((N,), 1.5),
        alive=jnp.ones((N,), bool),
    )
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    eye = jnp.eye(4)
    ts, tiles_x, tiles_y = 16, -(-W // 16), -(-H // 16)
    scales = jnp.exp(gmap.log_scales)

    print(f"device: {jax.devices()[0]}", flush=True)

    # projection only, no vmap
    @jax.jit
    def proj_only(means, quats, scales, vm):
        p = project_gaussians(
            means, quats, scales, vm, K, W, H,
            near=rcfg.near, far=rcfg.far, eps2d=rcfg.eps2d,
            radius_clip=rcfg.radius_clip, alive=gmap.alive,
        )
        return p.means2d, p.radii, p.depths, p.valid

    dt = timeit(lambda m, q, s, v_: proj_only(m, q, s, v_)[0],
                lambda i: (gmap.means + i * 1e-7, gmap.quats, scales, eye))
    print(f"projection (no vmap):   {dt*1e3:8.2f} ms", flush=True)

    m2d, radii, depths, valid = proj_only(gmap.means, gmap.quats, scales, eye)

    # bin_gaussians only, no vmap
    @jax.jit
    def bins_only(m2d, radii, depths, valid):
        return bin_gaussians(
            m2d, radii * 1.5, depths, valid, ts, tiles_x, tiles_y,
            8 * N, 512, 16,
        ).tile_gauss

    dt = timeit(lambda a, b, c, d: bins_only(a, b, c, d),
                lambda i: (m2d + i * 1e-6, radii, depths, valid))
    print(f"bin_gaussians (novmap): {dt*1e3:8.2f} ms", flush=True)

    # composed, no vmap
    @jax.jit
    def composed(means, quats, scales, vm):
        p = project_gaussians(
            means, quats, scales, vm, K, W, H,
            near=rcfg.near, far=rcfg.far, eps2d=rcfg.eps2d,
            radius_clip=rcfg.radius_clip, alive=gmap.alive,
        )
        return bin_gaussians(
            p.means2d, p.radii * 1.5, p.depths, p.valid, ts, tiles_x, tiles_y,
            8 * N, 512, 16,
        ).tile_gauss

    dt = timeit(lambda m, q, s, v_: composed(m, q, s, v_),
                lambda i: (gmap.means + i * 1e-7, gmap.quats, scales, eye))
    print(f"proj+bin (no vmap):     {dt*1e3:8.2f} ms", flush=True)

    # the actual compute_bins (vmap over 1 camera)
    dt = timeit(
        lambda m, q: compute_bins(
            m, q, gmap.log_scales, gmap.alive, eye[None], K[None], W, H, rcfg,
            radius_scale=1.5,
        ).tile_gauss,
        lambda i: (gmap.means + i * 1e-7, gmap.quats),
    )
    print(f"compute_bins (vmap C1): {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
