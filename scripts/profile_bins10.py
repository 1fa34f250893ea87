#!/usr/bin/env python3
"""Is vmap over the camera axis what makes the binning scatter slow?"""

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
    ts, tiles_x, tiles_y = 16, 20, 15
    MAXP = 8 * N
    print(f"device: {jax.devices()[0]}", flush=True)

    def one(means, quats, log_scales, alive, vm, K):
        proj = project_gaussians(
            means, quats, jnp.exp(log_scales), vm, K, W, H,
            near=rcfg.near, far=rcfg.far, eps2d=rcfg.eps2d,
            radius_clip=rcfg.radius_clip, alive=alive,
        )
        b = bin_gaussians(
            proj.means2d, proj.radii * 1.5, proj.depths, proj.valid,
            ts, tiles_x, tiles_y, MAXP, rcfg.tile_capacity,
        )
        return b.tile_gauss.sum() + b.n_pairs

    # A. no vmap, single camera
    f_novmap = jax.jit(one)
    dt = timeit(
        lambda m, p: f_novmap(m, gmap.quats, gmap.log_scales, gmap.alive, p, Kmat),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins no vmap:        {dt*1e3:8.2f} ms", flush=True)

    # B. vmap over C=1
    f_vmap = jax.jit(
        lambda m, q, s, a, vms, Ks: jax.vmap(
            lambda vm, K: one(m, q, s, a, vm, K)
        )(vms, Ks).sum()
    )
    dt = timeit(
        lambda m, p: f_vmap(m, gmap.quats, gmap.log_scales, gmap.alive,
                            p[None], Kmat[None]),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins vmap C=1:       {dt*1e3:8.2f} ms", flush=True)

    # C. lax.map over C=1
    f_lmap = jax.jit(
        lambda m, q, s, a, vms, Ks: jax.lax.map(
            lambda vk: one(m, q, s, a, vk[0], vk[1]), (vms, Ks)
        ).sum()
    )
    dt = timeit(
        lambda m, p: f_lmap(m, gmap.quats, gmap.log_scales, gmap.alive,
                            p[None], Kmat[None]),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins lax.map C=1:    {dt*1e3:8.2f} ms", flush=True)

    # D. python loop over C=10 (mapping window shape), no vmap
    @jax.jit
    def f_loop10(m, q, s, a, vms, Ks):
        tot = jnp.int32(0)
        for c in range(10):
            tot = tot + one(m, q, s, a, vms[c], Ks[c])
        return tot

    vms10 = jnp.tile(eye[None], (10, 1, 1))
    Ks10 = jnp.tile(Kmat[None], (10, 1, 1))
    dt = timeit(
        lambda m, p: f_loop10(m, gmap.quats, gmap.log_scales, gmap.alive,
                              p, Ks10),
        lambda i: (gmap.means + i * 1e-7, vms10.at[:, 0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins loop C=10:      {dt*1e3:8.2f} ms", flush=True)

    # E. vmap over C=10
    dt = timeit(
        lambda m, p: f_vmap(m, gmap.quats, gmap.log_scales, gmap.alive,
                            p, Ks10),
        lambda i: (gmap.means + i * 1e-7, vms10.at[:, 0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins vmap C=10:      {dt*1e3:8.2f} ms", flush=True)

    # F. the real compute_bins (same call shape as track_frame), same process
    from gslam_tpu.ops.rasterize import compute_bins

    @jax.jit
    def f_cb(means, quats, log_scales, alive, pose):
        b = compute_bins(means, quats, log_scales, alive, pose[None],
                         Kmat[None], W, H, rcfg, radius_scale=1.5)
        return b.tile_gauss.sum() + b.n_pairs.sum()

    dt = timeit(
        lambda m, p: f_cb(m, gmap.quats, gmap.log_scales, gmap.alive, p),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"real compute_bins:        {dt*1e3:8.2f} ms", flush=True)

    # G. compute_bins but returning only tile_gauss sum of valid entries
    @jax.jit
    def f_cb_mask(means, quats, log_scales, alive, pose):
        b = compute_bins(means, quats, log_scales, alive, pose[None],
                         Kmat[None], W, H, rcfg, radius_scale=1.5)
        return jnp.where(b.tile_mask, b.tile_gauss, 0).sum()

    dt = timeit(
        lambda m, p: f_cb_mask(m, gmap.quats, gmap.log_scales, gmap.alive, p),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"compute_bins w/ mask:     {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
