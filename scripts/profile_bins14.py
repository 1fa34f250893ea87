#!/usr/bin/env python3
"""One process: real compute_bins wrapper vs verbatim local copy.
Time both, dump optimized HLO for both, report where they diverge."""

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

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, compute_bins
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
    cfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    eye = jnp.eye(4)
    print(f"device: {jax.devices()[0]}", flush=True)

    radius_scale = 1.5
    n = N
    ts = cfg.tile_size
    tiles_x = -(-W // ts)
    tiles_y = -(-H // ts)

    def real(means_, quats, log_scales, alive, pose):
        b = compute_bins(means_, quats, log_scales, alive, pose[None],
                         Kmat[None], W, H, cfg, radius_scale=1.5)
        return b.tile_gauss.sum() + b.n_pairs.sum()

    def copy(means_, quats, log_scales, alive, pose):
        viewmats, Ks = pose[None], Kmat[None]
        scales = jnp.exp(log_scales)

        def one(vm, K):
            proj = project_gaussians(
                means_, quats, scales, vm, K, W, H,
                near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
                radius_clip=cfg.radius_clip, alive=alive,
            )
            ins = jax.lax.optimization_barrier(
                (proj.means2d, proj.radii * radius_scale, proj.depths,
                 proj.valid))
            b = bin_gaussians(
                ins[0], ins[1], ins[2], ins[3],
                ts, tiles_x, tiles_y, int(cfg.pairs_per_gaussian * n),
                cfg.tile_capacity, cfg.max_span,
            )
            return b.tile_gauss, b.tile_mask, b.n_pairs

        tg, tm, np_ = jax.vmap(one)(viewmats, Ks)
        return tg.sum() + np_.sum()

    jreal = jax.jit(real)
    jcopy = jax.jit(copy)

    args = (gmap.means, gmap.quats, gmap.log_scales, gmap.alive, eye)
    lreal = jreal.lower(*args)
    lcopy = jcopy.lower(*args)
    with open("/tmp/hlo_real_unopt.txt", "w") as f:
        f.write(lreal.as_text())
    with open("/tmp/hlo_copy_unopt.txt", "w") as f:
        f.write(lcopy.as_text())
    creal = lreal.compile()
    ccopy = lcopy.compile()
    with open("/tmp/hlo_real_opt.txt", "w") as f:
        f.write(creal.as_text())
    with open("/tmp/hlo_copy_opt.txt", "w") as f:
        f.write(ccopy.as_text())
    print("HLO dumped", flush=True)

    dt = timeit(lambda m, p: jreal(m, gmap.quats, gmap.log_scales,
                                   gmap.alive, p),
                lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)))
    print(f"real compute_bins:   {dt*1e3:8.2f} ms", flush=True)
    dt = timeit(lambda m, p: jcopy(m, gmap.quats, gmap.log_scales,
                                   gmap.alive, p),
                lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)))
    print(f"verbatim copy:       {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
