#!/usr/bin/env python3
"""[pallas-import probe] Bisect compute_bins (206ms) vs near-identical inline copy (1.4ms).
Variants toggle: barrier, tile_mask output, reduction placement, exp hoist."""

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

    import gslam_tpu.ops.track_fused  # pallas import side-effect probe
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
    cfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    eye = jnp.eye(4)
    print(f"device: {jax.devices()[0]}", flush=True)

    radius_scale = 1.5
    n = N
    ts = cfg.tile_size
    tiles_x = -(-W // ts)
    tiles_y = -(-H // ts)

    def cb_variant(barrier, mask_out, inner_sum, exp_inside):
        def compute(means, quats, log_scales, alive, viewmats, Ks):
            if not exp_inside:
                scales = jnp.exp(log_scales)

            def one(vm, K):
                s = jnp.exp(log_scales) if exp_inside else scales
                proj = project_gaussians(
                    means, quats, s, vm, K, W, H,
                    near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
                    radius_clip=cfg.radius_clip, alive=alive,
                )
                ins = (proj.means2d, proj.radii * radius_scale, proj.depths,
                       proj.valid)
                if barrier:
                    ins = jax.lax.optimization_barrier(ins)
                b = bin_gaussians(
                    ins[0], ins[1], ins[2], ins[3],
                    ts, tiles_x, tiles_y, int(cfg.pairs_per_gaussian * n),
                    cfg.tile_capacity, cfg.max_span,
                )
                if inner_sum:
                    return b.tile_gauss.sum() + b.n_pairs
                if mask_out:
                    return b.tile_gauss, b.tile_mask, b.n_pairs
                return b.tile_gauss, b.n_pairs

            out = jax.vmap(one)(viewmats, Ks)
            if inner_sum:
                return out.sum()
            if mask_out:
                tg, tm, np_ = out
                return tg.sum() + np_.sum()
            tg, np_ = out
            return tg.sum() + np_.sum()

        return jax.jit(compute)

    cases = [
        ("verbatim (barrier+mask)", dict(barrier=True, mask_out=True,
                                         inner_sum=False, exp_inside=False)),
        ("no barrier, mask out", dict(barrier=False, mask_out=True,
                                      inner_sum=False, exp_inside=False)),
        ("no barrier, no mask", dict(barrier=False, mask_out=False,
                                     inner_sum=False, exp_inside=False)),
        ("no barrier, inner sum", dict(barrier=False, mask_out=False,
                                       inner_sum=True, exp_inside=False)),
        ("barrier, inner sum", dict(barrier=True, mask_out=False,
                                    inner_sum=True, exp_inside=False)),
    ]
    for name, kw in cases:
        fn = cb_variant(**kw)
        dt = timeit(
            lambda m, p, f=fn: f(m, gmap.quats, gmap.log_scales, gmap.alive,
                                 p[None], Kmat[None]),
            lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
        )
        print(f"{name:28s}{dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
