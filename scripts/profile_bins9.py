#!/usr/bin/env python3
"""Find the missing ~190ms in track_frame: projection+binning+gather fused
(as track_frame traces them) vs staged, plus a minimal warmup_lbfgs(2 evals)
+ bins program."""

import sys
import time
from functools import partial

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
    from gslam_tpu.ops.rasterize import RenderConfig, compute_bins
    from gslam_tpu.ops.track_fused import (
        gather_tracking_tiles, render_tracking_fused,
    )
    from gslam_tpu.core.transforms import PoseDelta, pose_matrix
    from gslam_tpu.ops.losses import apply_exposure, tracking_photometric
    from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs
    from gslam_tpu.tracking.track import TrackingConfig, track_frame

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
        logit_colors=jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 1.5),
        alive=jnp.ones((N,), bool),
    )
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    tcfg = TrackingConfig(render=rcfg)
    gt_img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    eye = jnp.eye(4)
    print(f"device: {jax.devices()[0]}", flush=True)

    # A. projection + bins (jitted together, gmap as args)
    @jax.jit
    def bins_only(means, quats, log_scales, alive, pose):
        b = compute_bins(means, quats, log_scales, alive, pose[None], K[None],
                         W, H, rcfg, radius_scale=1.5)
        return b.tile_gauss.sum() + b.n_pairs

    dt = timeit(
        lambda m, p: bins_only(m, gmap.quats, gmap.log_scales, gmap.alive, p),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins jitted:          {dt*1e3:8.2f} ms", flush=True)

    # B. + gather
    @jax.jit
    def bins_gather(means, quats, log_scales, opac, col, unc, alive, pose):
        g = gmap._replace(means=means, quats=quats, log_scales=log_scales,
                          logit_opacities=opac, logit_colors=col,
                          log_uncertainties=unc, alive=alive)
        b = compute_bins(means, quats, log_scales, alive, pose[None], K[None],
                         W, H, rcfg, radius_scale=1.5)
        t = gather_tracking_tiles(g, b)
        return t.m3d.sum()

    dt = timeit(
        lambda m, p: bins_gather(m, gmap.quats, gmap.log_scales,
                                 gmap.logit_opacities, gmap.logit_colors,
                                 gmap.log_uncertainties, gmap.alive, p),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"proj+bins+gather jitted:   {dt*1e3:8.2f} ms", flush=True)

    # C. bins + gather + 2-eval optimizer (mini track_frame)
    def make_tf(warmup, max_iter, max_eval):
        @partial(jax.jit, static_argnames=())
        def mini(means, quats, log_scales, opac, col, unc, alive, pose, gt):
            g = gmap._replace(means=means, quats=quats, log_scales=log_scales,
                              logit_opacities=opac, logit_colors=col,
                              log_uncertainties=unc, alive=alive)
            b = compute_bins(means, quats, log_scales, alive, pose[None],
                             K[None], W, H, rcfg, radius_scale=1.5)
            tiles = gather_tracking_tiles(g, b)

            def loss_fn(x):
                pm = pose_matrix(PoseDelta(pose, x[:6], x[6:9]))
                rgb, depth, beta, _a = render_tracking_fused(
                    tiles, pm, K, W, H, rcfg)
                rgb = apply_exposure(rgb, x[9:11])
                return tracking_photometric(rgb, gt, beta, "active-nerf")

            x, f, n = warmup_lbfgs(loss_fn, jnp.zeros(11),
                                   warmup_steps=warmup, max_iter=max_iter,
                                   max_eval=max_eval, history=5, lr=0.002,
                                   warmup_lr=0.002)
            return f
        return mini

    for wu, mi, me, label in [(1, 1, 1, "mini tf 3 evals"),
                              (10, 20, 25, "mini tf 36 evals")]:
        fn = make_tf(wu, mi, me)
        dt = timeit(
            lambda m, p, g, f=fn: f(m, gmap.quats, gmap.log_scales,
                                    gmap.logit_opacities, gmap.logit_colors,
                                    gmap.log_uncertainties, gmap.alive, p, g),
            lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6),
                       gt_img + i * 1e-7),
        )
        print(f"{label}:          {dt*1e3:8.2f} ms", flush=True)

    # D. the real track_frame for reference
    dt = timeit(
        lambda p, i_: track_frame(gmap, p, jnp.zeros(2), i_, K, W, H, tcfg).pose,
        lambda i: (eye.at[0, 3].add(i * 1e-6), gt_img + i * 1e-7),
    )
    print(f"real track_frame:          {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
