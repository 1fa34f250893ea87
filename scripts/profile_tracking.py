#!/usr/bin/env python3
"""Attribute per-frame tracking time on chip: bare-eval scan vs the full
optimizer loop vs kernel pieces. Follows docs/PERF.md measurement rules
(vary inputs every iteration, args not closures, warm rounds first)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, args_fn, iters=20, warm=3):
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
    from gslam_tpu.ops.blend_pallas import blend_tiles_rows
    from gslam_tpu.tracking.track import TrackingConfig, track_frame
    from gslam_tpu.core.transforms import PoseDelta, pose_matrix
    from gslam_tpu.ops.losses import apply_exposure, tracking_photometric
    from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs
    from functools import partial

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

    # ---- 1. full track_frame ----
    def tf(pose, img):
        return track_frame(gmap, pose, jnp.zeros(2), img, K, W, H, tcfg)

    dt = timeit(
        lambda p, i: tf(p, i).pose,
        lambda i: (eye.at[0, 3].add(i * 1e-6), gt_img + i * 1e-7),
        iters=10,
    )
    evals = tcfg.warmup_steps + 1 + tcfg.lbfgs_max_eval
    print(f"track_frame:            {dt*1e3:8.2f} ms  ({evals} evals, "
          f"{dt*1e3/evals:.2f} ms/eval)", flush=True)

    # ---- 2. bare scan of the same eval ----
    bins = compute_bins(
        gmap.means, gmap.quats, gmap.log_scales, gmap.alive,
        eye[None], K[None], W, H, rcfg, radius_scale=1.5,
    )
    tiles = gather_tracking_tiles(gmap, bins)

    @partial(jax.jit, static_argnames=())
    def bare_scan(tiles, base_pose, gt, n_arr):
        def loss_fn(x):
            pose = pose_matrix(PoseDelta(base_pose, x[:6], x[6:9]))
            rgb, depth, beta, _a = render_tracking_fused(
                tiles, pose, K, W, H, rcfg
            )
            rgb = apply_exposure(rgb, x[9:11])
            return tracking_photometric(rgb, gt, beta, "active-nerf")

        fg = jax.value_and_grad(loss_fn)

        def step(c, _):
            f, g = fg(c)
            return c - 1e-6 * g, f

        out, fs = jax.lax.scan(step, n_arr, None, length=36)
        return out, fs

    x0 = jnp.concatenate([jnp.zeros(9), jnp.zeros(2)])
    dt = timeit(
        lambda t_, p, g: bare_scan(t_, p, g, x0)[0],
        lambda i: (tiles, eye.at[0, 3].add(i * 1e-6), gt_img + i * 1e-7),
        iters=10,
    )
    print(f"bare scan 36 evals:     {dt*1e3:8.2f} ms  ({dt*1e3/36:.2f} ms/eval)",
          flush=True)

    # ---- 3. the same loss through warmup_lbfgs (the real optimizer) ----
    @jax.jit
    def opt_loop(tiles, base_pose, gt, x0):
        def loss_fn(x):
            pose = pose_matrix(PoseDelta(base_pose, x[:6], x[6:9]))
            rgb, depth, beta, _a = render_tracking_fused(
                tiles, pose, K, W, H, rcfg
            )
            rgb = apply_exposure(rgb, x[9:11])
            return tracking_photometric(rgb, gt, beta, "active-nerf")

        return warmup_lbfgs(loss_fn, x0, warmup_steps=10, max_iter=20,
                            max_eval=25, history=5, lr=0.002,
                            warmup_lr=0.002)[0]

    dt = timeit(
        lambda t_, p, g: opt_loop(t_, p, g, x0),
        lambda i: (tiles, eye.at[0, 3].add(i * 1e-6), gt_img + i * 1e-7),
        iters=10,
    )
    print(f"warmup_lbfgs 36 evals:  {dt*1e3:8.2f} ms  ({dt*1e3/36:.2f} ms/eval)",
          flush=True)

    # ---- 4. single eval fwd+bwd (unscanned) ----
    @jax.jit
    def one_eval(tiles, base_pose, gt, x):
        def loss_fn(x):
            pose = pose_matrix(PoseDelta(base_pose, x[:6], x[6:9]))
            rgb, depth, beta, _a = render_tracking_fused(
                tiles, pose, K, W, H, rcfg
            )
            rgb = apply_exposure(rgb, x[9:11])
            return tracking_photometric(rgb, gt, beta, "active-nerf")

        return jax.value_and_grad(loss_fn)(x)

    dt = timeit(
        lambda t_, p, g, x: one_eval(t_, p, g, x)[0],
        lambda i: (tiles, eye.at[0, 3].add(i * 1e-6), gt_img + i * 1e-7,
                   x0 + i * 1e-8),
    )
    print(f"one eval fwd+bwd:       {dt*1e3:8.2f} ms", flush=True)

    # ---- 5. fused render fwd only ----
    @jax.jit
    def fwd_only(tiles, pose):
        rgb, depth, beta, _ = render_tracking_fused(tiles, pose, K, W, H, rcfg)
        return jnp.sum(rgb)

    dt = timeit(
        lambda t_, p: fwd_only(t_, p),
        lambda i: (tiles, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"fused render fwd:       {dt*1e3:8.2f} ms", flush=True)

    # ---- 6. blend kernel fwd only (row layout, same shapes) ----
    T_tiles = tiles.m3d.shape[0]
    M = tiles.m3d.shape[2]
    xy = jnp.asarray(rng.uniform(0, W, (T_tiles, 2, M)).astype(np.float32))
    con = jnp.tile(
        jnp.asarray([0.3, 0.0, 0.3], jnp.float32)[None, :, None], (T_tiles, 1, M)
    )
    op = jnp.full((T_tiles, 1, M), 0.5)
    feat = jnp.asarray(rng.random((T_tiles, 5, M)).astype(np.float32))

    @jax.jit
    def blend_fwd(xy, con, op, feat):
        out, tf_, _ = blend_tiles_rows(
            xy, con, op, feat, 16, W // 16, (1 / 255.0, 0.999, 0.5)
        )
        return jnp.sum(out) + jnp.sum(tf_)

    dt = timeit(
        lambda a, b, c, d: blend_fwd(a, b, c, d),
        lambda i: (xy + i * 1e-6, con, op, feat),
    )
    print(f"blend kernel fwd:       {dt*1e3:8.2f} ms  "
          f"(T={T_tiles}, M={M})", flush=True)

    @jax.jit
    def blend_fwdbwd(xy, con, op, feat):
        def f(xy, con, op, feat):
            out, tf_, _ = blend_tiles_rows(
                xy, con, op, feat, 16, W // 16, (1 / 255.0, 0.999, 0.5)
            )
            return jnp.sum(out) + jnp.sum(tf_)

        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(xy, con, op, feat)[0]

    dt = timeit(
        lambda a, b, c, d: blend_fwdbwd(a, b, c, d),
        lambda i: (xy + i * 1e-6, con, op, feat),
    )
    print(f"blend kernel fwd+bwd:   {dt*1e3:8.2f} ms", flush=True)

    # ---- 7. compute_bins ----
    dt = timeit(
        lambda m, q: compute_bins(
            m, q, gmap.log_scales, gmap.alive, eye[None], K[None], W, H, rcfg,
            radius_scale=1.5,
        ).n_pairs,
        lambda i: (gmap.means + i * 1e-7, gmap.quats),
    )
    print(f"compute_bins:           {dt*1e3:8.2f} ms", flush=True)

    # ---- 8. gather_tracking_tiles ----
    dt = timeit(
        lambda m: gather_tracking_tiles(gmap._replace(means=m), bins).m3d,
        lambda i: (gmap.means + i * 1e-7,),
    )
    print(f"gather_tracking_tiles:  {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
