#!/usr/bin/env python3
"""mapping_step slowness: donation? window-loss extras? Compare the same
body jitted with and without donate_argnums, plus the window loss alone."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.mapping.backend_ops import (
        MapConfig, _window_loss, init_pose_adam, mapping_step,
    )
    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.ops.rasterize import RenderConfig

    W, H = 320, 240
    CAP = 131_072
    N_LIVE = 100_000
    KF_CAP = 32
    WINDOW = 10
    rng = np.random.default_rng(0)
    fx = fy = 280.0
    K = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)

    z = rng.uniform(1.2, 4.5, CAP).astype(np.float32)
    u = rng.uniform(0, W, CAP).astype(np.float32)
    v = rng.uniform(0, H, CAP).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fy, z], -1)
    alive = np.zeros(CAP, bool)
    alive[:N_LIVE] = True
    gmap = empty_map(CAP)._replace(
        means=jnp.asarray(means),
        quats=jnp.asarray(rng.normal(size=(CAP, 4)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.016, (CAP, 3)) * z[:, None]).astype(np.float32)
        ),
        logit_opacities=jnp.full((CAP,), 1.5),
        logit_colors=jnp.asarray(rng.normal(size=(CAP, 3)).astype(np.float32)),
        log_uncertainties=jnp.zeros((CAP,)),
        alive=jnp.asarray(alive),
    )
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    cfg = MapConfig(window_size=WINDOW, render=rcfg)
    kf = empty_keyframes(KF_CAP, H, W)
    for slot in range(12):
        img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
        pose = jnp.eye(4).at[0, 3].add(0.01 * slot)
        kf = add_keyframe(kf, slot, img, pose, jnp.zeros(2), slot)
    opt_state = init_adam(gmap)
    pose_opt = init_pose_adam(KF_CAP)
    widx = jnp.asarray(np.arange(WINDOW) + 2, jnp.int32)
    wmask = jnp.ones(WINDOW, bool)
    print(f"device: {jax.devices()[0]}", flush=True)

    body = mapping_step.__wrapped__  # undecorated function

    # A. no donation
    f_nodon = partial(jax.jit, static_argnames=("width", "height", "cfg"))(body)
    outs = f_nodon(gmap, opt_state, kf, pose_opt, widx, wmask, K, W, H, cfg)
    jax.block_until_ready(outs[-1].total_loss)
    t0 = time.time()
    iters = 10
    for i in range(iters):
        outs = f_nodon(gmap._replace(means=gmap.means + i * 1e-7), opt_state,
                       kf, pose_opt, widx, wmask, K, W, H, cfg)
    jax.block_until_ready(outs[-1].total_loss)
    print(f"mapping_step NO donate: {(time.time()-t0)/iters*1e3:9.2f} ms",
          flush=True)

    # B. window loss value+grad only (what the step differentiates)
    @jax.jit
    def f_loss(gmap, kf, widx, wmask, K):
        safe_idx = jnp.where(wmask, widx, 0)
        gt_imgs = kf.images[safe_idx]
        gt_depths = kf.gt_depths[safe_idx]
        pose_base = kf.pose_base[safe_idx]
        pose_vec = jnp.concatenate(
            [kf.d_rot6[safe_idx], kf.d_t[safe_idx]], axis=-1)
        exposures = kf.exposures[safe_idx]
        Ks = jnp.tile(K[None], (WINDOW, 1, 1))
        probe = jnp.zeros((WINDOW, gmap.capacity, 2))
        grad_fn = jax.value_and_grad(_window_loss, argnums=(0, 2, 3),
                                     has_aux=True)
        (total, (photo, out)), (g_map, g_pose, g_probe) = grad_fn(
            gmap.trainable(), gmap, pose_vec, probe, pose_base,
            gt_imgs, gt_depths, exposures, wmask, Ks, W, H, cfg,
        )
        return (total + sum(v.sum() for v in g_map.values())
                + g_pose.sum() + g_probe.sum())

    out = f_loss(gmap, kf, widx, wmask, K)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = f_loss(gmap._replace(means=gmap.means + i * 1e-7), kf,
                     widx, wmask, K)
    jax.block_until_ready(out)
    print(f"window loss val+grad:   {(time.time()-t0)/iters*1e3:9.2f} ms",
          flush=True)

    # C. donated (the real entry) — rebind buffers each call
    gmap2, opt2, kf2, popt2, aux = mapping_step(
        gmap, opt_state, kf, pose_opt, widx, wmask, K, W, H, cfg)
    jax.block_until_ready(aux.total_loss)
    t0 = time.time()
    for _ in range(iters):
        gmap2, opt2, kf2, popt2, aux = mapping_step(
            gmap2, opt2, kf2, popt2, widx, wmask, K, W, H, cfg)
    jax.block_until_ready(aux.total_loss)
    print(f"mapping_step donated:   {(time.time()-t0)/iters*1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
