#!/usr/bin/env python3
"""Ground truth: enqueue N dispatches, then force a readback and time the
full drain. drain/N bounds the true per-dispatch cost under pipelining.
Run for mapping_step and track_frame in the same process (readback last)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.mapping.backend_ops import (
        MapConfig, init_pose_adam, mapping_step,
    )
    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.ops.rasterize import RenderConfig, render
    from gslam_tpu.tracking.track import TrackingConfig, track_frame
    from gslam_tpu.core.transforms import se3_exp

    W, H, CAP, N_LIVE, KF_CAP, WINDOW = 320, 240, 131_072, 100_000, 32, 10
    rng = np.random.default_rng(0)
    fx = fy = 280.0
    K = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    z = rng.uniform(1.2, 4.5, CAP).astype(np.float32)
    u = rng.uniform(0, W, CAP).astype(np.float32)
    v = rng.uniform(0, H, CAP).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fy, z], -1)
    alive = np.zeros(CAP, bool)
    alive[:N_LIVE] = True
    gmap_big = empty_map(CAP)._replace(
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
    opt_state = init_adam(gmap_big)
    pose_opt = init_pose_adam(KF_CAP)
    widx = jnp.asarray(np.arange(WINDOW) + 2, jnp.int32)
    wmask = jnp.ones(WINDOW, bool)
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- tracking scenario (50k map) ---
    N_T = 50_000
    zt = rng.uniform(1.2, 4.5, N_T).astype(np.float32)
    ut = rng.uniform(0, W, N_T).astype(np.float32)
    vt = rng.uniform(0, H, N_T).astype(np.float32)
    mt = np.stack([(ut - W / 2) * zt / fx, (vt - H / 2) * zt / fy, zt], -1)
    gmap_t = empty_map(N_T)._replace(
        means=jnp.asarray(mt),
        quats=jnp.asarray(rng.normal(size=(N_T, 4)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.016, (N_T, 3)) * zt[:, None]).astype(np.float32)
        ),
        logit_opacities=jnp.full((N_T,), 1.5),
        logit_colors=jnp.asarray(rng.normal(size=(N_T, 3)).astype(np.float32) * 1.5),
        log_uncertainties=jnp.zeros((N_T,)),
        alive=jnp.ones((N_T,), bool),
    )
    tcfg = TrackingConfig(render=rcfg)
    n_frames = 20
    xis = rng.normal(scale=0.004, size=(n_frames, 6)).astype(np.float32)
    poses = []
    cur = jnp.eye(4)
    for i in range(n_frames):
        cur = se3_exp(jnp.asarray(xis[i])) @ cur
        poses.append(cur)
    poses = jnp.stack(poses)
    out = render(
        **gmap_t.render_kwargs(), viewmats=poses,
        Ks=jnp.tile(K[None], (n_frames, 1, 1)), width=W, height=H, cfg=rcfg,
    )
    gt_imgs = jnp.clip(out.rgb, 0.0, 1.0)
    jax.block_until_ready(gt_imgs)

    # warm both programs (2 signatures each)
    state = [gmap_big, opt_state, kf, pose_opt]
    for _ in range(3):
        g, o, k2, p, aux = mapping_step(state[0], state[1], state[2],
                                        state[3], widx, wmask, K, W, H, cfg)
        state[0], state[1], state[2], state[3] = g, o, k2, p
    jax.block_until_ready(aux.total_loss)
    r = track_frame(gmap_t, jnp.eye(4), jnp.zeros(2), gt_imgs[0], K, W, H, tcfg)
    r = track_frame(gmap_t, r.pose, r.exposure, gt_imgs[1], K, W, H, tcfg)
    jax.block_until_ready(r.pose)

    # --- TRACKING: enqueue 20 chained frames, then DRAIN via readback ---
    t0 = time.time()
    prev_pose, exposure = jnp.eye(4), jnp.zeros(2)
    for i in range(n_frames):
        res = track_frame(gmap_t, prev_pose, exposure, gt_imgs[i], K, W, H,
                          tcfg)
        prev_pose, exposure = res.pose, res.exposure
    t_enq = time.time() - t0
    final_np = np.asarray(prev_pose)  # READBACK: forces the drain
    t_total = time.time() - t0
    err = float(np.linalg.norm(final_np[:3, 3] - np.asarray(poses)[-1][:3, 3]))
    print(f"TRACK  enqueue {t_enq*1e3:9.1f} ms; total-with-drain "
          f"{t_total*1e3:9.1f} ms over {n_frames} frames -> "
          f"{t_total*1e3/n_frames:7.2f} ms/frame true; pose_err {err:.5f}",
          flush=True)

    # --- MAPPING: enqueue 20 chained iters, then DRAIN ---
    t0 = time.time()
    n_map = 20
    for _ in range(n_map):
        g, o, k2, p, aux = mapping_step(state[0], state[1], state[2],
                                        state[3], widx, wmask, K, W, H, cfg)
        state[0], state[1], state[2], state[3] = g, o, k2, p
    t_enq = time.time() - t0
    loss = float(aux.total_loss)  # READBACK drain
    t_total = time.time() - t0
    print(f"MAP    enqueue {t_enq*1e3:9.1f} ms; total-with-drain "
          f"{t_total*1e3:9.1f} ms over {n_map} iters -> "
          f"{t_total*1e3/n_map:7.2f} ms/iter true; loss {loss:.4f}",
          flush=True)

    # --- repeat both AFTER deactivation (process now in real mode) ---
    t0 = time.time()
    prev_pose, exposure = jnp.eye(4), jnp.zeros(2)
    for i in range(n_frames):
        res = track_frame(gmap_t, prev_pose, exposure, gt_imgs[i], K, W, H,
                          tcfg)
        prev_pose, exposure = res.pose, res.exposure
    _ = np.asarray(prev_pose)
    t_total = time.time() - t0
    print(f"TRACK real-mode: {t_total*1e3/n_frames:9.2f} ms/frame", flush=True)

    t0 = time.time()
    for _ in range(5):
        g, o, k2, p, aux = mapping_step(state[0], state[1], state[2],
                                        state[3], widx, wmask, K, W, H, cfg)
        state[0], state[1], state[2], state[3] = g, o, k2, p
    _ = float(aux.total_loss)
    t_total = time.time() - t0
    print(f"MAP   real-mode: {t_total*1e3/5:9.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
