#!/usr/bin/env python3
"""Headline benchmark: tracking throughput on one chip.

Mirrors BASELINE.json config 1 — per-frame camera tracking against a
frozen 50k-splat map at 320x240 — and reports FPS against the 30 FPS
north-star target. Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, render
    from gslam_tpu.tracking.track import TrackingConfig, track_frame
    from gslam_tpu.core.transforms import se3_exp

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
        log_uncertainties=jnp.zeros((N,)),
        alive=jnp.ones((N,), bool),
    )

    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    tcfg = TrackingConfig(render=rcfg)

    # ground-truth frames along a gentle trajectory
    n_frames = 10
    xis = rng.normal(scale=0.004, size=(n_frames, 6)).astype(np.float32)
    poses = []
    cur = jnp.eye(4)
    for i in range(n_frames):
        cur = se3_exp(jnp.asarray(xis[i])) @ cur
        poses.append(cur)
    poses = jnp.stack(poses)
    out = render(
        **gmap.render_kwargs(),
        viewmats=poses, Ks=jnp.tile(K[None], (n_frames, 1, 1)),
        width=W, height=H, cfg=rcfg,
    )
    gt_imgs = jnp.clip(out.rgb, 0.0, 1.0)
    jax.block_until_ready(gt_imgs)

    # warm-up / compile
    res = track_frame(gmap, jnp.eye(4), jnp.zeros(2), gt_imgs[0], K, W, H, tcfg)
    jax.block_until_ready(res.pose)

    # timed tracking loop with constant-motion-style chaining (async
    # pipelined, the online-throughput number: dispatches overlap device
    # execution exactly as in the streaming SLAM loop)
    t0 = time.time()
    prev_pose = jnp.eye(4)
    exposure = jnp.zeros(2)
    errs = []
    for i in range(n_frames):
        res = track_frame(gmap, prev_pose, exposure, gt_imgs[i], K, W, H, tcfg)
        prev_pose, exposure = res.pose, res.exposure
        errs.append(res.pose)
    jax.block_until_ready(prev_pose)
    dt = time.time() - t0
    fps = n_frames / dt

    # synchronous per-frame latency (block after every frame: includes the
    # full host->device dispatch round-trip per call)
    t0 = time.time()
    prev_pose_s = jnp.eye(4)
    exposure_s = jnp.zeros(2)
    for i in range(n_frames):
        res = track_frame(
            gmap, prev_pose_s, exposure_s, gt_imgs[i], K, W, H, tcfg
        )
        prev_pose_s, exposure_s = res.pose, res.exposure
        jax.block_until_ready(prev_pose_s)
    dt_sync = time.time() - t0

    # sanity: final pose close to final gt pose
    pose_err = float(jnp.linalg.norm(prev_pose[:3, 3] - poses[-1][:3, 3]))

    # ---- mapping rate at the reference operating point: 10-camera window,
    # 131k-capacity buffer (100k live), 15 iters/pass
    # (/root/reference/gslam/backend.py:71-76) ----
    from gslam_tpu.mapping.backend_ops import (
        MapConfig, init_pose_adam, mapping_step,
    )
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam

    CAP, N_LIVE, KF_CAP, WINDOW = 131_072, 100_000, 32, 10
    zc = rng.uniform(1.2, 4.5, CAP).astype(np.float32)
    uc = rng.uniform(0, W, CAP).astype(np.float32)
    vc = rng.uniform(0, H, CAP).astype(np.float32)
    mc = np.stack([(uc - W / 2) * zc / fx, (vc - H / 2) * zc / fy, zc], -1)
    alive_m = np.zeros(CAP, bool)
    alive_m[:N_LIVE] = True
    mmap = type(gmap)(**{
        **gmap._asdict(),
        "means": jnp.asarray(mc),
        "quats": jnp.asarray(rng.normal(size=(CAP, 4)).astype(np.float32)),
        "log_scales": jnp.asarray(
            np.log(rng.uniform(0.004, 0.016, (CAP, 3)) * zc[:, None]).astype(
                np.float32)),
        "logit_opacities": jnp.full((CAP,), 1.5),
        "logit_colors": jnp.asarray(
            rng.normal(size=(CAP, 3)).astype(np.float32)),
        "log_uncertainties": jnp.zeros((CAP,)),
        "ages": jnp.zeros((CAP,), jnp.int32),
        "alive": jnp.asarray(alive_m),
    })
    mcfg = MapConfig(window_size=WINDOW, render=rcfg)
    kf = empty_keyframes(KF_CAP, H, W)
    for slot in range(12):
        img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
        kpose = jnp.eye(4).at[0, 3].add(0.01 * slot)
        kf = add_keyframe(kf, slot, img, kpose, jnp.zeros(2), slot)
    opt_state = init_adam(mmap)
    pose_opt = init_pose_adam(KF_CAP)
    widx = jnp.asarray(np.arange(WINDOW) + 2, jnp.int32)
    wmask = jnp.ones(WINDOW, bool)
    # Adaptive warm-up: the first call compiles against host-created
    # (uncommitted) inputs; chained calls see committed jit outputs — a
    # different jit cache key — and can compile again. Warm until a call
    # is actually fast so the timed loop measures steady state only.
    for _ in range(6):
        tw = time.time()
        mmap, opt_state, kf, pose_opt, maux = mapping_step(
            mmap, opt_state, kf, pose_opt, widx, wmask, K, W, H, mcfg)
        jax.block_until_ready(maux.total_loss)
        if time.time() - tw < 0.05:
            break
    t0 = time.time()
    map_iters = 30
    for _ in range(map_iters):
        mmap, opt_state, kf, pose_opt, maux = mapping_step(
            mmap, opt_state, kf, pose_opt, widx, wmask, K, W, H, mcfg)
    jax.block_until_ready(maux.total_loss)
    map_dt = (time.time() - t0) / map_iters
    mapping_hz = 1.0 / (15 * map_dt)  # passes/s at 15 iters per pass

    result = {
        "metric": "tracking FPS, frozen 50k-splat map @320x240 (1 chip)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "detail": {
            "mean_track_ms": round(1e3 * dt / n_frames, 2),
            "sync_track_ms": round(1e3 * dt_sync / n_frames, 2),
            "sync_fps": round(n_frames / dt_sync, 2),
            "n_evals_last_frame": int(res.n_evals),
            "final_pose_err_m": round(pose_err, 5),
            "mapping_iter_ms": round(1e3 * map_dt, 2),
            "mapping_passes_per_s": round(mapping_hz, 2),
            "mapping_op_point": "10-cam window, 131k cap (100k live), "
                                "320x240, 15 iters/pass, vs >=10 Hz target",
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
