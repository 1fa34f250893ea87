#!/usr/bin/env python3
"""Identify which eager op class poisons subsequent dispatches: time the
(cached) mapping_step between eager op probes. First slow reading names
the poisoner."""

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
    from gslam_tpu.ops.rasterize import RenderConfig

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

    state = [gmap, opt_state, kf, pose_opt]

    def time_mapping(tag):
        nonlocal_state = state
        t0 = time.time()
        for _ in range(5):
            g, o, k2, p, aux = mapping_step(
                nonlocal_state[0], nonlocal_state[1], nonlocal_state[2],
                nonlocal_state[3], widx, wmask, K, W, H, cfg)
            nonlocal_state[0], nonlocal_state[1] = g, o
            nonlocal_state[2], nonlocal_state[3] = k2, p
            jax.block_until_ready(aux.total_loss)
        print(f"after {tag:28s}: {(time.time()-t0)/5*1e3:9.2f} ms/iter",
              flush=True)

    # warm up: until steady
    for _ in range(4):
        time_mapping("warmup")

    m = jnp.eye(4)
    ms = jnp.tile(m[None], (10, 1, 1))

    probes = [
        ("basic index x[0]", lambda: ms[0]),
        ("negative index x[-1]", lambda: ms[-1]),
        ("2d slice x[:3, 3]", lambda: m[:3, 3]),
        ("subtract slices", lambda: m[:3, 3] - ms[-1][:3, 3]),
        ("jnp.linalg.norm 3-vec", lambda: jnp.linalg.norm(m[:3, 3])),
        ("norm of subtract", lambda: jnp.linalg.norm(
            m[:3, 3] - ms[-1][:3, 3])),
        ("float() of it", lambda: float(jnp.linalg.norm(
            m[:3, 3] - ms[-1][:3, 3]))),
    ]
    for tag, fn in probes:
        out = fn()
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
        time_mapping(tag)


if __name__ == "__main__":
    main()
