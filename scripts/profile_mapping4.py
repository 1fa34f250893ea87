#!/usr/bin/env python3
"""Why is CHAINED mapping_step slow? Per-iteration timing + compile logs +
aval comparison between inputs and outputs."""

import logging
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_log_compiles", True)
    logging.basicConfig(level=logging.WARNING)

    from gslam_tpu.mapping.backend_ops import (
        MapConfig, init_pose_adam, mapping_step,
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

    def avals(tree, name):
        return {f"{name}.{i}": (x.shape, str(x.dtype), x.aval.weak_type)
                for i, x in enumerate(jax.tree_util.tree_leaves(tree))}

    in_avals = {}
    in_avals.update(avals(gmap, "gmap"))
    in_avals.update(avals(opt_state, "opt"))
    in_avals.update(avals(kf, "kf"))
    in_avals.update(avals(pose_opt, "popt"))

    for it in range(6):
        t0 = time.time()
        gmap, opt_state, kf, pose_opt, aux = mapping_step(
            gmap, opt_state, kf, pose_opt, widx, wmask, K, W, H, cfg)
        jax.block_until_ready(aux.total_loss)
        print(f"iter {it}: {(time.time()-t0)*1e3:9.1f} ms", flush=True)
        if it == 0:
            out_avals = {}
            out_avals.update(avals(gmap, "gmap"))
            out_avals.update(avals(opt_state, "opt"))
            out_avals.update(avals(kf, "kf"))
            out_avals.update(avals(pose_opt, "popt"))
            for k in in_avals:
                if in_avals[k] != out_avals.get(k):
                    print(f"  AVAL CHANGE {k}: {in_avals[k]} -> "
                          f"{out_avals.get(k)}", flush=True)


if __name__ == "__main__":
    main()
