#!/usr/bin/env python3
"""Is the ~9.4s real-mode cost per-DISPATCH (flat) or per-WORK?
Compare drained cost of: 1-iter mapping dispatch vs 15-iter scan'd
dispatch. If both ~9.4s, the penalty is per-dispatch and batching wins."""

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

    body = mapping_step.__wrapped__

    @partial(jax.jit, static_argnames=("width", "height", "cfg", "n_iters"))
    def mapping_pass(gmap, opt_state, kf, pose_opt, widx, wmask, K,
                     width, height, cfg, n_iters):
        def one(carry, _):
            g, o, k2, p = carry
            g, o, k2, p, aux = body(g, o, k2, p, widx, wmask, K,
                                    width, height, cfg)
            return (g, o, k2, p), aux.photometric_loss

        (g, o, k2, p), losses = jax.lax.scan(
            one, (gmap, opt_state, kf, pose_opt), None, length=n_iters)
        return g, o, k2, p, losses

    # warm both (2 signatures each)
    st = [gmap, opt_state, kf, pose_opt]
    for _ in range(3):
        g, o, k2, p, aux = mapping_step(st[0], st[1], st[2], st[3],
                                        widx, wmask, K, W, H, cfg)
        st[0], st[1], st[2], st[3] = g, o, k2, p
    jax.block_until_ready(aux.total_loss)
    st2 = [gmap, opt_state, kf, pose_opt]
    for _ in range(3):
        g, o, k2, p, losses = mapping_pass(st2[0], st2[1], st2[2], st2[3],
                                           widx, wmask, K, W, H, cfg, 15)
        st2[0], st2[1], st2[2], st2[3] = g, o, k2, p
    jax.block_until_ready(losses)

    # A. drain cost of 5x 1-iter dispatches (will flip to real mode)
    t0 = time.time()
    for _ in range(5):
        g, o, k2, p, aux = mapping_step(st[0], st[1], st[2], st[3],
                                        widx, wmask, K, W, H, cfg)
        st[0], st[1], st[2], st[3] = g, o, k2, p
    l1 = float(aux.total_loss)
    tA = time.time() - t0
    print(f"5 x 1-iter dispatches drained: {tA:8.2f} s "
          f"({tA/5:6.2f} s/dispatch) loss={l1:.4f}", flush=True)

    # B. drain cost of 1x 15-iter scan dispatch (process already real mode)
    t0 = time.time()
    g, o, k2, p, losses = mapping_pass(st2[0], st2[1], st2[2], st2[3],
                                       widx, wmask, K, W, H, cfg, 15)
    st2[0], st2[1], st2[2], st2[3] = g, o, k2, p
    l2 = float(losses[-1])
    tB = time.time() - t0
    print(f"1 x 15-iter scan dispatch drained: {tB:8.2f} s "
          f"({tB/15*1e3:8.1f} ms/iter) loss={l2:.4f}", flush=True)

    # C. again (steady real mode)
    t0 = time.time()
    g, o, k2, p, losses = mapping_pass(st2[0], st2[1], st2[2], st2[3],
                                       widx, wmask, K, W, H, cfg, 15)
    l3 = float(losses[-1])
    tC = time.time() - t0
    print(f"1 x 15-iter scan again:        {tC:8.2f} s "
          f"({tC/15*1e3:8.1f} ms/iter) loss={l3:.4f}", flush=True)


if __name__ == "__main__":
    main()
