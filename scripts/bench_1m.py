#!/usr/bin/env python3
"""BASELINE config-3 scale evidence: render + mapping_step at 1M splat
capacity on one chip, within HBM. Prints one JSON line.

Timing style per docs/PERF.md: enqueue N chained steps, block on the final
output; no readbacks before the timed region ends."""

import json
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
    from gslam_tpu.mapping.gaussians import compact_map, empty_map
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.ops.rasterize import RenderConfig, render

    W, H = 640, 480
    CAP = 1 << 20  # 1,048,576
    N_LIVE = 1_000_000
    KF_CAP = 16
    WINDOW = 10
    rng = np.random.default_rng(0)
    fx = fy = 560.0
    K = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)

    z = rng.uniform(1.2, 6.0, CAP).astype(np.float32)
    u = rng.uniform(0, W, CAP).astype(np.float32)
    v = rng.uniform(0, H, CAP).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fy, z], -1)
    alive = np.zeros(CAP, bool)
    alive[:N_LIVE] = True
    gmap = empty_map(CAP)._replace(
        means=jnp.asarray(means),
        quats=jnp.asarray(rng.normal(size=(CAP, 4)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.002, 0.008, (CAP, 3)) * z[:, None]).astype(np.float32)
        ),
        logit_opacities=jnp.full((CAP,), 0.5),
        logit_colors=jnp.asarray(rng.normal(size=(CAP, 3)).astype(np.float32)),
        log_uncertainties=jnp.zeros((CAP,)),
        alive=jnp.asarray(alive),
    )
    # pairs budget: 4/gaussian at 1M splats = 4M pairs/camera
    rcfg = RenderConfig(tile_capacity=256, tile_chunk=60, pairs_per_gaussian=4)
    cfg = MapConfig(window_size=WINDOW, render=rcfg)
    kf = empty_keyframes(KF_CAP, H, W)
    for slot in range(12):
        img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
        pose = jnp.eye(4).at[0, 3].add(0.02 * slot)
        kf = add_keyframe(kf, slot, img, pose, jnp.zeros(2), slot)
    opt_state = init_adam(gmap)
    pose_opt = init_pose_adam(KF_CAP)
    widx = jnp.asarray(np.arange(WINDOW) + 2, jnp.int32)
    wmask = jnp.ones(WINDOW, bool)

    # single-view render at 1M
    out = render(
        **gmap.render_kwargs(), viewmats=jnp.eye(4)[None], Ks=K[None],
        width=W, height=H, cfg=rcfg,
    )
    jax.block_until_ready(out.rgb)
    t0 = time.time()
    reps = 10
    for i in range(reps):
        out = render(
            **gmap.render_kwargs(),
            viewmats=jnp.eye(4).at[0, 3].add(i * 1e-6)[None], Ks=K[None],
            width=W, height=H, cfg=rcfg,
        )
    jax.block_until_ready(out.rgb)
    render_ms = (time.time() - t0) / reps * 1e3

    # compaction at 1M
    g2, o2 = compact_map(gmap, opt_state)
    jax.block_until_ready(g2.alive)
    t0 = time.time()
    for _ in range(5):
        g2, o2 = compact_map(g2, o2)
    jax.block_until_ready(g2.alive)
    compact_ms = (time.time() - t0) / 5 * 1e3

    # mapping step at 1M (adaptive warm-up for the committed-input recompile)
    st = [gmap, opt_state, kf, pose_opt]
    for _ in range(6):
        tw = time.time()
        g, o, k2, p, aux = mapping_step(st[0], st[1], st[2], st[3],
                                        widx, wmask, K, W, H, cfg)
        st[0], st[1], st[2], st[3] = g, o, k2, p
        jax.block_until_ready(aux.total_loss)
        if time.time() - tw < 0.25:
            break
    t0 = time.time()
    iters = 15
    for _ in range(iters):
        g, o, k2, p, aux = mapping_step(st[0], st[1], st[2], st[3],
                                        widx, wmask, K, W, H, cfg)
        st[0], st[1], st[2], st[3] = g, o, k2, p
    jax.block_until_ready(aux.total_loss)
    map_ms = (time.time() - t0) / iters * 1e3

    result = {
        "metric": "1M-splat capacity: render + mapping on chip (640x480)",
        "value": round(map_ms, 2),
        "unit": "ms/mapping-iter",
        "detail": {
            "capacity": CAP,
            "n_live": N_LIVE,
            "render_ms": round(render_ms, 2),
            "compact_ms": round(compact_ms, 2),
            "mapping_iter_ms": round(map_ms, 2),
            "mapping_passes_per_s": round(1.0 / (15 * map_ms / 1e3), 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
