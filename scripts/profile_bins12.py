#!/usr/bin/env python3
"""Is the 206ms compute_bins a stale persistent-cache executable?
Run the real compute_bins with the compile cache disabled."""

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

    # NO persistent compile cache here.

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, compute_bins
    from gslam_tpu.tracking.track import TrackingConfig, track_frame

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
        logit_opacities=jnp.full((N,), 1.5),
        logit_colors=jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 1.5),
        alive=jnp.ones((N,), bool),
    )
    cfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    tcfg = TrackingConfig(render=cfg)
    gt_img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    eye = jnp.eye(4)
    print(f"device: {jax.devices()[0]}", flush=True)

    @jax.jit
    def f_cb(means, quats, log_scales, alive, pose):
        b = compute_bins(means, quats, log_scales, alive, pose[None],
                         Kmat[None], W, H, cfg, radius_scale=1.5)
        return b.tile_gauss.sum() + b.n_pairs.sum()

    t0 = time.time()
    dt = timeit(
        lambda m, p: f_cb(m, gmap.quats, gmap.log_scales, gmap.alive, p),
        lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
    )
    print(f"real compute_bins (no cache): {dt*1e3:8.2f} ms "
          f"(total incl compile {time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    dt = timeit(
        lambda p, i_: track_frame(gmap, p, jnp.zeros(2), i_, Kmat, W, H,
                                  tcfg).pose,
        lambda i: (eye.at[0, 3].add(i * 1e-6), gt_img + i * 1e-7),
        iters=10,
    )
    print(f"real track_frame (no cache):  {dt*1e3:8.2f} ms "
          f"(total incl compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
