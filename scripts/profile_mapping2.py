#!/usr/bin/env python3
"""Bisect mapping_step cost at the reference operating point:
fwd-only loss, fwd+bwd, adam, full step; plus component stages."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, args_fn, iters=5, warm=2):
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

    from gslam_tpu.mapping.backend_ops import MapConfig, _window_loss
    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, render_impl
    from gslam_tpu.ops.rasterize import compute_bins

    W, H = 320, 240
    CAP = 131_072
    N_LIVE = 100_000
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
    eye = jnp.eye(4)
    vms = jnp.tile(eye[None], (WINDOW, 1, 1))
    vms = vms.at[:, 0, 3].set(jnp.arange(WINDOW) * 0.01)
    Ks = jnp.tile(K[None], (WINDOW, 1, 1))
    gt_imgs = jnp.asarray(rng.random((WINDOW, H, W, 3)).astype(np.float32))
    gt_depths = jnp.zeros((WINDOW, H, W))
    exposures = jnp.zeros((WINDOW, 2))
    wmask = jnp.ones(WINDOW, bool)
    print(f"device: {jax.devices()[0]}  cap={CAP} live={N_LIVE} "
          f"window={WINDOW} @{W}x{H}", flush=True)

    # 0a. bins only, 10 cameras
    @jax.jit
    def f_bins(means, quats, log_scales, alive_, vms, Ks):
        b = compute_bins(means, quats, log_scales, alive_, vms, Ks, W, H,
                         rcfg)
        return b.tile_gauss.sum() + b.n_pairs.sum()

    dt = timeit(lambda m, v: f_bins(m, gmap.quats, gmap.log_scales,
                                    gmap.alive, v, Ks),
                lambda i: (gmap.means + i * 1e-7, vms.at[:, 0, 3].add(i * 1e-6)))
    print(f"bins 10 cams:        {dt*1e3:9.2f} ms", flush=True)

    # 0b. render fwd only, 10 cameras
    @jax.jit
    def f_fwd(means, quats, log_scales, op, col, unc, alive_, vms, Ks):
        out = render_impl(means, quats, log_scales, op, col, unc, alive_,
                          vms, Ks, W, H, cfg=rcfg)
        return out.rgb.sum() + out.depth.sum() + out.beta.sum()

    dt = timeit(
        lambda m, v: f_fwd(m, gmap.quats, gmap.log_scales,
                           gmap.logit_opacities, gmap.logit_colors,
                           gmap.log_uncertainties, gmap.alive, v, Ks),
        lambda i: (gmap.means + i * 1e-7, vms.at[:, 0, 3].add(i * 1e-6)))
    print(f"render fwd 10 cams:  {dt*1e3:9.2f} ms", flush=True)

    # 0c. render fwd+bwd wrt all splat params
    @jax.jit
    def f_fwdbwd(means, quats, log_scales, op, col, unc, alive_, vms, Ks):
        def loss(means, quats, log_scales, op, col, unc):
            out = render_impl(means, quats, log_scales, op, col, unc, alive_,
                              vms, Ks, W, H, cfg=rcfg)
            return out.rgb.sum() + out.depth.sum() + out.beta.sum()

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            means, quats, log_scales, op, col, unc)
        return val + sum(g.sum() for g in grads)

    dt = timeit(
        lambda m, v: f_fwdbwd(m, gmap.quats, gmap.log_scales,
                              gmap.logit_opacities, gmap.logit_colors,
                              gmap.log_uncertainties, gmap.alive, v, Ks),
        lambda i: (gmap.means + i * 1e-7, vms.at[:, 0, 3].add(i * 1e-6)))
    print(f"render fwd+bwd:      {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
