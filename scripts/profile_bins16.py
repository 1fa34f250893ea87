#!/usr/bin/env python3
"""Which embedded constants flip the scatter slow path? Start from the fast
all-args program and add one constant kind at a time."""

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

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, compute_bins

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
        alive=jnp.ones((N,), bool),
    )
    cfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    eye = jnp.eye(4)
    print(f"device: {jax.devices()[0]}", flush=True)

    def make(extra):
        @jax.jit
        def f(means_, quats, log_scales, alive, viewmats, Ks):
            b = compute_bins(means_, quats, log_scales, alive, viewmats, Ks,
                             W, H, cfg, radius_scale=1.5)
            out = b.tile_gauss.sum() + b.n_pairs.sum()
            if extra == "vec3":
                out = out + (jnp.array([1.0, 2.0, 3.0]) * means_[0]).sum()
            elif extra == "eye4":
                out = out + (jnp.eye(4) * viewmats[0]).sum()
            elif extra == "zeros3":
                out = out + (jnp.zeros(3) + means_[0]).sum()
            elif extra == "arange":
                out = out + (jnp.arange(3.0) * means_[0]).sum()
            elif extra == "mat33":
                out = out + (Kmat * viewmats[0, :3, :3]).sum()
            return out
        return f

    for name in ["none", "vec3", "eye4", "zeros3", "arange", "mat33"]:
        fn = make(name)
        dt = timeit(
            lambda m, p, f=fn: f(m, gmap.quats, gmap.log_scales, gmap.alive,
                                 p[None], Kmat[None]),
            lambda i: (gmap.means + i * 1e-7, eye.at[0, 3].add(i * 1e-6)),
        )
        print(f"extra const {name:8s}      {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
