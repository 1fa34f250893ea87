#!/usr/bin/env python3
"""Diff the jaxpr of the real compute_bins vs the fast verbatim copy."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # tracing only

    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.ops.rasterize import RenderConfig, compute_bins
    from gslam_tpu.ops.projection import project_gaussians
    from gslam_tpu.ops.binning import bin_gaussians

    W, H = 320, 240
    N = 50_000
    cfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    Kmat = jnp.zeros((3, 3))
    radius_scale = 1.5
    n = N
    ts = cfg.tile_size
    tiles_x = -(-W // ts)
    tiles_y = -(-H // ts)

    def real(means, quats, log_scales, alive, pose):
        b = compute_bins(means, quats, log_scales, alive, pose[None],
                         Kmat[None], W, H, cfg, radius_scale=1.5)
        return b.tile_gauss.sum() + b.n_pairs.sum()

    def copy(means, quats, log_scales, alive, pose):
        viewmats, Ks = pose[None], Kmat[None]
        scales = jnp.exp(log_scales)

        def one(vm, K):
            proj = project_gaussians(
                means, quats, scales, vm, K, W, H,
                near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
                radius_clip=cfg.radius_clip, alive=alive,
            )
            ins = jax.lax.optimization_barrier(
                (proj.means2d, proj.radii * radius_scale, proj.depths,
                 proj.valid))
            b = bin_gaussians(
                ins[0], ins[1], ins[2], ins[3],
                ts, tiles_x, tiles_y, int(cfg.pairs_per_gaussian * n),
                cfg.tile_capacity, cfg.max_span,
            )
            return b.tile_gauss, b.tile_mask, b.n_pairs

        tg, tm, np_ = jax.vmap(one)(viewmats, Ks)
        return tg.sum() + np_.sum()

    args = (
        jax.ShapeDtypeStruct((N, 3), jnp.float32),
        jax.ShapeDtypeStruct((N, 4), jnp.float32),
        jax.ShapeDtypeStruct((N, 3), jnp.float32),
        jax.ShapeDtypeStruct((N,), jnp.bool_),
        jax.ShapeDtypeStruct((4, 4), jnp.float32),
    )
    jr = jax.make_jaxpr(real)(*args)
    jc = jax.make_jaxpr(copy)(*args)
    with open("/tmp/jaxpr_real.txt", "w") as f:
        f.write(str(jr))
    with open("/tmp/jaxpr_copy.txt", "w") as f:
        f.write(str(jc))
    print("written /tmp/jaxpr_real.txt /tmp/jaxpr_copy.txt")


if __name__ == "__main__":
    main()
