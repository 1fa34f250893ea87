"""Microbenchmark of the render pipeline stages on the current device."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gslam_tpu.mapping.gaussians import empty_map
from gslam_tpu.ops.rasterize import RenderConfig, render
from gslam_tpu.ops.projection import project_gaussians
from gslam_tpu.ops.binning import bin_gaussians


def timeit(label, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{label:40s} {dt * 1e3:8.2f} ms")
    return out


def main():
    W, H, N = 320, 240, 50_000
    rng = np.random.default_rng(0)
    fx = 280.0
    K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]])
    z = rng.uniform(1.2, 4.5, N).astype(np.float32)
    u = rng.uniform(0, W, N).astype(np.float32)
    v = rng.uniform(0, H, N).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fx, z], -1)
    gmap = empty_map(N)._replace(
        means=jnp.asarray(means),
        quats=jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.01, 0.04, (N, 3)) * z[:, None]).astype(np.float32)
        ),
        logit_opacities=jnp.full((N,), 1.5),
        logit_colors=jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        log_uncertainties=jnp.zeros((N,)),
        alive=jnp.ones((N,), bool),
    )
    cfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=6)
    eye = jnp.eye(4)

    print(f"device: {jax.devices()[0]}, N={N}, {W}x{H}")

    proj_fn = jax.jit(lambda: project_gaussians(
        gmap.means, gmap.quats, jnp.exp(gmap.log_scales), eye, K, W, H,
        alive=gmap.alive))
    proj = timeit("projection", proj_fn)

    ts = cfg.tile_size
    tx, ty = -(-W // ts), -(-H // ts)

    bin_fn = jax.jit(lambda: bin_gaussians(
        proj.means2d, proj.radii, proj.depths, proj.valid,
        ts, tx, ty, cfg.pairs_per_gaussian * N, cfg.tile_capacity, cfg.max_span))
    bins = timeit("binning (enumerate+sort+gather)", bin_fn)
    print(f"  n_pairs = {int(bins.n_pairs)} / budget {cfg.pairs_per_gaussian * N}")
    print(f"  max tile count = {int(bins.tile_counts.max())} / cap {cfg.tile_capacity}")

    render_fn = jax.jit(lambda vm: render(
        **gmap.render_kwargs(), viewmats=vm[None], Ks=K[None],
        width=W, height=H, cfg=cfg))
    out = timeit("render forward (full)", render_fn, eye)

    target = jnp.zeros((H, W, 3))

    def loss(vm6, base):
        from gslam_tpu.core.transforms import PoseDelta, pose_matrix

        pose = pose_matrix(PoseDelta(base, vm6[:6], vm6[6:9]))
        o = render(**gmap.render_kwargs(), viewmats=pose[None], Ks=K[None],
                   width=W, height=H, cfg=cfg)
        return jnp.mean((o.rgb[0] - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    timeit("render fwd+bwd (pose grad)", grad_fn, jnp.zeros(9), eye)

    def map_loss(params):
        g = gmap.with_trainable(params)
        o = render(**g.render_kwargs(), viewmats=eye[None], Ks=K[None],
                   width=W, height=H, cfg=cfg)
        return jnp.mean((o.rgb[0] - target) ** 2)

    mgrad_fn = jax.jit(jax.value_and_grad(map_loss))
    timeit("render fwd+bwd (all param grads)", mgrad_fn, gmap.trainable(), n=10)

    # tracking hot path: bins precomputed once, reused per evaluation
    from gslam_tpu.ops.rasterize import compute_bins

    cb_fn = jax.jit(lambda: compute_bins(
        gmap.means, gmap.quats, gmap.log_scales, gmap.alive,
        eye[None], K[None], W, H, cfg, radius_scale=1.5))
    cbins = timeit("compute_bins (once per frame)", cb_fn)

    def loss_binned(vm6, base):
        from gslam_tpu.core.transforms import PoseDelta, pose_matrix

        pose = pose_matrix(PoseDelta(base, vm6[:6], vm6[6:9]))
        o = render(**gmap.render_kwargs(), viewmats=pose[None], Ks=K[None],
                   width=W, height=H, cfg=cfg, bins=cbins)
        return jnp.mean((o.rgb[0] - target) ** 2)

    bgrad_fn = jax.jit(jax.value_and_grad(loss_binned))
    timeit("render fwd+bwd, bins reused (hot path)", bgrad_fn, jnp.zeros(9), eye)


if __name__ == "__main__":
    main()
