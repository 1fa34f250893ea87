#!/usr/bin/env python3
"""Offline single-image splat-fitting demo.

Counterpart of the reference's pipeline.py: initialize a random splat
cloud, fit it to one target image with Adam under an L1 loss, and save the
result. Useful as a standalone optimization sanity check and micro-bench of
the render+backward path (no SLAM involved).

    python pipeline.py --image path.png --iters 2000
    python pipeline.py --synthetic --iters 500   # no input needed
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--n-splats", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--out", type=str, default="/tmp/pipeline_fit")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gslam_tpu.core.compile_cache import enable_compile_cache
    from gslam_tpu.mapping.gaussians import empty_map

    enable_compile_cache()
    from gslam_tpu.ops.knn import mean_knn_scale
    from gslam_tpu.ops.rasterize import RenderConfig, render, render_impl

    W, H = args.width, args.height
    rng = np.random.default_rng(0)
    if args.image:
        img = Image.open(args.image).convert("RGB").resize((W, H))
        target = np.float32(img) / 255.0
    else:
        # smooth random target
        from scipy.ndimage import gaussian_filter

        target = gaussian_filter(
            rng.random((H, W, 3)).astype(np.float32), sigma=(8, 8, 0)
        )
        target = (target - target.min()) / (target.max() - target.min() + 1e-9)

    n = args.n_splats
    fx = 0.9 * W
    K = jnp.asarray(np.array(
        [[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32
    ))
    z = rng.uniform(1.8, 2.2, n).astype(np.float32)
    u = rng.uniform(0, W, n).astype(np.float32)
    v = rng.uniform(0, H, n).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fx, z], -1)
    means_j = jnp.asarray(means)
    scales0 = np.asarray(mean_knn_scale(means_j, 4))

    gmap = empty_map(n)._replace(
        means=means_j,
        quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        log_scales=jnp.asarray(np.log(np.tile(scales0[:, None], (1, 3)) + 1e-6)),
        logit_opacities=jnp.zeros((n,)),
        logit_colors=jnp.zeros((n, 3)),
        log_uncertainties=jnp.zeros((n,)),
        alive=jnp.ones((n,), bool),
    )

    cfg = RenderConfig(tile_capacity=256, tile_chunk=16)
    target_j = jnp.asarray(target)
    eye = jnp.eye(4)[None]

    # no donate_argnums (donation is ~6000x slower on the axon backend) and
    # every device array is an argument, never a closure constant; jitted
    # code calls render_impl to avoid a nested jit (docs/PERF.md rules).
    @partial(jax.jit, static_argnames=("n_steps",))
    def fit(params, mu, nu, gmap, eye, K, target_j, n_steps):
        def loss_fn(p):
            g = gmap.with_trainable(p)
            out = render_impl(
                **g.render_kwargs(), viewmats=eye, Ks=K[None],
                width=W, height=H, cfg=cfg,
            )
            return jnp.mean(jnp.abs(out.rgb[0] - target_j))

        def step(carry, i):
            p, mu, nu = carry
            loss, grad = jax.value_and_grad(loss_fn)(p)
            t = (i + 1).astype(jnp.float32)
            mu = jax.tree_util.tree_map(lambda m, g: 0.9 * m + 0.1 * g, mu, grad)
            nu = jax.tree_util.tree_map(
                lambda v, g: 0.999 * v + 0.001 * g * g, nu, grad
            )
            p = jax.tree_util.tree_map(
                lambda x, m, v: x - args.lr * (m / (1 - 0.9**t))
                / (jnp.sqrt(v / (1 - 0.999**t)) + 1e-8),
                p, mu, nu,
            )
            return (p, mu, nu), loss

        (params, mu, nu), losses = jax.lax.scan(
            step, (params, mu, nu), jnp.arange(n_steps)
        )
        return params, mu, nu, losses

    params = gmap.trainable()
    mu = jax.tree_util.tree_map(jnp.zeros_like, params)
    nu = jax.tree_util.tree_map(jnp.zeros_like, params)
    t0 = time.time()
    params, mu, nu, losses = fit(params, mu, nu, gmap, eye, K,
                                 target_j, args.iters)
    jax.block_until_ready(losses)
    dt = time.time() - t0

    gmap = gmap.with_trainable(params)
    out = render(**gmap.render_kwargs(), viewmats=eye, Ks=K[None],
                 width=W, height=H, cfg=cfg)
    final = np.clip(np.asarray(out.rgb[0]), 0, 1)
    l1 = float(np.mean(np.abs(final - target)))
    print(f"fit {args.iters} iters in {dt:.1f}s "
          f"({1e3 * dt / args.iters:.1f} ms/iter); "
          f"L1 {float(losses[0]):.4f} -> {l1:.4f}")

    import os

    os.makedirs(args.out, exist_ok=True)
    Image.fromarray(np.uint8(target * 255)).save(f"{args.out}/target.png")
    Image.fromarray(np.uint8(final * 255)).save(f"{args.out}/fit.png")
    from gslam_tpu.runtime.checkpoint import save_map

    save_map(f"{args.out}/splats.npz", gmap)
    print(f"artifacts in {args.out}")
    return l1


if __name__ == "__main__":
    main()
