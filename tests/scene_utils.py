"""Synthetic scene helpers shared by rasterizer / SLAM tests."""

import numpy as np
import jax.numpy as jnp


def make_scene(rng, n=100, width=64, height=48, z_range=(2.0, 4.0), scale=0.08,
               behind_fraction=0.0):
    fx = fy = 0.9 * width
    K = np.array(
        [[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], np.float32
    )
    z = rng.uniform(*z_range, size=n).astype(np.float32)
    # sample pixels, backproject so splats land inside the image
    u = rng.uniform(4, width - 4, size=n).astype(np.float32)
    v = rng.uniform(4, height - 4, size=n).astype(np.float32)
    x = (u - K[0, 2]) * z / fx
    y = (v - K[1, 2]) * z / fy
    if behind_fraction > 0:
        nb = int(n * behind_fraction)
        z[:nb] = -rng.uniform(1.0, 2.0, size=nb)
    means = np.stack([x, y, z], -1)

    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    log_scales = np.log(
        rng.uniform(0.5 * scale, 1.5 * scale, size=(n, 3)).astype(np.float32)
    )
    logit_opacities = rng.uniform(-1.0, 3.0, size=n).astype(np.float32)
    logit_colors = rng.normal(size=(n, 3)).astype(np.float32)
    log_uncertainties = rng.uniform(-0.5, 0.5, size=n).astype(np.float32)

    params = dict(
        means=jnp.asarray(means),
        quats=jnp.asarray(quats),
        log_scales=jnp.asarray(log_scales),
        logit_opacities=jnp.asarray(logit_opacities),
        logit_colors=jnp.asarray(logit_colors),
        log_uncertainties=jnp.asarray(log_uncertainties),
        alive=jnp.ones((n,), bool),
    )
    viewmat = jnp.eye(4, dtype=jnp.float32)[None]
    Ks = jnp.asarray(K)[None]
    return params, viewmat, Ks, width, height
