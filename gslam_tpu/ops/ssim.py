"""SSIM with a separable 11x11 Gaussian window, 'valid' padding.

Replaces the reference's external fused-ssim CUDA kernel
(/root/reference/gslam/backend.py:303-307). On TPU there is nothing to fuse
by hand: the separable Gaussian filters lower to XLA convolutions that fuse
with the surrounding elementwise work, so a plain jnp formulation is already
the fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


_WINDOW = _gaussian_kernel()


def _filter2(img: jax.Array) -> jax.Array:
    """Separable valid-mode Gaussian filter over [B, H, W, C]."""
    w = jnp.asarray(_WINDOW)
    c = img.shape[-1]
    x = jnp.moveaxis(img, -1, 1)  # [B, C, H, W]
    kernel_h = jnp.tile(w.reshape(1, 1, -1, 1), (c, 1, 1, 1))  # [C,1,K,1]
    kernel_w = jnp.tile(w.reshape(1, 1, 1, -1), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel_h.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kernel_h, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kernel_w, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(x, 1, -1)


def ssim_per_image(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-image SSIM over [B, H, W, C] batches (valid padding). Returns [B]."""
    c1, c2 = 0.01**2, 0.03**2
    mu1 = _filter2(img1)
    mu2 = _filter2(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = _filter2(img1 * img1) - mu1_sq
    sigma2 = _filter2(img2 * img2) - mu2_sq
    sigma12 = _filter2(img1 * img2) - mu12
    num = (2 * mu12 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1 + sigma2 + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


@partial(jax.jit, static_argnames=())
def ssim(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Mean SSIM over [B, H, W, C] image batches (valid padding)."""
    return jnp.mean(ssim_per_image(img1, img2))
