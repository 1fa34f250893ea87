"""Reconstruction quality metrics (PSNR / SSIM).

Counterpart of the reference's skimage-based evaluation
(/root/reference/gslam/frontend.py:374-409), computed on device with the
same SSIM kernel used in the mapping loss.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gslam_tpu.ops.ssim import ssim as _ssim


def psnr(img: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(img, np.float64) - np.asarray(gt, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def eval_metrics(rendered: np.ndarray, gt: np.ndarray) -> dict:
    """PSNR + SSIM for one [H, W, 3] pair in [0, 1]."""
    return {
        "psnr": psnr(rendered, gt),
        "ssim": float(_ssim(jnp.asarray(rendered)[None], jnp.asarray(gt)[None])),
    }


def sanitize_metrics(obj):
    """NaN/Inf -> None, recursively, for strict-JSON metric dumps.

    `json.dumps` happily emits bare `NaN` (invalid strict JSON), which
    breaks jq/JS parsers on committed evidence artifacts and silently
    poisons `json.load(...) < threshold` quality gates — exactly what let
    the r3 flagship's NaN ATE through (ADVICE r3)."""
    import math

    if isinstance(obj, float):
        return obj if math.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: sanitize_metrics(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_metrics(v) for v in obj]
    return obj
