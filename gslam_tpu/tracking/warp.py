"""Dense image-warp tracking (alternative to splat-based tracking).

Equivalent of the reference Warp module + warp_track
(/root/reference/gslam/warp.py, frontend.py:521-569): backproject the
reference frame's depth, transform by the relative pose, reproject into the
new view, and bilinearly sample the reference image; optimize the pose (+
exposure) against an L1 photometric loss over in-bounds pixels. Pure jnp —
grid_sample becomes a hand-rolled bilinear gather, and the whole
optimization runs inside one jitted program like the splat tracker.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import HIGH, PoseDelta, pose_matrix, invert_se3
from gslam_tpu.tracking.track import TrackingConfig
from gslam_tpu.opt.lbfgs import lbfgs_impl


def bilinear_sample(img: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sample img [H, W, C] at uv [N, 2] pixel coords; zero padding.

    Returns (samples [N, C], in_bounds [N])."""
    H, W = img.shape[:2]
    u, v = uv[:, 0], uv[:, 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        val = img[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
        return jnp.where(ok[:, None], val, 0.0)

    s = (
        tap(v0i, u0i) * (1 - du) * (1 - dv)
        + tap(v0i, u0i + 1) * du * (1 - dv)
        + tap(v0i + 1, u0i) * (1 - du) * dv
        + tap(v0i + 1, u0i + 1) * du * dv
    )
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    return s, inb


def warp_image(
    ref_pose: jax.Array,  # [4, 4] w2c of the reference frame
    new_pose: jax.Array,  # [4, 4] w2c of the new frame
    ref_img: jax.Array,  # [H, W, 3]
    ref_depth: jax.Array,  # [H, W]
    K: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Warp the reference image into the new view. Returns (rgb, valid)."""
    H, W = ref_depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    vs, us = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    d = ref_depth.reshape(-1)
    x = (us.reshape(-1) - cx) * d / fx
    y = (vs.reshape(-1) - cy) * d / fy
    pts_ref = jnp.stack([x, y, d], -1)

    rel = jnp.matmul(new_pose, invert_se3(ref_pose), precision=HIGH)
    pts_new = jnp.matmul(pts_ref, rel[:3, :3].T, precision=HIGH) + rel[:3, 3]
    z = jnp.maximum(pts_new[:, 2], 1e-6)
    u_new = fx * pts_new[:, 0] / z + cx
    v_new = fy * pts_new[:, 1] / z + cy

    # Inverse-warp formulation: for each reference pixel we know where it
    # lands in the new view; sampling the *new* image there compares against
    # ref colors. The reference implements the forward direction by sampling
    # c1 at the warped grid (warp.py:64-70) — same residual, so we follow it:
    # the caller samples the reference image at (u_new, v_new) of the new
    # frame's pixels by swapping arguments.
    return jnp.stack([u_new, v_new], -1), (pts_new[:, 2] > 1e-6)


@partial(jax.jit, static_argnames=("cfg",))
def warp_track(
    ref_pose: jax.Array,
    base_pose: jax.Array,  # initial guess for the new frame (w2c)
    ref_img: jax.Array,
    ref_depth: jax.Array,
    new_img: jax.Array,
    K: jax.Array,
    init_exposure: jax.Array,
    cfg: TrackingConfig = TrackingConfig(),
    ref_alpha: jax.Array | None = None,  # [H, W] rendered alpha of the ref
):
    """Optimize the new frame's pose by dense warp alignment."""
    H, W = ref_depth.shape

    # Rendered depth maps are alpha-premultiplied (accumulated) depth; warp
    # geometry needs the expected depth, and pixels the map barely covers
    # carry no reliable geometry at all.
    if ref_alpha is not None:
        depth_eff = ref_depth / jnp.maximum(ref_alpha, 1e-3)
        pix_ok = (ref_alpha > 0.5).reshape(-1)
    else:
        depth_eff = ref_depth
        pix_ok = (ref_depth > 1e-6).reshape(-1)

    def loss_fn(x):
        pose = pose_matrix(PoseDelta(base_pose, x[:6], x[6:9]))
        uv, zok = warp_image(ref_pose, pose, ref_img, depth_eff, K)
        warped, inb = bilinear_sample(new_img.reshape(H, W, 3), uv)
        if cfg.learn_exposure:
            warped = warped * jnp.exp(x[9]) + x[10]
        valid = (inb & zok & pix_ok)[:, None]
        resid = jnp.where(valid, jnp.abs(warped - ref_img.reshape(-1, 3)), 0.0)
        return jnp.sum(resid) / jnp.maximum(jnp.sum(valid) * 3.0, 1.0)

    x0 = jnp.concatenate([jnp.zeros(9), init_exposure])
    # lr=1: the strong-Wolfe search owns the step size here (the reference
    # uses momentum-SGD for warp tracking, frontend.py:194-199; full-step
    # L-BFGS converges in far fewer evaluations).
    res = lbfgs_impl(
        loss_fn, x0,
        max_iter=cfg.lbfgs_max_iter, max_eval=cfg.lbfgs_max_eval,
        history=cfg.lbfgs_history, lr=1.0,
    )
    pose = pose_matrix(PoseDelta(base_pose, res.x[:6], res.x[6:9]))
    return pose, res.x[9:11], res.f
