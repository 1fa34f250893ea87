"""Jitted compute kernels of the mapping backend.

Each function here is one device-side program the backend actor dispatches:
  * `mapping_step`   — one windowed map-optimization iteration: batched
    render of the keyframe window, the reference's four-term loss
    (photometric + SSIM + isotropic + edge-aware depth TV;
    /root/reference/gslam/backend.py:249-359), one masked-Adam step on the
    splat buffer and one Adam step on the window poses (frame 0 frozen),
    plus the per-iteration opacity decay. Also returns dL/dmeans2d (via a
    zero probe input) for gradient-driven densification.
  * `pose_refinement_lbfgs` — L-BFGS (strong Wolfe) over the window's pose
    deltas against the photometric loss (backend.py:447-506).
  * `keyframe_decision_stats` — the renders + statistics behind the
    keyframe-insertion test and covisibility edges (backend.py:739-792).
  * `prune_stats` / application helpers for the pruning pass.

All shapes are static: the window is padded to `window_size` slots with a
mask, so each program compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import HIGH, PoseDelta, pose_matrix, invert_se3
from gslam_tpu.mapping.gaussians import GaussianMap, masked_median
from gslam_tpu.mapping.keyframes import KeyframeStore
from gslam_tpu.mapping.optimizer import (
    MaskedAdamState, adam_step,
)
from gslam_tpu.opt.lbfgs import lbfgs_impl
from gslam_tpu.ops.losses import (
    apply_exposure, edge_aware_depth_tv, isotropic_scale_loss,
    mapping_photometric, masked_depth_l1,
)
from gslam_tpu.ops.rasterize import RenderConfig, render_impl
from gslam_tpu.ops.ssim import ssim_per_image


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Mapping hyperparameters; defaults mirror the reference MapConfig
    (/root/reference/gslam/backend.py:43-107)."""

    isotropic_weight: float = 0.0005
    depth_tv_weight: float = 0.000001
    ssim_weight: float = 0.2
    pose_lr: float = 0.003
    opacity_decay: float = 0.995
    initial_opacity: float = 0.3
    initial_scale: float = 1.0
    window_size: int = 10  # 8 recent (+2 random; see window policy)
    recent_window: int = 8
    num_iters_mapping: int = 15
    num_iters_init: int = 400
    opacity_prune_threshold: float = 0.2
    size_prune_threshold: float = 256.0
    active_gs: bool = True
    min_visibility_views: int = 3
    enable_visibility_pruning: bool = False
    enable_pgo: bool = False
    kf_cov: float = 0.9
    kf_oc: float = 0.99
    kf_m: float = 0.15
    kf_cos: float = math.cos(math.pi / 30)
    # Motion-adaptive keyframe trigger: also take a keyframe once the
    # camera has moved kf_adapt times its own EMA per-frame step since
    # the last keyframe (0 disables). The fixed kf_m * median_depth rule
    # is a per-scene constant (45 cm at reference defaults) that starves
    # mapping on translation-dominant scenes — docs/TRACKING_STUDY.md
    # "keyframe density is the third root cause"; r4's gate only passed
    # via a hand-tuned --set mapping.kf_m=0.015. kf_adapt=2.5 reproduces
    # that proven density (a keyframe every ~2-3 frames of motion) on ANY
    # scene speed without per-scene tuning.
    kf_adapt: float = 2.5
    use_gt_depths: bool = False
    depth_loss_weight: float = 0.1
    plateau_patience: int = 3
    # 0.0 = plateau pause disabled (mapping never stops early). The
    # reference-parity 0.012 freezes the map right after bootstrap on
    # scenes whose converged loss sits below it, compounding pose error
    # (TRACKING_STUDY.md "r4 gate failure: the plateau pause freezes the
    # map"); E1 proved unfreezing buys +1.5 dB at equal ATE. Opt back in
    # with --set mapping.plateau_min_loss=0.012 for battery-bound runs.
    plateau_min_loss: float = 0.0
    densify_every: int = 200
    densify_max_new: int = 4096
    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    background: tuple = (0.0, 0.0, 0.0)
    render: RenderConfig = RenderConfig()


class PoseAdamState(NamedTuple):
    mu: jax.Array  # [K, 9]
    nu: jax.Array  # [K, 9]
    count: jax.Array  # [K] int32 per-keyframe step (torch keeps per-param
    # Adam steps; a keyframe added mid-run starts at step 0)


def init_pose_adam(capacity: int) -> PoseAdamState:
    return PoseAdamState(
        jnp.zeros((capacity, 9)), jnp.zeros((capacity, 9)),
        jnp.zeros((capacity,), jnp.int32),
    )


class MappingAux(NamedTuple):
    total_loss: jax.Array
    photometric_loss: jax.Array
    radii: jax.Array  # [W, cap]
    n_touched: jax.Array  # [W, cap]
    depthmaps: jax.Array  # [W, H, W]
    means2d_grad: jax.Array  # [W, cap, 2]
    n_pairs: jax.Array  # [W]


def _window_loss(
    gmap_trainable: dict,
    gmap: GaussianMap,
    pose_vec: jax.Array,  # [W, 9]
    probe: jax.Array,  # [W, cap, 2]
    pose_base: jax.Array,  # [W, 4, 4]
    gt_imgs: jax.Array,
    gt_depths: jax.Array,
    exposures: jax.Array,
    cam_mask: jax.Array,
    Ks: jax.Array,
    width: int,
    height: int,
    cfg: MapConfig,
):
    g = gmap.with_trainable(gmap_trainable)
    viewmats = pose_matrix(PoseDelta(pose_base, pose_vec[:, :6], pose_vec[:, 6:9]))
    out = render_impl(
        **g.render_kwargs(),
        viewmats=viewmats, Ks=Ks, width=width, height=height,
        bg_rgb=jnp.asarray(cfg.background, jnp.float32),
        cfg=cfg.render, probe2d=probe,
    )
    rendered = apply_exposure(out.rgb, exposures)
    photo = mapping_photometric(
        rendered, gt_imgs, out.beta, active_gs=cfg.active_gs, cam_mask=cam_mask
    )

    radii_m = jnp.where(cam_mask[:, None], out.radii, 0)
    visible = jnp.sum((radii_m > 0).astype(jnp.int32), axis=0) > 0
    iso = isotropic_scale_loss(g.log_scales, visible & g.alive)

    ssim_vals = ssim_per_image(out.rgb, gt_imgs)
    w = cam_mask.astype(jnp.float32)
    ssim_loss = 1.0 - jnp.sum(ssim_vals * w) / jnp.maximum(jnp.sum(w), 1.0)

    total = (
        (1.0 - cfg.ssim_weight) * photo
        + cfg.ssim_weight * ssim_loss
        + cfg.isotropic_weight * iso
    )
    if not cfg.use_gt_depths:
        tv = edge_aware_depth_tv(
            out.depth, out.rgb, (out.alpha > 0.4) & cam_mask[:, None, None]
        )
        total = total + cfg.depth_tv_weight * tv
    else:
        total = total + cfg.depth_loss_weight * masked_depth_l1(
            out.depth, gt_depths, cam_mask
        )
    aux = (photo, out)
    return total, aux


# donate_argnums REMOVED on purpose: buffer donation makes the axon TPU
# backend dispatch this step at ~20 s instead of ~3 ms (6000x, measured in
# scripts/profile_mapping3.py). The extra output allocation is ~20 MB at
# 131k capacity - irrelevant next to that.
@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def mapping_step(
    gmap: GaussianMap,
    opt_state: MaskedAdamState,
    kf: KeyframeStore,
    pose_opt: PoseAdamState,
    window_idx: jax.Array,  # [W] int32 slots into kf store
    window_mask: jax.Array,  # [W] bool
    K: jax.Array,  # [3, 3] shared intrinsics
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
):
    Wn = window_idx.shape[0]
    safe_idx = jnp.where(window_mask, window_idx, 0)

    gt_imgs = kf.images[safe_idx]
    gt_depths = kf.gt_depths[safe_idx]
    pose_base = kf.pose_base[safe_idx]
    pose_vec = jnp.concatenate([kf.d_rot6[safe_idx], kf.d_t[safe_idx]], axis=-1)
    exposures = kf.exposures[safe_idx]
    Ks = jnp.tile(K[None], (Wn, 1, 1))
    probe = jnp.zeros((Wn, gmap.capacity, 2))

    grad_fn = jax.value_and_grad(_window_loss, argnums=(0, 2, 3), has_aux=True)
    (total_loss, (photo, out)), (g_map, g_pose, g_probe) = grad_fn(
        gmap.trainable(), gmap, pose_vec, probe, pose_base,
        gt_imgs, gt_depths, exposures, window_mask, Ks, width, height, cfg,
    )

    gmap, opt_state = adam_step(gmap, g_map, opt_state)

    # Pose Adam on window poses; the very first keyframe stays fixed
    # (backend.py:457-461 excludes frame index 0).
    frame_is_fixed = kf.frame_idx[safe_idx] == 0
    upd_mask = window_mask & ~frame_is_fixed
    g_pose = jnp.where(upd_mask[:, None], g_pose, 0.0)

    mu = pose_opt.mu[safe_idx]
    nu = pose_opt.nu[safe_idx]
    count = pose_opt.count[safe_idx] + jnp.where(upd_mask, 1, 0)
    t = jnp.maximum(count.astype(jnp.float32), 1.0)[:, None]
    mu = 0.9 * mu + 0.1 * g_pose
    nu = 0.999 * nu + 0.001 * g_pose * g_pose
    step = cfg.pose_lr * (mu / (1 - 0.9**t)) / (jnp.sqrt(nu / (1 - 0.999**t)) + 1e-8)
    new_vec = jnp.where(upd_mask[:, None], pose_vec - step, pose_vec)

    # Padded window slots read slot 0 via safe_idx; route their WRITES out
    # of range (mode='drop') so the stale slot-0 read never races the fresh
    # write when keyframe 0 is genuinely in the window (XLA scatter with
    # duplicate indices is order-undefined).
    write_idx = jnp.where(window_mask, window_idx, kf.capacity)
    upd_idx = jnp.where(upd_mask, window_idx, kf.capacity)
    kf = kf._replace(
        d_rot6=kf.d_rot6.at[write_idx].set(new_vec[:, :6], mode="drop"),
        d_t=kf.d_t.at[write_idx].set(new_vec[:, 6:9], mode="drop"),
        est_depths=kf.est_depths.at[write_idx].set(out.depth, mode="drop"),
    )
    pose_opt = PoseAdamState(
        mu=pose_opt.mu.at[upd_idx].set(mu, mode="drop"),
        nu=pose_opt.nu.at[upd_idx].set(nu, mode="drop"),
        count=pose_opt.count.at[upd_idx].set(count, mode="drop"),
    )

    # per-iteration opacity decay for multi-view-visible splats; padded
    # cameras re-render slot 0's pose, so mask them out of the view count
    radii_m = jnp.where(window_mask[:, None], out.radii, 0)
    n_touched_m = jnp.where(window_mask[:, None], out.n_touched, 0)
    seen = jnp.sum((radii_m > 0).astype(jnp.int32), axis=0) > 1
    gmap = gmap._replace(
        logit_opacities=jnp.where(
            seen & gmap.alive,
            gmap.logit_opacities * cfg.opacity_decay,
            gmap.logit_opacities,
        )
    )

    aux = MappingAux(
        total_loss=total_loss,
        photometric_loss=photo,
        radii=radii_m,
        n_touched=n_touched_m,
        depthmaps=out.depth,
        means2d_grad=g_probe,
        n_pairs=out.n_pairs,
    )
    return gmap, opt_state, kf, pose_opt, aux


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def pose_refinement_lbfgs(
    gmap: GaussianMap,
    kf: KeyframeStore,
    window_idx: jax.Array,
    window_mask: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
):
    """L-BFGS refinement of window poses on the photometric loss alone."""
    Wn = window_idx.shape[0]
    safe_idx = jnp.where(window_mask, window_idx, 0)
    gt_imgs = kf.images[safe_idx]
    pose_base = kf.pose_base[safe_idx]
    exposures = kf.exposures[safe_idx]
    Ks = jnp.tile(K[None], (Wn, 1, 1))
    x0 = jnp.concatenate([kf.d_rot6[safe_idx], kf.d_t[safe_idx]], -1).reshape(-1)

    frozen = (~window_mask) | (kf.frame_idx[safe_idx] == 0)
    free = jnp.repeat(~frozen, 9).astype(jnp.float32)

    def loss_fn(x):
        x_eff = x0 + (x - x0) * free  # frozen coords pinned to initial values
        vec = x_eff.reshape(Wn, 9)
        viewmats = pose_matrix(PoseDelta(pose_base, vec[:, :6], vec[:, 6:9]))
        out = render_impl(
            **gmap.render_kwargs(),
            viewmats=viewmats, Ks=Ks, width=width, height=height,
            bg_rgb=jnp.asarray(cfg.background, jnp.float32), cfg=cfg.render,
        )
        rendered = apply_exposure(out.rgb, exposures)
        return mapping_photometric(
            rendered, gt_imgs, out.beta, active_gs=cfg.active_gs,
            cam_mask=window_mask,
        )

    res = lbfgs_impl(loss_fn, x0, max_iter=20, max_eval=25, history=10,
                lr=1.0, tol_change=1e-7)
    vec = (x0 + (res.x - x0) * free).reshape(Wn, 9)
    kf = kf._replace(
        d_rot6=kf.d_rot6.at[safe_idx].set(
            jnp.where(window_mask[:, None], vec[:, :6], kf.d_rot6[safe_idx])
        ),
        d_t=kf.d_t.at[safe_idx].set(
            jnp.where(window_mask[:, None], vec[:, 6:9], kf.d_t[safe_idx])
        ),
    )
    return kf, res.f


class KeyframeStats(NamedTuple):
    translation: jax.Array
    median_depth: jax.Array
    cos_z: jax.Array
    iou: jax.Array
    new_visible: jax.Array  # [cap]
    prev_visible: jax.Array  # [cap]
    new_depth: jax.Array  # [H, W] rendered depth at the new frame
    new_alpha: jax.Array  # [H, W]


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def keyframe_decision_stats(
    gmap: GaussianMap,
    new_pose: jax.Array,  # [4, 4]
    prev_pose: jax.Array,  # [4, 4]
    K: jax.Array,
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
) -> KeyframeStats:
    out = render_impl(
        **gmap.render_kwargs(),
        viewmats=jnp.stack([new_pose, prev_pose]),
        Ks=jnp.tile(K[None], (2, 1, 1)),
        width=width, height=height,
        bg_rgb=jnp.asarray(cfg.background, jnp.float32), cfg=cfg.render,
    )
    new_vis = out.radii[0] > 0
    prev_vis = out.radii[1] > 0
    inter = jnp.sum((new_vis & prev_vis).astype(jnp.float32))
    union = jnp.maximum(jnp.sum((new_vis | prev_vis).astype(jnp.float32)), 1.0)

    rel = jnp.matmul(invert_se3(new_pose), prev_pose, precision=HIGH)
    translation = jnp.linalg.norm(rel[:3, 3])
    valid = (out.alpha > 0.1).reshape(-1)
    med = masked_median(out.depth.reshape(-1), valid)

    z_new = new_pose[:3, 2]
    z_prev = prev_pose[:3, 2]
    cos_z = jnp.dot(z_new, z_prev) / jnp.maximum(
        jnp.linalg.norm(z_new) * jnp.linalg.norm(z_prev), 1e-12
    )
    return KeyframeStats(
        translation=translation, median_depth=med, cos_z=cos_z,
        iou=inter / union, new_visible=new_vis, prev_visible=prev_vis,
        new_depth=out.depth[0], new_alpha=out.alpha[0],
    )


class ViewStats(NamedTuple):
    radii: jax.Array  # [cap]
    n_touched: jax.Array  # [cap]
    depth: jax.Array  # [H, W]
    alpha: jax.Array  # [H, W]
    rgb: jax.Array  # [H, W, 3]


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def render_view_stats(
    gmap: GaussianMap,
    pose: jax.Array,  # [4, 4]
    K: jax.Array,
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
) -> ViewStats:
    """Single-view render + per-splat stats (pruning pass / sync payload)."""
    out = render_impl(
        **gmap.render_kwargs(),
        viewmats=pose[None], Ks=K[None], width=width, height=height,
        bg_rgb=jnp.asarray(cfg.background, jnp.float32), cfg=cfg.render,
    )
    return ViewStats(
        radii=out.radii[0], n_touched=out.n_touched[0],
        depth=out.depth[0], alpha=out.alpha[0], rgb=out.rgb[0],
    )


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def eval_views(
    gmap: GaussianMap,
    poses: jax.Array,  # [B, 4, 4]
    gt_imgs: jax.Array,  # [B, H, W, 3]
    K: jax.Array,
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
) -> tuple[jax.Array, jax.Array]:
    """Batched end-of-run reconstruction scoring: render B views from the
    final map and compute per-view PSNR and SSIM in ONE program (the
    reference re-renders one view per step in a host loop,
    frontend.py:374-409 — a per-dispatch disaster on this transport)."""
    out = render_impl(
        **gmap.render_kwargs(),
        viewmats=poses, Ks=jnp.tile(K[None], (poses.shape[0], 1, 1)),
        width=width, height=height,
        bg_rgb=jnp.asarray(cfg.background, jnp.float32), cfg=cfg.render,
    )
    rendered = jnp.clip(out.rgb, 0.0, 1.0)
    mse = jnp.mean((rendered - gt_imgs) ** 2, axis=(1, 2, 3))
    psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
    return psnr, ssim_per_image(rendered, gt_imgs)


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def visibility_pass(
    gmap: GaussianMap,
    poses: jax.Array,  # [B, 4, 4]
    K: jax.Array,
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
) -> jax.Array:
    """[B, cap] visibility (radii > 0) for covisibility/pose-graph checks."""
    out = render_impl(
        **gmap.render_kwargs(),
        viewmats=poses, Ks=jnp.tile(K[None], (poses.shape[0], 1, 1)),
        width=width, height=height,
        bg_rgb=jnp.asarray(cfg.background, jnp.float32), cfg=cfg.render,
    )
    return out.radii > 0
