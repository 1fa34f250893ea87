"""Multi-chip scaling via jax.sharding.

The reference's 'distributed runtime' is three OS processes on one GPU
(SURVEY §2, §5.8) — there is nothing to translate. The TPU-native scaling
axes for splatting SLAM are:

  * camera data-parallelism ("cam"): the mapping window renders C keyframes
    independently; shard cameras across devices, replicate the splat
    buffer, and let XLA psum the parameter gradients over the mesh. This is
    the standard DP recipe: annotate shardings, jit, and the compiler
    inserts the collectives over ICI.
  * splat sharding ("gauss"): shard the splat buffer AND its Adam moments
    over devices by DEPTH BAND — each device projects/bins/blends only its
    band into premultiplied (rgb, alpha, depth, beta) layers, and the
    composite over bands is exact front-to-back alpha blending because the
    bands partition the same per-splat depth key the in-band sort uses.
    One small [D, C, H, W, 4]-ish all_gather per render is the only
    collective; splat-parameter gradients stay shard-local (a splat only
    contributes through its own band's layer), so the backward pass needs
    no parameter all-reduce at all. This is the N-scaling axis: map
    capacity grows with the mesh, bounded by per-device HBM.

`dp_mapping_train_step` is the camera-DP training step used by the
multi-chip dry run; `gauss_render` / `gauss_dp_mapping_step` are the
splat-sharded equivalents. Both compute the mapping loss of the
single-chip backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gslam_tpu.core.transforms import PoseDelta, pose_matrix
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.mapping.gaussians import GaussianMap
from gslam_tpu.mapping.optimizer import MaskedAdamState, adam_step
from gslam_tpu.ops.losses import apply_exposure, mapping_photometric
from gslam_tpu.ops.rasterize import render_impl
from gslam_tpu.ops.ssim import ssim_per_image


def make_mesh(n_devices: int | None = None, axis: str = "cam") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def make_hybrid_mesh(n_gauss: int, n_cam: int) -> Mesh:
    """2D mesh for hybrid splat-band x camera-DP parallelism. Axis order is
    ('gauss', 'cam') so camera all-reduces ride the mesh minor axis —
    on a real TPU slice lay the minor axis along the fastest ICI ring."""
    import numpy as np

    devices = np.asarray(jax.devices()[: n_gauss * n_cam]).reshape(
        n_gauss, n_cam
    )
    return Mesh(devices, ("gauss", "cam"))


def camera_dp_shardings(mesh: Mesh):
    """(replicated, camera-sharded) NamedShardings."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("cam"))


# no donate_argnums: donation is ~6000x slower on the axon backend
# (scripts/profile_mapping3.py)
@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def dp_mapping_train_step(
    gmap: GaussianMap,  # replicated
    opt_state: MaskedAdamState,  # replicated
    pose_vec: jax.Array,  # [C, 9] camera-sharded
    pose_base: jax.Array,  # [C, 4, 4] camera-sharded
    gt_imgs: jax.Array,  # [C, H, W, 3] camera-sharded
    exposures: jax.Array,  # [C, 2] camera-sharded
    Ks: jax.Array,  # [C, 3, 3] camera-sharded
    width: int,
    height: int,
    cfg: MapConfig = MapConfig(),
):
    """One camera-DP mapping iteration. With gt_imgs/poses sharded over the
    'cam' mesh axis and the splat buffer replicated, XLA partitions the
    per-camera render and inserts an all-reduce for the parameter
    gradients — the splatting analogue of data-parallel training."""

    def loss_fn(trainable, pose_vec):
        g = gmap.with_trainable(trainable)
        viewmats = pose_matrix(
            PoseDelta(pose_base, pose_vec[:, :6], pose_vec[:, 6:9])
        )
        out = render_impl(
            **g.render_kwargs(),
            viewmats=viewmats, Ks=Ks, width=width, height=height,
            bg_rgb=jnp.asarray(cfg.background, jnp.float32), cfg=cfg.render,
        )
        rendered = apply_exposure(out.rgb, exposures)
        photo = mapping_photometric(
            rendered, gt_imgs, out.beta, active_gs=cfg.active_gs
        )
        ssim_loss = 1.0 - jnp.mean(ssim_per_image(out.rgb, gt_imgs))
        return (1.0 - cfg.ssim_weight) * photo + cfg.ssim_weight * ssim_loss

    (g_map, g_pose) = jax.grad(loss_fn, argnums=(0, 1))(
        gmap.trainable(), pose_vec
    )
    gmap, opt_state = adam_step(gmap, g_map, opt_state)
    pose_vec = pose_vec - cfg.pose_lr * g_pose
    return gmap, opt_state, pose_vec


# ------------------- splat-axis ("gauss") sharding -------------------


def partition_by_depth(gmap: GaussianMap, viewmat: jax.Array,
                       opt_state: MaskedAdamState | None = None,
                       vis: jax.Array | None = None):
    """Permute the splat buffer into ascending camera-depth order for the
    given reference view (dead splats sort last). A mesh-sharded buffer in
    this order is partitioned into contiguous depth bands — the invariant
    `gauss_render`'s band compositing relies on. Pure permutation: calling
    it never changes render results on a single device.

    `vis` ([..., capacity], e.g. the per-keyframe visibility snapshots the
    pose graph keeps) rides the same permutation along its LAST axis —
    splat-indexed side tables must stay aligned with the buffer or later
    loop-closure IoUs compare stale slot assignments."""
    p = jnp.matmul(gmap.means, viewmat[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + viewmat[:3, 3]
    key = jnp.where(gmap.alive, p[:, 2], jnp.inf)
    order = jnp.argsort(key)
    g2 = jax.tree_util.tree_map(lambda x: x[order], gmap)
    if opt_state is None:
        return g2
    o2 = MaskedAdamState(
        mu={k: v[order] for k, v in opt_state.mu.items()},
        nu={k: v[order] for k, v in opt_state.nu.items()},
        count=opt_state.count,
    )
    if vis is None:
        return g2, o2
    return g2, o2, vis[..., order]


def _band_render(g: GaussianMap, viewmats, Ks, width, height, cfg,
                 axis: str):
    """Inside shard_map: render the local depth band into premultiplied
    layers, all_gather the D small layer stacks, and compose front-to-back.
    Exactness: per-pixel blending order = (band index, in-band depth sort) =
    global depth sort, the same key single-device binning uses."""
    out = render_impl(
        **g.render_kwargs(), viewmats=viewmats, Ks=Ks,
        width=width, height=height,
        bg_rgb=jnp.zeros((3,), jnp.float32), cfg=cfg.render,
    )
    rgbs = jax.lax.all_gather(out.rgb, axis)  # [D, C, H, W, 3]
    alphas = jax.lax.all_gather(out.alpha, axis)  # [D, C, H, W]
    depths = jax.lax.all_gather(out.depth, axis)
    betas = jax.lax.all_gather(out.beta, axis)
    t_cum = jnp.cumprod(1.0 - alphas, axis=0)
    t_prev = jnp.concatenate([jnp.ones_like(t_cum[:1]), t_cum[:-1]], axis=0)
    rgb = jnp.sum(t_prev[..., None] * rgbs, axis=0)
    depth = jnp.sum(t_prev * depths, axis=0)
    # each band's beta layer carries T_band * beta_background; strip it and
    # re-add the background exactly once behind the full composite
    beta_p = betas - (1.0 - alphas) * cfg.render.beta_background
    t_final = t_cum[-1]
    beta = jnp.sum(t_prev * beta_p, axis=0) + t_final * cfg.render.beta_background
    alpha = 1.0 - t_final
    return rgb, alpha, depth, beta


def gauss_render(mesh: Mesh, gmap: GaussianMap, viewmats, Ks,
                 width: int, height: int, cfg: MapConfig = MapConfig(),
                 bg_rgb=None):
    """Splat-sharded render: `gmap` sharded over mesh axis 'gauss' in
    depth-band order (see partition_by_depth), cameras replicated. Returns
    replicated (rgb, alpha, depth, beta)."""
    axis = mesh.axis_names[0]
    fn = jax.shard_map(
        partial(_band_render, width=width, height=height, cfg=cfg, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,  # composed outputs are replicated by construction
    )
    rgb, alpha, depth, beta = fn(gmap, viewmats, Ks)
    if bg_rgb is not None:
        rgb = rgb + (1.0 - alpha)[..., None] * jnp.asarray(bg_rgb, jnp.float32)
    return rgb, alpha, depth, beta


def make_gauss_mapping_step(mesh: Mesh, width: int, height: int,
                            cfg: MapConfig = MapConfig()):
    """Build the jitted splat-sharded mapping train step. Splat params and
    Adam moments stay sharded over 'gauss' end to end (their gradients are
    band-local — no all-reduce); pose gradients are replicated by the
    composite. The loss matches dp_mapping_train_step."""
    axis = mesh.axis_names[0]

    @jax.jit
    def step(gmap: GaussianMap, opt_state: MaskedAdamState,
             pose_vec, pose_base, gt_imgs, exposures, Ks):
        def loss_fn(trainable, pose_vec):
            g = gmap.with_trainable(trainable)
            viewmats = pose_matrix(
                PoseDelta(pose_base, pose_vec[:, :6], pose_vec[:, 6:9]))
            rgb, alpha, depth, beta = jax.shard_map(
                partial(_band_render, width=width, height=height, cfg=cfg,
                        axis=axis),
                mesh=mesh,
                in_specs=(P(axis), P(), P()),
                out_specs=P(),
                check_vma=False,
            )(g, viewmats, Ks)
            rendered = apply_exposure(rgb, exposures)
            photo = mapping_photometric(
                rendered, gt_imgs, beta, active_gs=cfg.active_gs)
            ssim_loss = 1.0 - jnp.mean(ssim_per_image(rgb, gt_imgs))
            return (1.0 - cfg.ssim_weight) * photo + cfg.ssim_weight * ssim_loss

        g_map, g_pose = jax.grad(loss_fn, argnums=(0, 1))(
            gmap.trainable(), pose_vec)
        gmap2, opt2 = adam_step(gmap, g_map, opt_state)
        return gmap2, opt2, pose_vec - cfg.pose_lr * g_pose

    return step


def make_hybrid_mapping_step(mesh: Mesh, width: int, height: int,
                             cfg: MapConfig = MapConfig()):
    """Hybrid 2D parallel mapping step over a ('gauss', 'cam') mesh: the
    splat buffer and Adam moments are sharded into depth bands along
    'gauss' (model parallel — map capacity scales with the mesh), and the
    window cameras are data-parallel along 'cam'. Collectives per step:
    one small layer all_gather over 'gauss' inside the render, plus the
    XLA-inserted splat-gradient all-reduce over 'cam'. Splat gradients
    never cross 'gauss' (a splat only touches its own band's layer).
    Loss matches make_gauss_mapping_step (zero-background composite)."""
    gaxis, caxis = "gauss", "cam"
    assert set((gaxis, caxis)) <= set(mesh.axis_names), mesh.axis_names

    @jax.jit
    def step(gmap: GaussianMap, opt_state: MaskedAdamState,
             pose_vec, pose_base, gt_imgs, exposures, Ks):
        def loss_fn(trainable, pose_vec):
            g = gmap.with_trainable(trainable)
            viewmats = pose_matrix(
                PoseDelta(pose_base, pose_vec[:, :6], pose_vec[:, 6:9]))
            rgb, alpha, depth, beta = jax.shard_map(
                partial(_band_render, width=width, height=height, cfg=cfg,
                        axis=gaxis),
                mesh=mesh,
                in_specs=(P(gaxis), P(caxis), P(caxis)),
                out_specs=P(caxis),
                check_vma=False,
            )(g, viewmats, Ks)
            rendered = apply_exposure(rgb, exposures)
            photo = mapping_photometric(
                rendered, gt_imgs, beta, active_gs=cfg.active_gs)
            ssim_loss = 1.0 - jnp.mean(ssim_per_image(rgb, gt_imgs))
            return (1.0 - cfg.ssim_weight) * photo + cfg.ssim_weight * ssim_loss

        g_map, g_pose = jax.grad(loss_fn, argnums=(0, 1))(
            gmap.trainable(), pose_vec)
        gmap2, opt2 = adam_step(gmap, g_map, opt_state)
        return gmap2, opt2, pose_vec - cfg.pose_lr * g_pose

    return step
