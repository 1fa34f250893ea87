"""Multi-chip scaling via jax.sharding.

The reference's 'distributed runtime' is three OS processes on one GPU
(SURVEY §2, §5.8) — there is nothing to translate. The TPU-native scaling
axes for splatting SLAM are:

  * camera data-parallelism ("cam"): the mapping window renders C keyframes
    independently; shard cameras across devices, replicate the splat
    buffer, and let XLA psum the parameter gradients over the mesh. This is
    the standard DP recipe: annotate shardings, jit, and the compiler
    inserts the collectives over ICI.
  * splat sharding ("gauss", future): shard projection/binning over the
    gaussian axis with an all-gather of per-tile lists before blending.

`dp_mapping_train_step` is the camera-DP training step used by the
multi-chip dry run; it computes the same four-term mapping loss as the
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
