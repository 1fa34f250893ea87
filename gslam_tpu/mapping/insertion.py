"""Map densification: functional, fixed-shape insertion strategies.

Reimplements the reference's two strategies (/root/reference/gslam/
insertion.py) for the fixed-capacity buffer:

  * `insert_from_depthmap` — backproject randomly-picked low-alpha pixels of
    a rendered (or mock) depth map into world space and add them as new
    splats, with the reference's depth-noising, median-fill, scale-from-
    median (or kNN when the map is empty) and multi-keyframe occlusion
    filter (insertion.py:100-273).
  * `densify_by_gradients` — 3DGS-style densification from image-plane
    gradient norms: duplicate small / split large high-gradient splats
    (insertion.py:276-347).

Instead of concatenating tensors and rewriting optimizer state, candidates
are generated at a static count, compacted with a fixed-size nonzero, and
scattered into dead slots; Adam moments at those slots are zeroed.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.camera import backproject
from gslam_tpu.core.transforms import invert_se3
from gslam_tpu.mapping.gaussians import (
    GaussianMap, compact_free_slots, masked_median,
)
from gslam_tpu.mapping.optimizer import MaskedAdamState, zero_state_at
from gslam_tpu.ops.knn import mean_knn_scale
from gslam_tpu.ops.projection import quat_scale_to_covar

HIGH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class InsertionConfig:
    depth_variance: float = 0.1  # noise std in valid-depth regions (x init scale)
    no_depth_variance: float = 0.2  # noise std where depth is unknown
    min_alpha_for_depth: float = 0.1
    initial_opacity: float = 0.3
    min_depth: float = 0.1
    logit_eps: float = 1.0 / 512.0


class InsertResult(NamedTuple):
    gmap: GaussianMap
    opt_state: MaskedAdamState
    n_inserted: jax.Array  # [] int32
    n_requested: jax.Array  # [] int32 candidates that passed the filters;
    # n_requested - n_inserted were dropped for lack of free slots


def _scatter_new_splats(
    gmap: GaussianMap,
    opt_state: MaskedAdamState,
    new: dict,  # candidate params, arrays of leading dim n_new
    keep: jax.Array,  # [n_new] bool
    frame_index,
) -> InsertResult:
    n_new = keep.shape[0]
    cap = gmap.capacity
    order = jnp.nonzero(keep, size=n_new, fill_value=n_new)[0]
    slots = compact_free_slots(gmap.alive, n_new)
    ok = (order < n_new) & (slots < cap)
    slots = jnp.where(ok, slots, cap)  # dropped by mode='drop'
    src = jnp.where(order < n_new, order, 0)

    def put(dst, vals):
        return dst.at[slots].set(vals[src], mode="drop")

    gmap = GaussianMap(
        means=put(gmap.means, new["means"]),
        quats=put(gmap.quats, new["quats"]),
        log_scales=put(gmap.log_scales, new["log_scales"]),
        logit_opacities=put(gmap.logit_opacities, new["logit_opacities"]),
        logit_colors=put(gmap.logit_colors, new["logit_colors"]),
        log_uncertainties=put(gmap.log_uncertainties, new["log_uncertainties"]),
        ages=gmap.ages.at[slots].set(jnp.int32(frame_index), mode="drop"),
        alive=gmap.alive.at[slots].set(True, mode="drop"),
    )
    opt_state = zero_state_at(opt_state, slots)
    return InsertResult(
        gmap, opt_state,
        n_inserted=jnp.sum(ok.astype(jnp.int32)),
        n_requested=jnp.sum(keep.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("n_new", "cfg"))
def insert_from_depthmap(
    key: jax.Array,
    gmap: GaussianMap,
    opt_state: MaskedAdamState,
    depthmap: jax.Array,  # [H, W] rendered (or mock) depth
    alphas: jax.Array,  # [H, W] rendered alpha
    image: jax.Array,  # [H, W, 3]
    K: jax.Array,  # [3, 3]
    viewmat: jax.Array,  # [4, 4] world-to-camera of the frame
    n_new: int,
    frame_index,
    cfg: InsertionConfig = InsertionConfig(),
    kf_viewmats: jax.Array | None = None,  # [Kf, 4, 4] for occlusion filter
    kf_est_depths: jax.Array | None = None,  # [Kf, H, W]
    kf_mask: jax.Array | None = None,  # [Kf] bool
    gt_depthmap: jax.Array | None = None,  # optional RGB-D ground truth
) -> InsertResult:
    H, W = depthmap.shape
    depth_src = depthmap if gt_depthmap is None else gt_depthmap
    # Two separate per-pixel notions that the rendered-depth (monocular)
    # case happens to conflate:
    #   trust — the depth value at this pixel is usable for backprojection.
    #     Rendered depth is only meaningful where the render is opaque
    #     enough; RGB-D ground truth is trustworthy wherever it is > 0
    #     (in particular during the bootstrap, whose mock render has
    #     alpha ~ 0 everywhere — without this split, RGB-D bootstrap
    #     candidates all landed at noisy median depth).
    #   need — the map has no geometry here yet (low alpha), so prefer
    #     sampling candidates from these pixels (reference backend runs
    #     insert_in_regions_with_depth=False; backend.py:143).
    covered = (alphas > cfg.min_alpha_for_depth) & (depth_src > 0.0)
    trust = (depth_src > 0.0) if gt_depthmap is not None else covered
    flat_trust = trust.reshape(-1)
    flat_need = (~covered).reshape(-1)
    flat_depth = depth_src.reshape(-1)

    any_trust = jnp.any(flat_trust)
    med = jnp.where(
        any_trust,
        masked_median(flat_depth, flat_trust),
        masked_median(flat_depth, jnp.ones_like(flat_trust)),
    )

    k_noise, k_pick, k_quat = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, flat_depth.shape)
    depths_mod = jnp.where(
        flat_trust,
        flat_depth + noise * cfg.depth_variance,
        med + noise * cfg.no_depth_variance,
    )
    depths_mod = jnp.maximum(depths_mod, cfg.min_depth)

    n_need = jnp.sum(flat_need.astype(jnp.int32))
    logits = jnp.where(flat_need, 0.0, -jnp.inf)
    logits = jnp.where(n_need > 0, logits, jnp.zeros_like(logits))
    picks = jax.random.categorical(k_pick, logits, shape=(n_new,))
    keep = jnp.arange(n_new) < jnp.minimum(n_need, n_new)

    cam_pts = backproject(K, depths_mod.reshape(H, W))[picks]  # [n_new, 3]
    c2w = invert_se3(viewmat)
    means_world = jnp.matmul(cam_pts, c2w[:3, :3].T, precision=HIGH) + c2w[:3, 3]
    colors = image.reshape(-1, 3)[picks]

    def scales_from_median(_):
        s = masked_median(jnp.exp(gmap.log_scales), gmap.alive)  # [3]
        return jnp.tile(s[None, :], (n_new, 1))

    def scales_from_knn(_):
        s = mean_knn_scale(means_world, 4)  # [n_new]
        return jnp.tile(s[:, None], (1, 3))

    scales = jax.lax.cond(
        gmap.n_live() > 0, scales_from_median, scales_from_knn, operand=None
    )

    eps = cfg.logit_eps
    new = dict(
        means=means_world,
        quats=jax.random.uniform(k_quat, (n_new, 4)),
        log_scales=jnp.log(jnp.maximum(scales, 1e-8)),
        logit_opacities=jnp.full(
            (n_new,),
            math.log(cfg.initial_opacity / (1.0 - cfg.initial_opacity)),
            jnp.float32,
        ),
        logit_colors=jax.scipy.special.logit(jnp.clip(colors, eps, 1.0 - eps)),
        log_uncertainties=jnp.ones((n_new,), jnp.float32),
    )

    if kf_viewmats is not None:
        # Occlusion filter: drop candidates that land in front of previously
        # estimated keyframe depth (insertion.py:246-271).
        def in_front_of(viewmat_k, est_depth_k, active):
            p = jnp.matmul(
                means_world, viewmat_k[:3, :3].T, precision=HIGH
            ) + viewmat_k[:3, 3]
            z = p[:, 2]
            u = K[0, 0] * p[:, 0] / jnp.where(z > 0, z, 1.0) + K[0, 2]
            v = K[1, 1] * p[:, 1] / jnp.where(z > 0, z, 1.0) + K[1, 2]
            ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
            vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
            # 1px border margin: candidates that reproject to the frame they
            # came from can land epsilon outside [0, W) in f32; the CUDA
            # projector's radius-expanded culling would still call them
            # visible, so must we.
            visible = (
                (z > 0.01) & (u >= -1.0) & (u < W + 1.0)
                & (v >= -1.0) & (v < H + 1.0)
            )
            front = z < est_depth_k[vi, ui]
            return visible & front & active

        front_any = jnp.any(
            jax.vmap(in_front_of)(kf_viewmats, kf_est_depths, kf_mask), axis=0
        )
        keep = keep & ~front_any

    return _scatter_new_splats(gmap, opt_state, new, keep, frame_index)


@partial(
    jax.jit,
    static_argnames=("width", "height", "max_new", "grow_grad2d", "grow_scale3d"),
)
def densify_by_gradients(
    key: jax.Array,
    gmap: GaussianMap,
    opt_state: MaskedAdamState,
    means2d_grad: jax.Array,  # [C, cap, 2] dL/dmeans2d
    width: int,
    height: int,
    max_new: int,
    frame_index,
    grow_grad2d: float = 0.0002,
    grow_scale3d: float = 0.01,
) -> InsertResult:
    c = means2d_grad.shape[0]
    g = means2d_grad * jnp.array([width / 2.0 * c, height / 2.0 * c])
    gnorm = jnp.mean(jnp.linalg.norm(g, axis=-1), axis=0)  # [cap]

    high = (gnorm > grow_grad2d) & gmap.alive
    scales = jnp.exp(gmap.log_scales)
    small = jnp.max(scales, axis=-1) <= grow_scale3d
    selected = high  # duplicate if small, split-sample if large

    src = jnp.nonzero(selected, size=max_new, fill_value=gmap.capacity)[0]
    keep = src < gmap.capacity
    src_safe = jnp.where(keep, src, 0)

    is_split = ~small[src_safe]
    cov = quat_scale_to_covar(gmap.quats[src_safe], scales[src_safe])
    noise = jnp.einsum(
        "nij,nj->ni", cov, jax.random.normal(key, (max_new, 3)), precision=HIGH
    )
    means = gmap.means[src_safe] + jnp.where(is_split[:, None], noise, 0.0)
    log_scales = gmap.log_scales[src_safe] - jnp.where(
        is_split[:, None], jnp.log(1.6), 0.0
    )

    new = dict(
        means=means,
        quats=gmap.quats[src_safe],
        log_scales=log_scales,
        logit_opacities=gmap.logit_opacities[src_safe],
        logit_colors=gmap.logit_colors[src_safe],
        log_uncertainties=jnp.ones((max_new,), jnp.float32),
    )
    return _scatter_new_splats(gmap, opt_state, new, keep, frame_index)
