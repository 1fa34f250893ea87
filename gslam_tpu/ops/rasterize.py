"""Tile-based differentiable Gaussian-splat rasterizer (TPU-first).

Replaces the reference's CUDA `rasterize_to_pixels` + wrapper
(/root/reference/gslam/rasterization.py:44-360) with an XLA formulation that
maps onto TPU hardware:

  * Front-to-back alpha compositing is re-expressed as
        T_m = exp( cumsum_{k<m} log(1 - alpha_k) ),   w_m = alpha_m * T_m
    i.e. a log-space cumulative sum instead of a serial per-pixel loop — the
    whole (pixels x splats) weight matrix for a tile is computed at once on
    the VPU, and the color/depth/beta accumulation
        out[p, ch] = sum_m w[p, m] * feat[m, ch]
    becomes a batched matmul that runs on the MXU.
  * The backward pass is plain autodiff through this formulation under
    jax.checkpoint (rematerialization), so per-splat gradients accumulate via
    XLA scatter-adds (the transpose of the tile gather) rather than CUDA
    atomics, and gradients flow to every input INCLUDING the camera pose.
  * Work is chunked over tiles with lax.map to bound VMEM/HBM footprint.

Semantics kept for parity with the reference renderer:
  activations sigmoid(opacity)/sigmoid(color)/exp(scale), beta =
  max(exp(log_uncertainty), 0.01) (rasterization.py:145-149); alpha clamped
  to 0.999 and cut below 1/255; transmittance cutoff 1e-4; accumulated (not
  expectation) depth channel; beta channel background e^1; `n_touched` counts
  pixels a splat influenced while transmittance exceeded `visibility_min_T`
  (the fork's extension used by pruning and keyframe policies).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.ops.binning import bin_gaussians
from gslam_tpu.ops.projection import project_gaussians

HIGH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    backend: str = "auto"  # 'auto' | 'pallas' | 'jnp'
    tile_size: int = 16
    tile_capacity: int = 256  # max splats blended per tile (nearest kept)
    pairs_per_gaussian: int = 8  # pair budget = N * this
    max_span: int = 16  # max tile-footprint side per splat
    tile_chunk: int = 64  # tiles processed per lax.map step
    near: float = 0.01
    far: float = 1e10
    eps2d: float = 0.3
    radius_clip: float = 0.0
    visibility_min_T: float = 0.5
    beta_background: float = math.e
    alpha_clamp: float = 0.999
    alpha_cut: float = 1.0 / 255.0
    transmittance_cut: float = 1e-4


class RenderOutput(NamedTuple):
    rgb: jax.Array  # [C, H, W, 3]
    alpha: jax.Array  # [C, H, W]
    depth: jax.Array  # [C, H, W] accumulated depth
    beta: jax.Array  # [C, H, W] rendered uncertainty
    radii: jax.Array  # [C, N]
    means2d: jax.Array  # [C, N, 2]
    depths: jax.Array  # [C, N] per-splat camera depth
    n_touched: jax.Array  # [C, N] int32
    n_pairs: jax.Array  # [C] int32 binning load (monitor vs budget)


def _blend_tiles(
    tile_gauss,  # [T, M]
    tile_mask,  # [T, M]
    tile_origin,  # [T, 2] pixel coords of tile corner
    means2d,  # [N, 2]
    conics,  # [N, 3]
    opacities,  # [N]
    features,  # [N, F]
    cfg: RenderConfig,
    tiles_x: int | None = None,
):
    use_pallas = cfg.backend == "pallas" or (
        cfg.backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas and tiles_x is not None:
        from gslam_tpu.ops.blend_pallas import blend_tiles_pallas

        g_xy = means2d[tile_gauss]  # [T, M, 2]
        g_con = conics[tile_gauss]
        g_op = jnp.where(tile_mask, opacities[tile_gauss], 0.0)
        g_feat = features[tile_gauss]
        out, t_final, touched = blend_tiles_pallas(
            g_xy, g_con, g_op, g_feat, cfg.tile_size, tiles_x,
            (cfg.alpha_cut, cfg.alpha_clamp, cfg.visibility_min_T),
        )
        return out, 1.0 - t_final, t_final, touched

    ts = cfg.tile_size
    P = ts * ts
    F = features.shape[-1]

    vv, uu = jnp.meshgrid(
        jnp.arange(ts, dtype=jnp.float32), jnp.arange(ts, dtype=jnp.float32),
        indexing="ij",
    )
    local = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)  # [P, 2]

    def chunk_fn(args):
        ids, mask, origin = args  # [Tc, M], [Tc, M], [Tc, 2]
        g_xy = means2d[ids]  # [Tc, M, 2]
        g_con = conics[ids]  # [Tc, M, 3]
        g_op = opacities[ids]  # [Tc, M]
        g_feat = features[ids]  # [Tc, M, F]

        pix = origin[:, None, :] + local[None, :, :]  # [Tc, P, 2]
        d = pix[:, :, None, :] - g_xy[:, None, :, :]  # [Tc, P, M, 2]
        dx, dy = d[..., 0], d[..., 1]
        ca = g_con[..., 0][:, None, :]
        cb = g_con[..., 1][:, None, :]
        cc = g_con[..., 2][:, None, :]
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

        alpha = g_op[:, None, :] * jnp.exp(-sigma)
        ok = mask[:, None, :] & (sigma >= 0.0) & (alpha >= cfg.alpha_cut)
        alpha = jnp.where(ok, jnp.minimum(alpha, cfg.alpha_clamp), 0.0)

        log_1m = jnp.log1p(-alpha)  # [Tc, P, M]
        logT_incl = jnp.cumsum(log_1m, axis=-1)
        logT_excl = logT_incl - log_1m  # exclusive: transmittance before m
        T = jnp.exp(logT_excl)
        w = alpha * T  # [Tc, P, M]

        out = jnp.einsum("tpm,tmf->tpf", w, g_feat, precision=HIGH)  # [Tc, P, F]
        alpha_img = jnp.sum(w, axis=-1)  # [Tc, P]
        t_final = jnp.exp(logT_incl[..., -1])  # [Tc, P]

        touched = jnp.sum(
            (ok & (T > cfg.visibility_min_T)).astype(jnp.int32), axis=1
        )  # [Tc, M]
        return out, alpha_img, t_final, touched

    T_tiles = tile_gauss.shape[0]
    chunk = min(cfg.tile_chunk, T_tiles)
    n_chunks = -(-T_tiles // chunk)
    T_pad = n_chunks * chunk

    def pad(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((T_pad - T_tiles,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if T_pad != T_tiles else x

    ids_p = pad(tile_gauss).reshape(n_chunks, chunk, -1)
    mask_p = pad(tile_mask, False).reshape(n_chunks, chunk, -1)
    org_p = pad(tile_origin).reshape(n_chunks, chunk, 2)

    out, alpha_img, t_final, touched = jax.lax.map(
        jax.checkpoint(chunk_fn), (ids_p, mask_p, org_p)
    )
    out = out.reshape(T_pad, P, F)[:T_tiles]
    alpha_img = alpha_img.reshape(T_pad, P)[:T_tiles]
    t_final = t_final.reshape(T_pad, P)[:T_tiles]
    touched = touched.reshape(T_pad, -1)[:T_tiles]
    return out, alpha_img, t_final, touched


def _render_single_camera(
    means, quats, scales, opacities, colors, betas, alive,
    viewmat, K, probe2d,
    width: int, height: int, bg_rgb, cfg: RenderConfig,
    bins=None,
):
    n = means.shape[0]
    ts = cfg.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)

    proj = project_gaussians(
        means, quats, scales, viewmat, K, width, height,
        near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
        radius_clip=cfg.radius_clip, alive=alive,
    )
    means2d = proj.means2d + probe2d  # probe2d: zeros; grad wrt it = dL/dmeans2d

    if bins is None:
        max_pairs = int(cfg.pairs_per_gaussian * n)
        # optimization_barrier: materialize projection outputs so XLA does
        # not fuse projection math into the pair-scatter operands — that
        # fusion degrades the scatter ~4000x (see compute_bins and
        # scripts/profile_bins9.py).
        b_m2d, b_radii, b_depths, b_valid = jax.lax.optimization_barrier((
            jax.lax.stop_gradient(means2d),
            proj.radii,
            jax.lax.stop_gradient(proj.depths),
            proj.valid,
        ))
        bins = bin_gaussians(
            b_m2d, b_radii, b_depths, b_valid,
            ts, tiles_x, tiles_y, max_pairs, cfg.tile_capacity, cfg.max_span,
        )

    # Per-splat blend features: [rgb, depth, beta]; invalid splats are force-
    # zeroed through opacity so their (gathered) gradients are exact zeros.
    feats = jnp.concatenate(
        [colors, proj.depths[:, None], betas[:, None]], axis=-1
    )  # [N, 5]
    opac = jnp.where(proj.valid, opacities, 0.0)

    ty = jnp.arange(tiles_y, dtype=jnp.float32) * ts
    tx = jnp.arange(tiles_x, dtype=jnp.float32) * ts
    origin = jnp.stack(
        [jnp.tile(tx, tiles_y), jnp.repeat(ty, tiles_x)], axis=-1
    )  # [T, 2] row-major (y-major) to match tile_id = ty*tiles_x+tx

    out, alpha_img, t_final, touched = _blend_tiles(
        bins.tile_gauss, bins.tile_mask, origin,
        means2d, proj.conics, opac, feats, cfg, tiles_x=tiles_x,
    )

    bg = jnp.concatenate(
        [bg_rgb, jnp.zeros((1,), jnp.float32),
         jnp.full((1,), cfg.beta_background, jnp.float32)]
    )  # [5]
    out = out + t_final[..., None] * bg[None, None, :]

    def untile(img_flat):  # [T, P, ...] -> [H, W, ...]
        extra = img_flat.shape[2:]
        img = img_flat.reshape((tiles_y, tiles_x, ts, ts) + extra)
        img = jnp.swapaxes(img, 1, 2)  # [ty, ts, tx, ts, ...]
        img = img.reshape((tiles_y * ts, tiles_x * ts) + extra)
        return img[:height, :width]

    rgb = untile(out[..., :3])
    depth = untile(out[..., 3])
    beta = untile(out[..., 4])
    alpha = untile(1.0 - t_final)
    del alpha_img  # sum-of-weights == 1 - t_final up to clamping; use the latter

    n_touched = jax.ops.segment_sum(
        (touched * bins.tile_mask).reshape(-1),
        bins.tile_gauss.reshape(-1),
        num_segments=n,
    ).astype(jnp.int32)

    return rgb, alpha, depth, beta, proj.radii, means2d, proj.depths, n_touched, bins.n_pairs


class CameraBins(NamedTuple):
    """Precomputed per-camera tile lists, reusable across re-renders while
    the pose moves only a few pixels (the tracking line search)."""

    tile_gauss: jax.Array  # [C, T, M]
    tile_mask: jax.Array  # [C, T, M]
    n_pairs: jax.Array  # [C]


# NOT @jit: compute_bins is called from inside already-jitted programs
# (track_frame), and a NESTED jit call boundary makes XLA:TPU compile the
# pair scatters ~100x slower (193 ms vs 1.4 ms at N=50k, measured by
# scripts/profile_bins11-13.py: the verbatim inlined body is fast, the
# jit[name=compute_bins]-wrapped identical body is slow). Eager callers
# should use compute_bins_jit.
def compute_bins(
    means: jax.Array,
    quats: jax.Array,
    log_scales: jax.Array,
    alive: jax.Array,
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    radius_scale: float = 1.0,
    **_unused,
) -> CameraBins:
    """Tile binning only (no gradients). `radius_scale` > 1 inflates splat
    footprints so the lists stay valid as the pose shifts during a tracking
    refinement; the hot loop then calls render(..., bins=...) and skips the
    sort entirely."""
    n = means.shape[0]
    ts = cfg.tile_size
    tiles_x = -(-width // ts)
    tiles_y = -(-height // ts)
    scales = jnp.exp(log_scales)

    def one(vm, K):
        proj = project_gaussians(
            means, quats, scales, vm, K, width, height,
            near=cfg.near, far=cfg.far, eps2d=cfg.eps2d,
            radius_clip=cfg.radius_clip, alive=alive,
        )
        # Materialize projection outputs before binning. Without this
        # barrier XLA:TPU fuses the projection math into the pair-scatter
        # operands and the scatter degrades ~4000x (194 ms vs 0.05 ms
        # measured at N=50k); with materialized inputs it picks the fast
        # path. scripts/profile_bins7/9.py reproduce both sides.
        m2d, radii, depths, valid = jax.lax.optimization_barrier(
            (proj.means2d, proj.radii * radius_scale, proj.depths, proj.valid)
        )
        b = bin_gaussians(
            m2d, radii, depths, valid,
            ts, tiles_x, tiles_y, int(cfg.pairs_per_gaussian * n),
            cfg.tile_capacity, cfg.max_span,
        )
        return b.tile_gauss, b.tile_mask, b.n_pairs

    tg, tm, np_ = jax.vmap(one)(viewmats, Ks)
    return CameraBins(tile_gauss=tg, tile_mask=tm, n_pairs=np_)


# Jitted entry point for eager (host-level) callers only; see the note on
# compute_bins for why jitted code must call the undecorated version.
compute_bins_jit = partial(
    jax.jit, static_argnames=("width", "height", "cfg", "radius_scale")
)(compute_bins)


# NOT @jit — same nested-jit scatter deoptimization as compute_bins (see
# note there): jitted callers (mapping_step, the dp step) must trace this
# body inline. The jitted public entry point is `render` below.
def render_impl(
    means: jax.Array,  # [N, 3]
    quats: jax.Array,  # [N, 4]
    log_scales: jax.Array,  # [N, 3]
    logit_opacities: jax.Array,  # [N]
    logit_colors: jax.Array,  # [N, 3]
    log_uncertainties: jax.Array,  # [N]
    alive: jax.Array,  # [N] bool
    viewmats: jax.Array,  # [C, 4, 4]
    Ks: jax.Array,  # [C, 3, 3]
    width: int,
    height: int,
    bg_rgb: jax.Array | None = None,  # [3]
    cfg: RenderConfig = RenderConfig(),
    probe2d: jax.Array | None = None,  # [C, N, 2] zeros; see means2d grads
    bins: CameraBins | None = None,  # reuse precomputed tile lists
) -> RenderOutput:
    """Render N splats into C cameras. Fully differentiable (incl. viewmats)."""
    n = means.shape[0]
    c = viewmats.shape[0]
    if bg_rgb is None:
        bg_rgb = jnp.zeros((3,), jnp.float32)
    if probe2d is None:
        probe2d = jnp.zeros((c, n, 2), jnp.float32)

    opacities = jax.nn.sigmoid(logit_opacities)
    colors = jax.nn.sigmoid(logit_colors)
    scales = jnp.exp(log_scales)
    betas = jnp.maximum(jnp.exp(log_uncertainties), 0.01)

    from gslam_tpu.ops.binning import TileBins

    def fn(vm, K, pr, b):
        tile_bins = None
        if b is not None:
            tg, tm, np_ = b
            tile_bins = TileBins(
                tile_gauss=tg, tile_mask=tm,
                tile_counts=jnp.sum(tm.astype(jnp.int32), axis=-1),
                n_pairs=np_,
            )
        return _render_single_camera(
            means, quats, scales, opacities, colors, betas, alive,
            vm, K, pr, width, height, bg_rgb, cfg, bins=tile_bins,
        )

    if bins is None:
        rgb, alpha, depth, beta, radii, means2d, depths, n_touched, n_pairs = (
            jax.vmap(lambda vm, K, pr: fn(vm, K, pr, None))(viewmats, Ks, probe2d)
        )
    else:
        rgb, alpha, depth, beta, radii, means2d, depths, n_touched, n_pairs = (
            jax.vmap(lambda vm, K, pr, tg, tm, np_: fn(vm, K, pr, (tg, tm, np_)))(
                viewmats, Ks, probe2d,
                bins.tile_gauss, bins.tile_mask, bins.n_pairs,
            )
        )
    return RenderOutput(
        rgb=rgb, alpha=alpha, depth=depth, beta=beta,
        radii=radii, means2d=means2d, depths=depths,
        n_touched=n_touched, n_pairs=n_pairs,
    )


# Jitted public entry point for eager (host-level) callers.
render = partial(jax.jit, static_argnames=("width", "height", "cfg"))(
    render_impl
)
