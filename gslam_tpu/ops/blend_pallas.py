"""Pallas TPU kernel for per-tile alpha compositing (fwd + analytic VJP).

The jnp formulation in ops/rasterize.py materializes ~10 [tiles, pixels,
splats] tensors in HBM per render. This kernel keeps one tile's working set
(pixels x capacity alpha/transmittance matrices) in VMEM, so a render makes
ONE pass over the gathered per-tile splat parameters:

  forward per tile:  sigma -> alpha -> T = exp(prefix-sum log1p(-alpha))
                     -> weights w = alpha*T -> out = w @ features (MXU)
  backward per tile: recompute the forward (no residuals beyond inputs),
     dL/dfeat = w^T @ g_out
     dL/dalpha_m = T_m G_m - S_m/(1-alpha_m) - g_tf tf/(1-alpha_m),
        with G = g_out @ feat^T and S the strict suffix sum of w*G,
     then chain to opacity / conic / 2D-mean cotangents elementwise.

TPU-specific choices:
  * per-splat scalars are laid out splat-minor ([T, c, M]) so the kernel
    only takes row slices — integer indexing of the minor axis would lower
    to (unsupported) dynamic_slice;
  * prefix/suffix sums along the splat axis use Hillis-Steele doubling
    with static shifts (jnp.cumsum has no Mosaic lowering);
  * per-splat gradients accumulate per tile privately (no atomics); the
    caller's gather transpose scatter-adds them back to splat arrays.

Both kernels run in interpret mode off-TPU, so the CPU test suite checks
this exact code path against the jnp oracle.

Replaces the blending half of the reference's CUDA `rasterize_to_pixels`
(/root/reference/gslam/rasterization.py:303-339) including the fork's
`visibility_min_T`-gated `n_touched` side output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGH = jax.lax.Precision.HIGHEST


def _should_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _prefix_sum(x):
    """Inclusive cumulative sum along the last axis as an MXU matmul against
    an upper-triangular 0/1 matrix, made exact in f32 by a hi/lo split.

    Rationale (all measured on v5e): jnp.cumsum has no Mosaic lowering;
    Hillis-Steele doubling needs lane-shift relayouts and runs ~770x slower
    than the MXU; Mosaic only lowers DEFAULT/HIGHEST dot precisions, and
    DEFAULT rounds inputs to bf16. Splitting x = hi + lo with hi the bf16
    roundtrip makes both operands of the 0/1 matmul exactly representable,
    so two DEFAULT-precision passes reproduce the exact f32 result.
    """
    m = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tri = (row <= col).astype(x.dtype)
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    rem = x - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid
    return (
        jnp.dot(hi, tri, preferred_element_type=jnp.float32)
        + jnp.dot(mid, tri, preferred_element_type=jnp.float32)
        + jnp.dot(lo, tri, preferred_element_type=jnp.float32)
    )


def _suffix_sum(x):
    """S_m = sum_{j>m} x_j along the last axis (strict suffix)."""
    total = jnp.sum(x, axis=-1, keepdims=True)
    return total - _prefix_sum(x)


def _pixel_grid(ts: int, tiles_x: int, t):
    """Pixel coordinates of tile t's ts*ts pixels. Returns px, py [P, 1]."""
    P = ts * ts
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (k % ts).astype(jnp.float32)
    ly = (k // ts).astype(jnp.float32)
    return tx * ts + lx, ty * ts + ly


def _alpha_matrix(xy, con, op, px, py, alpha_cut, alpha_clamp):
    """[P, M] effective alpha. xy [2, M], con [3, M], op [1, M]."""
    dx = px - xy[0:1, :]  # [P, M]
    dy = py - xy[1:2, :]
    ca, cb, cc = con[0:1, :], con[1:2, :], con[2:3, :]
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha_raw = op * jnp.exp(-sigma)
    ok = (sigma >= 0.0) & (alpha_raw >= alpha_cut)
    alpha = jnp.where(ok, jnp.minimum(alpha_raw, alpha_clamp), 0.0)
    return alpha, alpha_raw, dx, dy, ok, (ca, cb, cc)


def _fwd_kernel(
    xy_ref, con_ref, op_ref, feat_ref,
    out_ref, tf_ref, touched_ref,
    *, ts: int, tiles_x: int, alpha_cut: float, alpha_clamp: float,
    min_t: float,
):
    t = pl.program_id(0)
    px, py = _pixel_grid(ts, tiles_x, t)
    alpha, _, _, _, ok, _ = _alpha_matrix(
        xy_ref[0], con_ref[0], op_ref[0], px, py, alpha_cut, alpha_clamp
    )
    log1m = jnp.log1p(-alpha)
    logT_incl = _prefix_sum(log1m)
    T = jnp.exp(logT_incl - log1m)  # exclusive transmittance
    w = alpha * T

    # out[p, f] = sum_m w[p, m] feat[f, m]: F is tiny, so unrolled VPU
    # reductions beat a lane-contracting dot (which Mosaic lowers ~10x
    # slower than the natural [P,M]@[M,F] form).
    feat = feat_ref[0]  # [F, M]
    F = feat.shape[0]
    cols = [
        jnp.sum(w * feat[f:f + 1, :], axis=-1, keepdims=True) for f in range(F)
    ]
    out_ref[0] = jnp.concatenate(cols, axis=-1)
    # t_final = exp(sum of all log(1-alpha)) — a reduction, not a slice
    tf_ref[0] = jnp.exp(jnp.sum(log1m, axis=-1, keepdims=True)).T
    touched_ref[0] = jnp.sum(
        (ok & (T > min_t)).astype(jnp.int32), axis=0, keepdims=True
    )


def _bwd_kernel(
    xy_ref, con_ref, op_ref, feat_ref, gout_ref, gtf_ref,
    dxy_ref, dcon_ref, dop_ref, dfeat_ref,
    *, ts: int, tiles_x: int, alpha_cut: float, alpha_clamp: float,
):
    t = pl.program_id(0)
    px, py = _pixel_grid(ts, tiles_x, t)
    op = op_ref[0]  # [1, M]
    feat = feat_ref[0]  # [F, M]
    g_out = gout_ref[0]  # [P, F]
    g_tf = gtf_ref[0]  # [1, P]

    alpha, alpha_raw, dx, dy, ok, (ca, cb, cc) = _alpha_matrix(
        xy_ref[0], con_ref[0], op, px, py, alpha_cut, alpha_clamp
    )
    log1m = jnp.log1p(-alpha)
    logT_incl = _prefix_sum(log1m)
    T = jnp.exp(logT_incl - log1m)
    w = alpha * T
    tf = jnp.exp(jnp.sum(log1m, axis=-1, keepdims=True))  # [P, 1]

    F = feat.shape[0]
    gcols = [g_out[:, f:f + 1] for f in range(F)]  # [P, 1] each

    # dL/dfeat [F, M] = sum_p g_out[p, f] w[p, m]: per-channel reductions
    dfeat_rows = [
        jnp.sum(gcols[f] * w, axis=0, keepdims=True) for f in range(F)
    ]
    dfeat_ref[0] = jnp.concatenate(dfeat_rows, axis=0)

    # G[p, m] = sum_f g_out[p, f] feat[f, m]: per-channel outer products
    G = gcols[0] * feat[0:1, :]
    for f in range(1, F):
        G = G + gcols[f] * feat[f:f + 1, :]
    S = _suffix_sum(w * G)
    one_m = 1.0 - alpha
    g_alpha = T * G - S / one_m - (g_tf.T * tf) / one_m
    live = ok & (alpha_raw < alpha_clamp)
    g_alpha = jnp.where(live, g_alpha, 0.0)

    g_sigma = -alpha * g_alpha  # [P, M]
    op_safe = jnp.maximum(op, 1e-12)
    dop_ref[0] = jnp.sum(g_alpha * alpha, axis=0, keepdims=True) / op_safe

    dca = jnp.sum(0.5 * dx * dx * g_sigma, axis=0, keepdims=True)
    dcb = jnp.sum(dx * dy * g_sigma, axis=0, keepdims=True)
    dcc = jnp.sum(0.5 * dy * dy * g_sigma, axis=0, keepdims=True)
    dcon_ref[0] = jnp.concatenate([dca, dcb, dcc], axis=0)

    # sigma depends on d = pix - xy: dsigma/dxy = -(ca dx + cb dy, cb dx + cc dy)
    gx = jnp.sum(-(ca * dx + cb * dy) * g_sigma, axis=0, keepdims=True)
    gy = jnp.sum(-(cb * dx + cc * dy) * g_sigma, axis=0, keepdims=True)
    dxy_ref[0] = jnp.concatenate([gx, gy], axis=0)


def _block(shape):
    nd = len(shape)
    return pl.BlockSpec(
        (1,) + shape, lambda t, nd=nd: (t,) + (0,) * nd,
        memory_space=pltpu.VMEM,
    )


def _run_fwd(xy_t, con_t, op_t, feat, ts, tiles_x, cfg_tuple):
    alpha_cut, alpha_clamp, min_t = cfg_tuple
    T_tiles, _, M = op_t.shape
    P = ts * ts
    F = feat.shape[1]
    kernel = functools.partial(
        _fwd_kernel, ts=ts, tiles_x=tiles_x,
        alpha_cut=alpha_cut, alpha_clamp=alpha_clamp, min_t=min_t,
    )
    return pl.pallas_call(
        kernel,
        grid=(T_tiles,),
        in_specs=[_block((2, M)), _block((3, M)), _block((1, M)),
                  _block((F, M))],
        out_specs=[_block((P, F)), _block((1, P)), _block((1, M))],
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, P, F), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, M), jnp.int32),
        ],
        interpret=_should_interpret(),
    )(xy_t, con_t, op_t, feat)


def _run_bwd(xy_t, con_t, op_t, feat, g_out, g_tf, ts, tiles_x, cfg_tuple):
    alpha_cut, alpha_clamp, _ = cfg_tuple
    T_tiles, _, M = op_t.shape
    P = ts * ts
    F = feat.shape[1]
    kernel = functools.partial(
        _bwd_kernel, ts=ts, tiles_x=tiles_x,
        alpha_cut=alpha_cut, alpha_clamp=alpha_clamp,
    )
    return pl.pallas_call(
        kernel,
        grid=(T_tiles,),
        in_specs=[_block((2, M)), _block((3, M)), _block((1, M)),
                  _block((F, M)), _block((P, F)), _block((1, P))],
        out_specs=[_block((2, M)), _block((3, M)), _block((1, M)),
                   _block((F, M))],
        out_shape=[
            jax.ShapeDtypeStruct((T_tiles, 2, M), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 3, M), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((T_tiles, F, M), jnp.float32),
        ],
        interpret=_should_interpret(),
    )(xy_t, con_t, op_t, feat, g_out, g_tf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _blend_core(xy_t, con_t, op_t, feat, ts, tiles_x, cfg_tuple):
    return tuple(_run_fwd(xy_t, con_t, op_t, feat, ts, tiles_x, cfg_tuple))


def _vjp_fwd(xy_t, con_t, op_t, feat, ts, tiles_x, cfg_tuple):
    out = _run_fwd(xy_t, con_t, op_t, feat, ts, tiles_x, cfg_tuple)
    return tuple(out), (xy_t, con_t, op_t, feat)


def _vjp_bwd(ts, tiles_x, cfg_tuple, res, cts):
    xy_t, con_t, op_t, feat = res
    g_out, g_tf, _g_touched = cts
    return tuple(
        _run_bwd(xy_t, con_t, op_t, feat, g_out, g_tf, ts, tiles_x, cfg_tuple)
    )


_blend_core.defvjp(_vjp_fwd, _vjp_bwd)


def blend_tiles_rows(xy_rows, con_rows, op_rows, feat_rows, ts, tiles_x,
                     cfg_tuple):
    """Row-layout entry point: every per-splat quantity is splat-minor.

    Args:
      xy_rows:   [T, 2, M]
      con_rows:  [T, 3, M]
      op_rows:   [T, 1, M] (0 for invalid slots)
      feat_rows: [T, F, M]
    Returns:
      out [T, P, F], t_final [T, P], n_touched [T, M] (int32).
    """
    out, tf, touched = _blend_core(
        xy_rows, con_rows, op_rows, feat_rows, ts, tiles_x, cfg_tuple
    )
    return out, tf[:, 0, :], touched[:, 0, :]


def blend_tiles_pallas(xy, con, op, feat, ts, tiles_x, cfg_tuple):
    """Splat-major compatibility wrapper (see blend_tiles_rows).

    Args:
      xy:   [T, M, 2] gathered 2D means
      con:  [T, M, 3] gathered conics
      op:   [T, M] gathered opacities (0 for invalid slots)
      feat: [T, M, F] gathered blend features
    Returns:
      out [T, P, F], t_final [T, P], n_touched [T, M] (int32).
    """
    return blend_tiles_rows(
        jnp.swapaxes(xy, 1, 2), jnp.swapaxes(con, 1, 2), op[:, None, :],
        jnp.swapaxes(feat, 1, 2), ts, tiles_x, cfg_tuple,
    )
