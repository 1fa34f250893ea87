"""Per-frame camera tracking against a frozen Gaussian map.

TPU-native equivalent of the reference's igs tracking
(/root/reference/gslam/frontend.py:604-662): the pose delta (Zhou-6D
rotation + translation) and the affine exposure pair are packed into one
flat 11-vector and refined by 10 Adam warm-up steps followed by L-BFGS with
strong-Wolfe line search — but here the *entire* optimization, including
every differentiable re-render the line search requests, is one jitted XLA
program; the host dispatches a single call per frame.

The photometric objective is the reference's 'active-nerf' uncertainty-
weighted loss with optional RGB-D depth L1 (frontend.py:113-138), on
exposure-corrected renders (frontend.py:632-636).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import PoseDelta, pose_matrix, invert_se3, HIGH
from gslam_tpu.mapping.gaussians import GaussianMap
from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs_impl
from gslam_tpu.ops.losses import (
    apply_exposure, masked_depth_l1, tracking_photometric,
)
from gslam_tpu.ops.rasterize import RenderConfig, compute_bins, render_impl


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    method: str = "igs"  # 'igs' (L-BFGS) | 'gn' (Gauss-Newton) | 'warp'
    photometric_loss: str = "active-nerf"  # 'l1' | 'mse' | 'active-nerf'
    pose_lr: float = 0.002
    warmup_steps: int = 10
    # L-BFGS budget at reference parity: up to 200 closure evaluations per
    # frame (frontend.py:47,613-619). The r4 isolating study
    # (scripts/study_tracking.py, docs/TRACKING_STUDY.md) showed the old
    # 75-eval cap was the root cause of the r3 flagship divergence: with a
    # PERFECT map and gt motion prior at ~8 cm/frame, 75 evals saturates
    # and leaves 3-6 cm/frame error, while 200 evals converges to
    # 0.3-0.8 cm (bin_radius_margin 1.5 vs 3.0 changed nothing). The
    # in-jit loop exits early on convergence, so the cap only costs on
    # hard frames.
    lbfgs_max_iter: int = 160
    lbfgs_max_eval: int = 200
    lbfgs_history: int = 5
    # Divergence guard: reject the refined pose (fall back to the motion
    # prior) when the optimizer returns a non-finite result or a per-frame
    # translation delta larger than this bound (map units; per-frame motion
    # is a few cm, so 0.5 is generous). The r3 flagship went NaN at frame
    # 24 and ran blind for 136 more frames because nothing checked this —
    # see VERDICT r3. Rejections are counted in FusedState.health and
    # surfaced at the host's backlog-sync readbacks.
    max_step: float = 0.5
    # Innovation-scaled plausibility gate (applied where a history gauge
    # exists: fused/actor/sharded runtimes, not the bare track_frame).
    # The r5 chip gates proved the absolute max_step is too loose at
    # realistic motion: at a ~4 cm/frame gait the tracker basin-jumped
    # 8-12 cm from the prior at f16 (passing the 0.5 m guard) and then
    # accepted a 180-degree-flipped pose at f17 whose mirror view of the
    # splat cloud scores a NOMINAL loss (runs/r5_gate_gn telemetry:
    # kd_cos_z[17] = -0.9999, track_losses[17] = 0.027; the no-SH splat
    # fog looks the same from behind).
    #
    # Gauge: an EMA of ACCEPTED innovations (translation of est vs the
    # motion prior) — the Kalman innovation test, self-tuning per
    # scenario (a half-converged map yields legitimately large
    # corrections; a locked-in run yields mm-scale ones). A track is
    # rejected when its innovation exceeds
    #   max(guard_innov_mult * innov_ema, guard_step_floor)
    #     + n_consec_rejected * max(2 * innov_ema, guard_step_floor / 2)
    # or its rotation off the prior exceeds guard_max_rot radians. The
    # additive term grows the bound while dead-reckoning so a genuine
    # re-lock correction (~= accumulated model error) is ACCEPTED — a
    # fixed bound creates a rejection spiral: each dead-reckoned frame
    # grows the needed correction, guaranteeing the next rejection
    # (observed on the r5 verify run: corrections 3.3 -> 8.6 cm over 5
    # straight rejections, every one refused by a 3 cm floor).
    # guard_innov_mult = 0 disables (reference-parity: no guard at all).
    guard_innov_mult: float = 3.5
    guard_step_floor: float = 0.03
    guard_max_rot: float = 0.35
    learn_exposure: bool = True
    use_gt_depths: bool = False
    # Depth residual weight. The reference uses 0.01 on an UNMASKED L1
    # (frontend.py:134-138) — on texture-poor or partially-mapped views
    # that term is diluted by unmapped pixels (rendered depth ~ 0) and
    # contributes ~1e-4 against a ~3e-3 photometric loss, so tracking is
    # effectively RGB-only and can basin-jump with a low loss (the r4
    # gate failed at f16 with err 7.7 cm, loss 0.004). Default here:
    # alpha-masked residual at weight 1.0 — the pose is geometrically
    # locked wherever the (depth-supervised) map is confident, and the
    # photometric term disambiguates along-ray slides. Set weight 0.01 /
    # alpha_min 0.0 for reference-parity behavior.
    depth_loss_weight: float = 1.0
    depth_alpha_min: float = 0.5
    bin_radius_margin: float = 1.5  # footprint inflation for bin reuse
    fused: bool = True  # per-tile fused projection+blend hot path
    # Coarse-to-fine pyramid (VERDICT r4 weak #2 / next #4): level l runs
    # the same Adam+L-BFGS refinement on a 2^l-downsampled image, coarsest
    # first, each level starting from the previous level's pose. Two wins
    # over the flat 200-eval budget: (a) the photometric basin scales with
    # the blur, so a coarse level pulls in priors the full-res objective
    # basin-jumps on (the r4/r5 gate failure mode at f15-16), and (b) a
    # coarse eval costs 1/4^l of a full-res one, so most of the budget
    # moves to nearly-free levels. 1 = flat (single level, prior behavior).
    pyramid_levels: int = 1
    # per-level L-BFGS eval budgets, coarse -> fine; used when
    # pyramid_levels > 1 (entries beyond pyramid_levels are ignored)
    pyramid_evals: tuple = (100, 70, 50)
    # Gauss-Newton (method='gn'): Levenberg-Marquardt on the weighted
    # residual VECTOR instead of L-BFGS on the scalar loss. The normal
    # system is 9x9 (11x11 with exposure) so each iteration is one
    # linearization (primal render + p batched tangent passes, forward
    # mode through the XLA blend) + one candidate render; quadratic
    # convergence replaces the ~200-eval line-search crawl
    # (docs/TRACKING_STUDY.md: the eval-COUNT lever to 30 FPS).
    gn_iters: int = 10
    gn_lambda0: float = 1e-2  # initial LM damping (scaled by diag(JtJ))
    gn_tol: float = 1e-5  # step-norm early exit
    gn_huber_depth: float = 0.02  # IRLS clamp for the depth L1 term (m)
    render: RenderConfig = RenderConfig()


class TrackResult(NamedTuple):
    pose: jax.Array  # [4, 4] refined world-to-camera
    exposure: jax.Array  # [2]
    loss: jax.Array  # [] final photometric loss
    n_evals: jax.Array  # [] int32 loss/grad evaluations used
    rejected: jax.Array  # [] bool — guard fired; pose is the fallback prior


def constant_motion_prior(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """Constant-velocity pose prediction: b @ inv(a) @ b
    (/root/reference/gslam/frontend.py:176-181)."""
    return jnp.matmul(
        jnp.matmul(pose_b, invert_se3(pose_a), precision=HIGH), pose_b,
        precision=HIGH,
    )


# Undecorated implementation for in-jit callers (the fused SLAM step);
# the jitted public entry point `track_frame` is defined below.
def track_frame_impl(
    gmap: GaussianMap,
    base_pose: jax.Array,  # [4, 4] initial world-to-camera guess
    init_exposure: jax.Array,  # [2] seeded from the previous frame
    gt_img: jax.Array,  # [H, W, 3]
    K: jax.Array,  # [3, 3]
    width: int,
    height: int,
    cfg: TrackingConfig = TrackingConfig(),
    gt_depth: jax.Array | None = None,  # [H, W] for RGB-D mode
) -> TrackResult:
    learn_exposure = cfg.learn_exposure

    # Bin tiles ONCE at the prior pose with inflated footprints; every loss
    # evaluation of the line search then reuses the lists and only recomputes
    # projection + blending. Binning dominated the profile (~88% of a render)
    # and the pose only moves a few pixels within one frame's refinement.
    bins = compute_bins(
        gmap.means, gmap.quats, gmap.log_scales, gmap.alive,
        base_pose[None], K[None], width, height, cfg.render,
        radius_scale=cfg.bin_radius_margin,
    )

    if cfg.fused:
        # Pre-gather pose-independent per-tile rows once; each evaluation is
        # then per-tile projection + the Pallas blend, with the pose gradient
        # a pure reduction (no gathers/scatters in the hot loop).
        from gslam_tpu.ops.track_fused import (
            gather_tracking_tiles, render_tracking_fused,
        )

        tiles = gather_tracking_tiles(gmap, bins)

    def unpack(x):
        pose = pose_matrix(PoseDelta(base_pose, x[:6], x[6:9]))
        exposure = x[9:11] if learn_exposure else init_exposure
        return pose, exposure

    def loss_fn(x):
        pose, exposure = unpack(x)
        if cfg.fused:
            rgb_img, depth_img, beta_img, alpha_img = render_tracking_fused(
                tiles, pose, K, width, height, cfg.render
            )
        else:
            out = render_impl(
                **gmap.render_kwargs(),
                viewmats=pose[None], Ks=K[None],
                width=width, height=height, cfg=cfg.render, bins=bins,
            )
            rgb_img, depth_img, beta_img, alpha_img = (
                out.rgb[0], out.depth[0], out.beta[0], out.alpha[0])
        rgb = apply_exposure(rgb_img, exposure)
        loss = tracking_photometric(
            rgb, gt_img, beta_img, cfg.photometric_loss
        )
        if cfg.use_gt_depths and gt_depth is not None:
            # Expected (alpha-normalized) depth: the renderer accumulates
            # sum(T_i a_i d_i), which underestimates true depth by the
            # coverage factor alpha. On a young map (alpha ~ 0.5-0.8) the
            # unnormalized residual is a large bias at the CORRECT pose
            # and drags tracking (test_realistic_motion regressed to ate
            # 0.066 before this normalization). Differentiable through
            # both depth and alpha.
            d_hat = depth_img / jnp.maximum(alpha_img, 1e-3)
            loss = loss + cfg.depth_loss_weight * masked_depth_l1(
                d_hat[None], gt_depth[None],
                alpha=alpha_img[None], alpha_min=cfg.depth_alpha_min,
            )
        return loss

    x0 = jnp.concatenate([jnp.zeros(9), init_exposure])

    # Adam warm-up + L-BFGS in one single-evaluation-site loop (the render
    # subgraph appears once in the executable; see opt/lbfgs_compact.py).
    # Reference semantics: 10 plain warm-up steps then LBFGS(strong_wolfe)
    # at the pose lr (frontend.py:604-658).
    x, f, n_evals = warmup_lbfgs_impl(
        loss_fn, x0,
        warmup_steps=cfg.warmup_steps,
        max_iter=cfg.lbfgs_max_iter,
        max_eval=cfg.lbfgs_max_eval,
        history=cfg.lbfgs_history,
        lr=cfg.pose_lr,
        warmup_lr=cfg.pose_lr,
    )
    # Divergence guard: a non-finite result or an implausibly large pose
    # delta means the optimization left the photometric basin — keep the
    # motion prior instead of poisoning the trajectory/map with it.
    ok = (
        jnp.all(jnp.isfinite(x))
        & jnp.isfinite(f)
        & (jnp.linalg.norm(x[6:9]) < cfg.max_step)
    )
    x = jnp.where(ok, x, x0)
    # Loss sentinel on rejection: finite (NaN would poison downstream
    # means) but far above any real photometric loss.
    f = jnp.where(ok, f, jnp.float32(1e3))
    pose, exposure = unpack(x)
    return TrackResult(pose=pose, exposure=exposure, loss=f, n_evals=n_evals,
                       rejected=~ok)


def track_frame_gn_impl(
    gmap: GaussianMap,
    base_pose: jax.Array,
    init_exposure: jax.Array,
    gt_img: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    cfg: TrackingConfig = TrackingConfig(),
    gt_depth: jax.Array | None = None,
) -> TrackResult:
    """Levenberg-Marquardt tracking on the weighted residual vector.

    Replaces the reference's 200-closure-eval L-BFGS line search
    (/root/reference/gslam/frontend.py:604-658) with a second-order
    method the 9-11 dim pose/exposure space admits trivially: per LM
    iteration, ONE linearization of the per-pixel residual (a
    `jax.linearize` primal render + p batched tangent passes through the
    pure-XLA blend — the Pallas blend is custom_vjp/reverse-only, so GN
    pins `render.backend='xla'`) builds the p x p normal system, solved
    in-jit by `jnp.linalg.solve`; one more render scores the candidate.

    Residual rows, matching the L-BFGS objective term-for-term:
      * photometric: (exposure-corrected rgb - gt) / beta / sqrt(HW)
        per channel — sum of squares == the 'active-nerf' tracking loss
        (ops/losses.py tracking_photometric), with beta an IRLS weight
        held at the linearization point;
      * depth (RGB-D): the alpha-normalized expected-depth residual with
        IRLS weights w^2 = depth_loss_weight / (max(|r|, huber) * Nvalid)
        so the quadratic model reproduces the alpha-masked depth L1 of
        `masked_depth_l1` around the linearization point.

    `n_evals` counts RENDER passes (primal + candidate = 2/iteration);
    each tangent pass costs roughly one more forward in FLOPs but is
    batched p-wide through the MXU, so device ms — not eval count — is
    the honest cost metric (bench.py measures it directly).
    """
    learn_exposure = cfg.learn_exposure
    p = 11 if learn_exposure else 9

    bins = compute_bins(
        gmap.means, gmap.quats, gmap.log_scales, gmap.alive,
        base_pose[None], K[None], width, height, cfg.render,
        radius_scale=cfg.bin_radius_margin,
    )
    # Forward-mode AD (jax.linearize tangents) cannot cross the Pallas
    # blend's custom_vjp; the chunked XLA blend is jvp-differentiable.
    rcfg = dataclasses.replace(cfg.render, backend="xla")

    n_px = float(height * width)
    use_depth = cfg.use_gt_depths and gt_depth is not None

    def unpack(x):
        pose = pose_matrix(PoseDelta(base_pose, x[:6], x[6:9]))
        exposure = x[9:11] if learn_exposure else init_exposure
        return pose, exposure

    def resid_parts(x):
        """Raw residuals + the primal fields the IRLS weights come from."""
        pose, exposure = unpack(x)
        out = render_impl(
            **gmap.render_kwargs(), viewmats=pose[None], Ks=K[None],
            width=width, height=height, cfg=rcfg, bins=bins,
        )
        rgb = apply_exposure(out.rgb[0], exposure)
        err = (rgb - gt_img).reshape(-1)  # [HW3]
        if use_depth:
            d_hat = out.depth[0] / jnp.maximum(out.alpha[0], 1e-3)
            derr = (d_hat - gt_depth).reshape(-1)  # [HW]
        else:
            derr = jnp.zeros((1,), jnp.float32)
        return err, derr, out.beta[0].reshape(-1), out.alpha[0].reshape(-1)

    gt_d_flat = (gt_depth.reshape(-1) if use_depth else
                 jnp.zeros((1,), jnp.float32))

    def weights(derr, beta, alpha):
        """IRLS row weights at the linearization point (no gradients)."""
        w_rgb = 1.0 / (beta * jnp.sqrt(n_px))  # [HW]; broadcast to 3 chans
        if use_depth:
            valid = (gt_d_flat > 0.0) & (alpha > cfg.depth_alpha_min)
            nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            w2 = cfg.depth_loss_weight / (
                jnp.maximum(jnp.abs(derr), cfg.gn_huber_depth) * nv)
            w_d = jnp.where(valid, jnp.sqrt(w2), 0.0)
        else:
            w_d = jnp.zeros_like(derr)
        return w_rgb, w_d

    def true_loss(err, derr, beta, alpha):
        """The L-BFGS-comparable objective at a rendered point."""
        loss = jnp.mean(
            jnp.sum(err.reshape(-1, 3) ** 2, axis=-1) * beta ** -2.0)
        if use_depth:
            valid = (gt_d_flat > 0.0) & (alpha > cfg.depth_alpha_min)
            nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            loss = loss + cfg.depth_loss_weight * (
                jnp.sum(jnp.where(valid, jnp.abs(derr), 0.0)) / nv)
        return loss

    eye_p = jnp.eye(p, dtype=jnp.float32)

    def lm_iter(carry):
        x, lam, f, n_evals, k, _done = carry
        (err, derr, beta, alpha), jvp = jax.linearize(resid_parts, x)
        w_rgb, w_d = weights(derr, beta, alpha)
        w3 = jnp.repeat(w_rgb, 3)  # channel-interleaved layout of err
        r = jnp.concatenate([err * w3, derr * w_d])
        Je, Jd, _, _ = jax.vmap(jvp)(eye_p)  # [p, HW3], [p, HW]
        J = jnp.concatenate([Je * w3[None, :], Jd * w_d[None, :]], axis=1)
        JtJ = jnp.matmul(J, J.T, precision=HIGH)  # [p, p]
        Jtr = jnp.matmul(J, r, precision=HIGH)  # [p]
        A = JtJ + lam * jnp.diag(jnp.diagonal(JtJ)) + 1e-8 * eye_p
        delta = -jnp.linalg.solve(A, Jtr)
        x_new = x + delta
        err2, derr2, beta2, alpha2 = resid_parts(x_new)
        f_new = true_loss(err2, derr2, beta2, alpha2)
        better = jnp.isfinite(f_new) & (f_new < f)
        x = jnp.where(better, x_new, x)
        f = jnp.where(better, f_new, f)
        lam = jnp.where(better, lam * 0.33, lam * 10.0)
        done = ((better & (jnp.linalg.norm(delta) < cfg.gn_tol))
                | (lam > 1e7))
        return x, lam, f, n_evals + 2, k + 1, done

    def lm_cond(carry):
        _x, _lam, _f, _n, k, done = carry
        return (k < cfg.gn_iters) & ~done

    x0 = jnp.concatenate([jnp.zeros(9), init_exposure])
    e0, d0, b0, a0 = resid_parts(x0)
    f0 = true_loss(e0, d0, b0, a0)
    x, _lam, f, n_evals, _k, _done = jax.lax.while_loop(
        lm_cond, lm_iter,
        (x0, jnp.float32(cfg.gn_lambda0), f0, jnp.int32(1),
         jnp.int32(0), jnp.bool_(False)),
    )
    ok = (
        jnp.all(jnp.isfinite(x))
        & jnp.isfinite(f)
        & (jnp.linalg.norm(x[6:9]) < cfg.max_step)
    )
    x = jnp.where(ok, x, x0)
    f = jnp.where(ok, f, jnp.float32(1e3))
    pose, exposure = unpack(x)
    return TrackResult(pose=pose, exposure=exposure, loss=f, n_evals=n_evals,
                       rejected=~ok)


def _halve_image(img: jax.Array) -> jax.Array:
    """2x2 average pool over the leading [H, W, ...] axes."""
    H, W = img.shape[0], img.shape[1]
    rest = img.shape[2:]
    return img.reshape(H // 2, 2, W // 2, 2, *rest).mean(axis=(1, 3))


def _halve_K(K: jax.Array) -> jax.Array:
    """Intrinsics for the 2x-downsampled image. Pixel samples sit at
    integer coordinates (ops/rasterize.py:108-120) and coarse pixel u'
    averages full-res pixels 2u' and 2u'+1 — sample point u = 2u' + 0.5 —
    so fx' = fx/2 and cx' = (cx - 0.5)/2."""
    s = jnp.asarray([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1.0]], K.dtype)
    off = jnp.asarray(
        [[0, 0, -0.25], [0, 0, -0.25], [0, 0, 0]], K.dtype)
    return jnp.matmul(s, K, precision=HIGH) + off


def track_frame_pyramid_impl(
    gmap: GaussianMap,
    base_pose: jax.Array,
    init_exposure: jax.Array,
    gt_img: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    cfg: TrackingConfig = TrackingConfig(),
    gt_depth: jax.Array | None = None,
) -> TrackResult:
    """Coarse-to-fine pyramid refinement (see TrackingConfig.pyramid_*).

    Each level is a full `track_frame_impl` program at a statically
    2^l-downsampled resolution, seeded with the level above's pose and
    exposure; the whole cascade still jits into ONE XLA program (levels
    are separate static-shape subgraphs). With pyramid_levels == 1 this
    is exactly `track_frame_impl`. `n_evals` is the raw closure-eval
    count summed over levels — note a level-l eval renders 4^-l as many
    pixels, so equal counts are NOT equal device time. `rejected` is
    True only when every level's guard fired (the returned pose is then
    the untouched motion prior)."""
    impl = track_frame_gn_impl if cfg.method == "gn" else track_frame_impl
    L = cfg.pyramid_levels
    # static clip: only as many levels as the image size halves into
    while L > 1 and (width % (1 << (L - 1)) or height % (1 << (L - 1))):
        L -= 1
    if L <= 1:
        return impl(gmap, base_pose, init_exposure, gt_img, K,
                    width, height, cfg, gt_depth)

    imgs, depths, Ks = [gt_img], [gt_depth], [K]
    for _ in range(L - 1):
        imgs.append(_halve_image(imgs[-1]))
        depths.append(
            None if depths[-1] is None else _halve_image(depths[-1]))
        Ks.append(_halve_K(Ks[-1]))

    pose, exposure = base_pose, init_exposure
    n_evals = jnp.int32(0)
    all_rejected = jnp.bool_(True)
    loss = jnp.float32(0.0)
    for lvl in range(L - 1, -1, -1):  # coarsest first
        s = 1 << lvl
        evals = int(cfg.pyramid_evals[L - 1 - lvl])
        rcfg = cfg.render
        if lvl > 0:
            # a coarse image has 4^l fewer tiles over the SAME splats, so
            # per-tile occupancy grows by ~4^l: grow the tile budget to
            # match, capped at 512 — the Pallas blend's backward builds
            # [P=256, M] f32 temporaries in the ~16 MB VMEM scope, which
            # admits M=512 (~8.5 MB) but OOMs at M=1024 (measured 17 MB).
            # A coarse tile then keeps its 512 NEAREST splats, which is
            # the signal that matters for pulling the prior into the fine
            # level's basin.
            cap = min(rcfg.tile_capacity * 4 ** lvl, 512)
            rcfg = dataclasses.replace(
                rcfg,
                tile_capacity=cap,
                tile_chunk=max(1, (rcfg.tile_capacity * rcfg.tile_chunk)
                               // cap),
            )
        cfg_l = dataclasses.replace(
            cfg,
            lbfgs_max_eval=evals,
            lbfgs_max_iter=min(cfg.lbfgs_max_iter, evals),
            # warm-up matters at the coarsest level (farthest prior);
            # finer levels start near their basin already
            warmup_steps=(cfg.warmup_steps if lvl == L - 1
                          else min(cfg.warmup_steps, 3)),
            pyramid_levels=1,
            render=rcfg,
        )
        r = impl(
            gmap, pose, exposure, imgs[lvl], Ks[lvl],
            width // s, height // s, cfg_l, depths[lvl])
        pose, exposure = r.pose, r.exposure
        n_evals = n_evals + r.n_evals
        all_rejected = all_rejected & r.rejected
        loss = r.loss
    return TrackResult(pose=pose, exposure=exposure, loss=loss,
                       n_evals=n_evals, rejected=all_rejected)


# Jitted public entry point for eager (host-level) callers. Dispatches on
# cfg.pyramid_levels (1 = the flat single-level tracker).
track_frame = partial(
    jax.jit, static_argnames=("width", "height", "cfg")
)(track_frame_pyramid_impl)
