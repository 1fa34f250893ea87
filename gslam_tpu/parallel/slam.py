"""Multi-chip SLAM: the full track -> keyframe -> insert -> map -> prune
loop over a `jax.sharding.Mesh`.

Round-3 sharding covered isolated mapping iterations only; this module runs
the complete SLAM loop with the splat buffer and Adam moments model-parallel
in depth bands along the mesh's 'gauss' axis, so map capacity scales with
the number of chips. Parity target is the same loop the single-chip fused
runtime implements (runtime/fused.py, reference frontend.py:432-519 +
backend.py:585-800); PGO/loop closure and gradient densification remain
single-chip features for now.

Communication design (not a translation of the reference's 3-process/NCCL
layout — SURVEY §5.8):

  * hot per-frame ops — every tracking loss/grad evaluation inside the
    L-BFGS line search, and every windowed mapping iteration — use the
    hand-banded `shard_map` decomposition: each device bins/projects/blends
    only its depth band into premultiplied (rgb, alpha, depth, beta)
    layers, one small `all_gather` of the [D, H, W, ~6] layer stack
    composes them, and splat gradients stay band-local (a splat only
    contributes through its own band's layer). Pose/exposure gradients are
    reduced over the mesh by the all_gather transpose automatically.
  * rare ops — keyframe insertion (scatter into dead slots), pruning, and
    the depth repartition — ride GSPMD: the single-chip functions are run
    with sharded operands and XLA partitions the scatters/sorts itself.
    They happen at keyframes only, so their collectives are off the hot
    path.

Band-order exactness: the buffer is kept permuted into ascending camera
depth at the latest tracked pose (`partition_by_depth`), so cross-band
compositing order equals the global depth sort at that pose. Note the
per-band tile lists hold D x `tile_capacity` entries per tile in
aggregate: a tile that saturates on one device renders MORE splats under
band decomposition (strictly more complete) — size `tile_capacity` for
the per-band load, not the global one. Within one
frame's refinement (and across a narrow mapping window) the partition view
lags the render view slightly — the same staleness the single-chip tracker
already accepts for its frozen tile lists (tracking/track.py binning
reuse).

The frame loop itself is host-driven (one dispatch per phase), unlike the
single-chip fused runtime's device-resident lax loop: multi-chip targets
capacity/throughput scale where each dispatch carries orders of magnitude
more work, so host dispatch latency amortizes; the zero-readback fused
runtime remains the single-chip flagship path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gslam_tpu.core.transforms import HIGH, PoseDelta, invert_se3, pose_matrix
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.mapping.gaussians import GaussianMap, empty_map, masked_median
from gslam_tpu.mapping import pruning
from gslam_tpu.mapping.insertion import InsertionConfig, insert_from_depthmap
from gslam_tpu.mapping.optimizer import MaskedAdamState, adam_step, init_adam
from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs_impl
from gslam_tpu.ops.losses import (
    apply_exposure, mapping_photometric, masked_depth_l1,
    tracking_photometric,
)
from gslam_tpu.ops.rasterize import compute_bins, render_impl
from gslam_tpu.ops.ssim import ssim_per_image
from gslam_tpu.ops.track_fused import (
    gather_tracking_tiles, render_tracking_fused,
)
from gslam_tpu.parallel.sharding import partition_by_depth
from gslam_tpu.tracking.track import TrackingConfig, constant_motion_prior

_insert_raw = insert_from_depthmap.__wrapped__


@dataclasses.dataclass(frozen=True)
class ShardedSlamConfig:
    tracking: TrackingConfig = TrackingConfig()
    mapping: MapConfig = MapConfig()
    init_n_new: int = 5000  # bootstrap insertion (reference backend.py:619)
    kf_n_new: int = 100  # per-keyframe insertion (reference backend.py:655)
    idle_iters: int = 2  # mapping iterations on non-keyframe frames
    use_gt_depths: bool = False
    prune_every: int = 10  # frames between low-opacity prunes (0 = off)
    # Abort threshold on the tracking-guard rejection counter (same
    # divergence containment as FusedConfig.abort_unhealthy).
    abort_unhealthy: int = 0


def _compose_bands(rgbs, alphas, depths, betas, beta_bg):
    """Front-to-back composite of per-band premultiplied layers stacked on
    axis 0 (band index = depth order). Matches sharding.py:_band_render."""
    t_cum = jnp.cumprod(1.0 - alphas, axis=0)
    t_prev = jnp.concatenate([jnp.ones_like(t_cum[:1]), t_cum[:-1]], axis=0)
    rgb = jnp.sum(t_prev[..., None] * rgbs, axis=0)
    depth = jnp.sum(t_prev * depths, axis=0)
    beta_p = betas - (1.0 - alphas) * beta_bg
    t_final = t_cum[-1]
    beta = jnp.sum(t_prev * beta_p, axis=0) + t_final * beta_bg
    return rgb, 1.0 - t_final, depth, beta


class ShardedSlam:
    """Host-driven SLAM over a mesh with a 'gauss' axis (splat bands)."""

    def __init__(self, cfg: ShardedSlamConfig, mesh: Mesh, width: int,
                 height: int, capacity: int, kf_capacity: int = 32,
                 seed: int = 0):
        assert "gauss" in mesh.axis_names, mesh.axis_names
        n_band = mesh.shape["gauss"]
        assert capacity % n_band == 0, (capacity, n_band)
        self.cfg, self.mesh = cfg, mesh
        self.width, self.height = width, height
        self.kf_capacity = kf_capacity
        self._gspec = NamedSharding(mesh, P("gauss"))
        self._rspec = NamedSharding(mesh, P())

        def spec_of(x):
            sharded = x.ndim >= 1 and x.shape[0] == capacity
            return self._gspec if sharded else self._rspec

        gmap = empty_map(capacity)
        opt = init_adam(gmap)
        self._map_sh = jax.tree_util.tree_map(spec_of, gmap)
        self._opt_sh = jax.tree_util.tree_map(spec_of, opt)
        self.gmap = jax.device_put(gmap, self._map_sh)
        self.opt = jax.device_put(opt, self._opt_sh)

        # keyframe ring (replicated: cameras are the data-parallel axis,
        # bands the model-parallel one)
        kc = kf_capacity
        self.kf_imgs = jnp.zeros((kc, height, width, 3))
        self.kf_poses = jnp.tile(jnp.eye(4)[None], (kc, 1, 1))
        self.kf_exps = jnp.zeros((kc, 2))
        self.kf_gt_depths = jnp.zeros((kc, height, width))
        self.kf_est_depths = jnp.zeros((kc, height, width))
        self.kf_mask = np.zeros((kc,), bool)
        self.kf_count = 0
        self.kf_frames: list[int] = []

        # pose graph (enable_pgo): per-keyframe splat-visibility snapshots,
        # splat-sharded along 'gauss' like the buffer they index into, and
        # a host-side covisibility adjacency (kf_cap^2 bools — adjacency
        # updates happen at keyframe rate, off the hot path)
        self._vis_sh = NamedSharding(mesh, P(None, "gauss"))
        if self.cfg.mapping.enable_pgo:
            self.kf_vis = jax.device_put(
                jnp.zeros((kc, capacity), bool), self._vis_sh)
        else:
            self.kf_vis = None
        self.adj = np.zeros((kc, kc), bool)
        self.loop_closures = 0  # IoU edges beyond the consecutive chain
        self.total_map_iters = 0
        self._last_probe_grad = None  # [win, cap, 2] dL/dmeans2d, sharded

        self.key = jax.random.PRNGKey(seed)
        self.health = 0
        self.step_ema = 0.0  # EMA per-frame translation (kf_adapt trigger)
        self.innov_ema = 0.0  # accepted-innovation EMA (guard gauge)
        self.consec_rej = 0  # consecutive rejections (guard bound growth)
        self._kf_anchor = np.eye(4, dtype=np.float32)  # tracked pose at
        # the last keyframe event (kf_adapt gauge anchor)
        self.trajectory: list[np.ndarray] = []
        self.exposure_traj: list[np.ndarray] = []
        self._exposure = jnp.zeros((2,))
        self._build_programs()

    # ------------------------- jitted programs -------------------------

    def _build_programs(self):
        mesh, W_, H_ = self.mesh, self.width, self.height
        tcfg, mcfg = self.cfg.tracking, self.cfg.mapping
        use_depth = self.cfg.use_gt_depths
        win = mcfg.window_size

        def prep_band(g, pose, K):
            bins = compute_bins(
                g.means, g.quats, g.log_scales, g.alive, pose[None],
                K[None], W_, H_, tcfg.render,
                radius_scale=tcfg.bin_radius_margin)
            return gather_tracking_tiles(g, bins)

        def band_layers(tiles, pose, K):
            rgb, depth, beta, alpha = render_tracking_fused(
                tiles, pose, K, W_, H_, tcfg.render)
            stack = jax.lax.all_gather(
                jnp.stack([alpha, depth, beta], -1), "gauss")  # [D,H,W,3]
            rgbs = jax.lax.all_gather(rgb, "gauss")  # [D,H,W,3]
            return _compose_bands(
                rgbs, stack[..., 0], stack[..., 1], stack[..., 2],
                tcfg.render.beta_background)

        prep = jax.shard_map(
            prep_band, mesh=mesh, in_specs=(P("gauss"), P(), P()),
            out_specs=P("gauss"))
        layers = jax.shard_map(
            band_layers, mesh=mesh, in_specs=(P("gauss"), P(), P()),
            out_specs=P(), check_vma=False)

        def track(gmap, prior, exposure, img, K, gt_depth):
            tiles = prep(gmap, prior, K)

            def unpack(x):
                pose = pose_matrix(PoseDelta(prior, x[:6], x[6:9]))
                exp = x[9:11] if tcfg.learn_exposure else exposure
                return pose, exp

            def loss_fn(x):
                pose, exp = unpack(x)
                rgb, alpha, depth, beta = layers(tiles, pose, K)
                rgb = apply_exposure(rgb, exp)
                loss = tracking_photometric(
                    rgb, img, beta, tcfg.photometric_loss)
                if use_depth:
                    # mirror track_frame_impl's alpha-normalized depth
                    # lock (tracking/track.py): compare EXPECTED depth
                    # depth/alpha on confidently-covered pixels only —
                    # the raw composite underestimates depth by the
                    # coverage factor on young maps, and unmapped pixels
                    # otherwise contribute a pose-independent bias
                    # (docs/TRACKING_STUDY.md, ADVICE r4).
                    d_hat = depth / jnp.maximum(alpha, 1e-3)
                    loss = loss + tcfg.depth_loss_weight * masked_depth_l1(
                        d_hat[None], gt_depth[None],
                        alpha=alpha[None], alpha_min=tcfg.depth_alpha_min)
                return loss

            x0 = jnp.concatenate([jnp.zeros(9), exposure])
            x, f, n_evals = warmup_lbfgs_impl(
                loss_fn, x0, warmup_steps=tcfg.warmup_steps,
                max_iter=tcfg.lbfgs_max_iter, max_eval=tcfg.lbfgs_max_eval,
                history=tcfg.lbfgs_history, lr=tcfg.pose_lr,
                warmup_lr=tcfg.pose_lr)
            ok = (jnp.all(jnp.isfinite(x)) & jnp.isfinite(f)
                  & (jnp.linalg.norm(x[6:9]) < tcfg.max_step))
            x = jnp.where(ok, x, x0)
            pose, exp = unpack(x)
            return pose, exp, jnp.where(ok, f, 1e3), n_evals, ~ok

        self._track = jax.jit(track)

        # -- keyframe-decision render: composite depth/alpha at a pose --
        def band_render(g, viewmats, Ks):
            out = render_impl(
                **g.render_kwargs(), viewmats=viewmats, Ks=Ks,
                width=W_, height=H_,
                bg_rgb=jnp.zeros((3,), jnp.float32), cfg=mcfg.render)
            rgbs = jax.lax.all_gather(out.rgb, "gauss")
            alphas = jax.lax.all_gather(out.alpha, "gauss")
            depths = jax.lax.all_gather(out.depth, "gauss")
            betas = jax.lax.all_gather(out.beta, "gauss")
            return _compose_bands(rgbs, alphas, depths, betas,
                                  mcfg.render.beta_background)

        render_c = jax.shard_map(
            band_render, mesh=mesh, in_specs=(P("gauss"), P(), P()),
            out_specs=P(), check_vma=False)
        self._render = jax.jit(render_c)

        def kd_stats(gmap, new_pose, prev_pose, K):
            rgb, alpha, depth, _ = render_c(
                gmap, new_pose[None], K[None])
            rel = jnp.matmul(invert_se3(new_pose), prev_pose, precision=HIGH)
            translation = jnp.linalg.norm(rel[:3, 3])
            valid = (alpha[0] > 0.1).reshape(-1)
            med = masked_median(depth[0].reshape(-1), valid)
            cos_z = jnp.dot(new_pose[:3, 2], prev_pose[:3, 2]) / jnp.maximum(
                jnp.linalg.norm(new_pose[:3, 2])
                * jnp.linalg.norm(prev_pose[:3, 2]), 1e-12)
            return translation, med, cos_z, depth[0], alpha[0]

        self._kd_stats = jax.jit(kd_stats)

        # -- banded window render WITH a means2d probe: adding a zero to
        # each band's projected means makes dL/dprobe the band-local
        # dL/dmeans2d — the statistic gradient densification selects on
        # (reference backend.py:330-338), with no cross-band traffic
        # (a splat's 2D-mean gradient only flows through its own band's
        # layer, exactly like its parameter gradients) --
        def band_render_probe(g, viewmats, Ks, probe):
            out = render_impl(
                **g.render_kwargs(), viewmats=viewmats, Ks=Ks,
                width=W_, height=H_,
                bg_rgb=jnp.zeros((3,), jnp.float32), cfg=mcfg.render,
                probe2d=probe)
            rgbs = jax.lax.all_gather(out.rgb, "gauss")
            alphas = jax.lax.all_gather(out.alpha, "gauss")
            depths = jax.lax.all_gather(out.depth, "gauss")
            betas = jax.lax.all_gather(out.beta, "gauss")
            rgb, alpha, depth, beta = _compose_bands(
                rgbs, alphas, depths, betas, mcfg.render.beta_background)
            return rgb, alpha, depth, beta

        render_p = jax.shard_map(
            band_render_probe, mesh=mesh,
            in_specs=(P("gauss"), P(), P(), P(None, "gauss", None)),
            out_specs=P(), check_vma=False)

        # -- windowed mapping: n_iters of banded render + masked 3-term
        # loss + sharded Adam + pose SGD, one dispatch --
        def map_step(gmap, opt, win_imgs, win_poses, win_exps, win_mask,
                     win_depths, K, n_iters):
            Ks = jnp.tile(K[None], (win, 1, 1))
            cap = gmap.capacity

            def one_iter(_, carry):
                g, o, pv, _gp = carry

                def loss_fn(trainable, pv, probe):
                    gm = g.with_trainable(trainable)
                    viewmats = pose_matrix(
                        PoseDelta(win_poses, pv[:, :6], pv[:, 6:9]))
                    rgb, alpha, depth, beta = render_p(
                        gm, viewmats, Ks, probe)
                    rendered = apply_exposure(rgb, win_exps)
                    photo = mapping_photometric(
                        rendered, win_imgs, beta, active_gs=mcfg.active_gs,
                        cam_mask=win_mask)
                    wm = win_mask.astype(jnp.float32)
                    ssim = 1.0 - jnp.sum(
                        ssim_per_image(rgb, win_imgs) * wm
                    ) / jnp.maximum(jnp.sum(wm), 1.0)
                    loss = (1.0 - mcfg.ssim_weight) * photo \
                        + mcfg.ssim_weight * ssim
                    if use_depth:
                        loss = loss + mcfg.depth_loss_weight * \
                            masked_depth_l1(depth, win_depths, win_mask)
                    return loss

                probe0 = jnp.zeros((win, cap, 2))
                g_map, g_pose, g_probe = jax.grad(
                    loss_fn, argnums=(0, 1, 2))(g.trainable(), pv, probe0)
                g2, o2 = adam_step(g, g_map, o)
                pv2 = pv - mcfg.pose_lr * g_pose
                return g2, o2, pv2, g_probe

            pv0 = jnp.zeros((win, 9))
            gp0 = jnp.zeros((win, cap, 2))
            gmap, opt, pv, g_probe = jax.lax.fori_loop(
                0, n_iters, one_iter, (gmap, opt, pv0, gp0))
            # gauge anchor: never move the oldest VALID window pose (early
            # positions may be masked padding duplicates of it)
            first_valid = jnp.argmax(win_mask)
            pv = jnp.where((jnp.arange(win) == first_valid)[:, None],
                           0.0, pv)
            refined = pose_matrix(PoseDelta(win_poses, pv[:, :6], pv[:, 6:9]))
            return gmap, opt, refined, g_probe

        probe_sh = NamedSharding(self.mesh, P(None, "gauss", None))
        self._map_step = jax.jit(
            map_step, out_shardings=(self._map_sh, self._opt_sh,
                                     self._rspec, probe_sh))

        # -- per-splat visibility at one pose (pose-graph snapshots);
        # band-local radii stay band-local: out_specs P('gauss') --
        def band_vis(g, pose, K):
            out = render_impl(
                **g.render_kwargs(), viewmats=pose[None], Ks=K[None],
                width=W_, height=H_,
                bg_rgb=jnp.zeros((3,), jnp.float32), cfg=mcfg.render)
            return out.radii[0] > 0

        self._view_vis = jax.jit(jax.shard_map(
            band_vis, mesh=mesh, in_specs=(P("gauss"), P(), P()),
            out_specs=P("gauss")))

        # -- loop-closure IoU of one visibility row against the ring --
        def vis_iou(kf_vis, vis, kf_mask):
            inter = jnp.sum(kf_vis & vis[None], axis=1).astype(jnp.float32)
            union = jnp.sum(kf_vis | vis[None], axis=1).astype(jnp.float32)
            return jnp.where(kf_mask, inter / jnp.maximum(union, 1.0), 0.0)

        self._vis_iou = jax.jit(vis_iou, out_shardings=self._rspec)

        from gslam_tpu.mapping.insertion import InsertResult

        insert_sh = InsertResult(self._map_sh, self._opt_sh, self._rspec,
                                 self._rspec)
        self._insert_init = jax.jit(
            partial(_insert_raw, n_new=self.cfg.init_n_new,
                    cfg=InsertionConfig(
                        initial_opacity=mcfg.initial_opacity)),
            out_shardings=insert_sh)
        self._insert_kf = jax.jit(
            partial(_insert_raw, n_new=self.cfg.kf_n_new,
                    cfg=InsertionConfig(
                        initial_opacity=mcfg.initial_opacity)),
            out_shardings=insert_sh)

        # -- gradient densification over the banded probe gradient: the
        # single-chip insertion function run under GSPMD, like _insert_kf
        # (a rare op — XLA partitions the top-k/scatter itself) --
        from gslam_tpu.mapping.insertion import densify_by_gradients

        _densify_raw = densify_by_gradients.__wrapped__
        self._densify_prog = jax.jit(
            partial(_densify_raw, width=W_, height=H_,
                    max_new=mcfg.densify_max_new,
                    grow_grad2d=mcfg.grow_grad2d,
                    grow_scale3d=mcfg.grow_scale3d),
            out_shardings=insert_sh)

        def prune(gmap):
            return pruning.apply_prune(
                gmap, pruning.low_opacity_mask(
                    gmap, mcfg.opacity_prune_threshold))

        self._prune = jax.jit(prune, out_shardings=self._map_sh)
        self._repartition = jax.jit(
            partition_by_depth,
            out_shardings=(self._map_sh, self._opt_sh))
        # variant that also permutes the pose graph's splat-indexed
        # visibility snapshots (their columns must track the buffer order)
        self._repartition_vis = jax.jit(
            partition_by_depth,
            out_shardings=(self._map_sh, self._opt_sh, self._vis_sh))

    # ----------------------------- frame loop -----------------------------

    def _window(self):
        """Ring slots of the most recent `window_size` keyframes, padded by
        repeating the oldest resident one, plus the validity mask (padded
        duplicates are masked out of the loss). With enable_pgo the window
        is `recent_window` recents plus pose-graph neighbors of the newest
        keyframe (reference backend.py:193-247 fan-out; same deterministic
        first-k selection as the fused runtime)."""
        mcfg = self.cfg.mapping
        win = mcfg.window_size
        n_recent = mcfg.recent_window if mcfg.enable_pgo else win
        lo = max(self.kf_count - self.kf_capacity, 0)  # oldest resident kf
        ks = np.clip(np.arange(self.kf_count - n_recent, self.kf_count),
                     lo, max(self.kf_count - 1, 0))
        slots = (ks % self.kf_capacity).astype(np.int32)
        mask = np.zeros((n_recent,), bool)
        mask[max(n_recent - (self.kf_count - lo), 0):] = True
        if mcfg.enable_pgo:
            newest = self.kf_frames_slot(max(self.kf_count - 1, 0))
            cand = self.adj[newest] & self.kf_mask
            cand[slots[mask]] = False  # already in the recent set
            extra = np.flatnonzero(cand)[: win - n_recent]
            pad = win - n_recent - len(extra)
            slots = np.concatenate(
                [slots, extra.astype(np.int32),
                 np.zeros((pad,), np.int32)])
            mask = np.concatenate(
                [mask, np.ones((len(extra),), bool),
                 np.zeros((pad,), bool)])
        return jnp.asarray(slots), jnp.asarray(mask)

    def kf_frames_slot(self, k: int) -> int:
        return int(k % self.kf_capacity)

    def _run_mapping(self, slots, mask, n_iters, K):
        gm, opt, refined, g_probe = self._map_step(
            self.gmap, self.opt, self.kf_imgs[slots], self.kf_poses[slots],
            self.kf_exps[slots], mask, self.kf_gt_depths[slots], K,
            jnp.int32(n_iters))
        self.gmap, self.opt = gm, opt
        self.total_map_iters += int(n_iters)
        self._last_probe_grad = g_probe
        # fold refined window poses back into the ring; padded duplicate
        # positions are dropped (a scatter with duplicate indices could
        # otherwise let an unrefined duplicate overwrite the refined pose)
        safe = jnp.where(mask, slots, self.kf_capacity)
        self.kf_poses = self.kf_poses.at[safe].set(refined, mode="drop")

    def step(self, i: int, image, gt_depth, K):
        cfg = self.cfg
        mcfg = cfg.mapping
        img = jnp.asarray(image)
        dep = jnp.asarray(gt_depth) if gt_depth is not None else jnp.zeros(
            (self.height, self.width))

        if i == 0:
            pose = jnp.eye(4)
            self.key, k_a, k_b = jax.random.split(self.key, 3)
            mock_depth = (1.0 + (jax.random.normal(
                k_a, (self.height, self.width)) - 0.5) * 0.3
            ) * mcfg.initial_scale
            mock_alpha = jnp.full((self.height, self.width), 0.01)
            g, o, _n_ins, _n_req = self._insert_init(
                k_b, self.gmap, self.opt, mock_depth, mock_alpha, img, K,
                pose, frame_index=jnp.int32(0),
                gt_depthmap=dep if cfg.use_gt_depths else None)
            self.gmap, self.opt = g, o
            self._add_keyframe(0, img, pose, dep, mock_depth, K)
            self._repartition_all(pose)
            slots, mask = self._window()
            self._run_mapping(slots, mask, mcfg.num_iters_init, K)
            self.trajectory.append(np.eye(4, dtype=np.float32))
            self.exposure_traj.append(np.asarray(self._exposure))
            return

        # constant-motion prior + banded tracking
        t = self.trajectory
        prior = (constant_motion_prior(jnp.asarray(t[-2]), jnp.asarray(t[-1]))
                 if i >= 2 else jnp.asarray(t[-1]))
        self.gmap, self.opt = self._repartition(self.gmap, prior, self.opt)
        pose, exp, _loss, _n_evals, rejected = self._track(
            self.gmap, prior, self._exposure, img, K, dep)
        rejected = bool(rejected)
        # innovation-scaled plausibility gate, same rule as the fused and
        # actor runtimes (TrackingConfig.guard_*): a refinement many
        # times the typical accepted innovation, or a large rotation off
        # the prior, is a basin jump — dead-reckon on the motion model.
        # The bound expands with consecutive rejections so a genuine
        # re-lock correction is accepted (no rejection spiral).
        tcfg = cfg.tracking
        delta = np.asarray(pose) @ np.linalg.inv(np.asarray(prior))
        innov = float(np.linalg.norm(delta[:3, 3]))
        if tcfg.guard_innov_mult > 0.0 and not rejected and i >= 3:
            cos_rot = (float(np.trace(delta[:3, :3])) - 1.0) * 0.5
            bound = (max(tcfg.guard_innov_mult * self.innov_ema,
                         tcfg.guard_step_floor)
                     + self.consec_rej
                     * max(2.0 * self.innov_ema,
                           0.5 * tcfg.guard_step_floor))
            if innov > bound or cos_rot < np.cos(tcfg.guard_max_rot):
                pose, exp = prior, self._exposure
                rejected = True
        if rejected:
            self.consec_rej += 1
        else:
            self.consec_rej = 0
            self.innov_ema = (innov if self.innov_ema == 0.0
                              else 0.8 * self.innov_ema + 0.2 * innov)
        self._exposure = exp
        self.health += int(rejected)
        if cfg.abort_unhealthy and self.health >= cfg.abort_unhealthy:
            raise RuntimeError(
                f"health counter {self.health} >= {cfg.abort_unhealthy}: "
                f"tracking guard rejected too many frames")
        prev_pose_np = np.asarray(t[-1])  # before append: last frame's pose
        self.trajectory.append(np.asarray(pose))
        self.exposure_traj.append(np.asarray(exp))
        rel = np.asarray(pose) @ np.linalg.inv(prev_pose_np)
        step = float(np.linalg.norm(rel[:3, 3]))
        self.step_ema = (step if self.step_ema == 0.0
                         else 0.9 * self.step_ema + 0.1 * step)

        prev_kf_pose = self.kf_poses[self.kf_frames_slot(self.kf_count - 1)]
        tr, med, cos_z, est_depth, est_alpha = self._kd_stats(
            self.gmap, pose, prev_kf_pose, K)
        # motion-adaptive trigger, same rule as the fused runtime (see
        # MapConfig.kf_adapt) — measured in the TRACKED-trajectory gauge
        # (pose at the last keyframe EVENT), not against the mapping-
        # optimized keyframe pose, whose gauge drift fires every frame
        rel_a = np.asarray(pose) @ np.linalg.inv(self._kf_anchor)
        anchor_tr = float(np.linalg.norm(rel_a[:3, 3]))
        adaptive = (
            mcfg.kf_adapt > 0.0
            and self.step_ema > 1e-3 * float(med)
            and anchor_tr > mcfg.kf_adapt * self.step_ema
        )
        take = ((float(tr) > mcfg.kf_m * float(med)) or (
            float(cos_z) < mcfg.kf_cos) or adaptive) and not rejected

        if take:
            self._kf_anchor = np.asarray(pose)
            self.key, k_b = jax.random.split(self.key)
            slots_all = jnp.arange(self.kf_capacity)
            filt_mask = jnp.asarray(self.kf_mask) & (self.kf_count > 1)
            g, o, _n_ins, _n_req = self._insert_kf(
                k_b, self.gmap, self.opt,
                est_depth * mcfg.initial_scale, est_alpha, img, K, pose,
                frame_index=jnp.int32(i),
                kf_viewmats=self.kf_poses[slots_all],
                kf_est_depths=self.kf_est_depths[slots_all],
                kf_mask=filt_mask,
                gt_depthmap=dep if cfg.use_gt_depths else None)
            self.gmap, self.opt = g, o
            self._add_keyframe(i, img, pose, dep, est_depth, K)
            self._repartition_all(pose)

        slots, mask = self._window()
        n_iters = mcfg.num_iters_mapping if take else cfg.idle_iters
        before_iters = self.total_map_iters
        if n_iters > 0:
            self._run_mapping(slots, mask, n_iters, K)

        # gradient densification at the reference cadence (every
        # densify_every total optimization steps, backend.py:330-338),
        # selecting on the final iteration's banded dL/dmeans2d
        if (mcfg.densify_every > 0 and self._last_probe_grad is not None
                and (before_iters // mcfg.densify_every)
                != (self.total_map_iters // mcfg.densify_every)):
            self.key, k_d = jax.random.split(self.key)
            g, o, _n_ins, _n_req = self._densify_prog(
                k_d, self.gmap, self.opt, self._last_probe_grad,
                frame_index=jnp.int32(i))
            self.gmap, self.opt = g, o
            self._last_probe_grad = None
            self._repartition_all(jnp.asarray(self.trajectory[-1]))
        elif cfg.prune_every and (i + 1) % cfg.prune_every == 0:
            # never prune on a pass that just densified (actor parity)
            self.gmap = self._prune(self.gmap)

    def _add_keyframe(self, i, img, pose, gt_depth, est_depth, K=None):
        slot = self.kf_frames_slot(self.kf_count)
        self.kf_imgs = self.kf_imgs.at[slot].set(img)
        self.kf_poses = self.kf_poses.at[slot].set(pose)
        self.kf_exps = self.kf_exps.at[slot].set(self._exposure)
        self.kf_gt_depths = self.kf_gt_depths.at[slot].set(gt_depth)
        self.kf_est_depths = self.kf_est_depths.at[slot].set(est_depth)
        if self.cfg.mapping.enable_pgo and K is not None:
            # pose-graph bookkeeping (reference backend.py:632-737): a
            # visibility snapshot for the new keyframe, the consecutive-
            # chain edge, and loop-closure edges by visible-splat IoU >
            # kf_cov against every resident keyframe. The ring slot being
            # overwritten loses its old edges first.
            prev_slot = self.kf_frames_slot(self.kf_count - 1)
            vis = self._view_vis(self.gmap, jnp.asarray(pose), K)
            iou = np.asarray(self._vis_iou(
                self.kf_vis, vis, jnp.asarray(self.kf_mask)))
            self.kf_vis = self.kf_vis.at[slot].set(vis)
            self.adj[slot, :] = False
            self.adj[:, slot] = False
            if self.kf_count > 0:
                self.adj[slot, prev_slot] = self.adj[prev_slot, slot] = True
            closures = (iou > self.cfg.mapping.kf_cov) & self.kf_mask
            closures[slot] = closures[prev_slot] = False
            if closures.any():
                self.loop_closures += int(closures.sum())
                self.adj[slot, closures] = True
                self.adj[closures, slot] = True
        self.kf_mask[slot] = True
        self.kf_count += 1
        self.kf_frames.append(i)

    def _repartition_all(self, ref_pose):
        """Depth-repartition the buffer (+ Adam moments + pose-graph
        visibility columns) at a reference pose."""
        if self.cfg.mapping.enable_pgo:
            self.gmap, self.opt, self.kf_vis = self._repartition_vis(
                self.gmap, ref_pose, self.opt, self.kf_vis)
        else:
            self.gmap, self.opt = self._repartition(self.gmap, ref_pose,
                                                    self.opt)

    def run(self, dataset, max_frames: int | None = None,
            eval_stride: int = 0) -> dict:
        frames = list(dataset)
        if max_frames is not None:
            frames = frames[:max_frames]
        K = jnp.asarray(frames[0].camera.K)
        for i, f in enumerate(frames):
            gt_depth = getattr(f, "gt_depth", None)
            self.step(i, f.image, gt_depth, K)

        from gslam_tpu.eval.trajectory import ate_mean, ate_rmse

        gt = np.stack([np.asarray(f.gt_pose) for f in frames])
        est = np.stack(self.trajectory)
        nonfinite = int(np.sum((~np.isfinite(est)).any(axis=(1, 2))))
        metrics = {
            "L": len(frames),
            "C": self.kf_count,
            "kf_frames": self.kf_frames,
            "health": self.health,
            "nonfinite_poses": nonfinite,
            # fused.py parity: transient guard rejections are recoveries;
            # diverged means the abort threshold was reached or a pose
            # went non-finite
            "diverged": bool(
                nonfinite > 0
                or (self.health >= self.cfg.abort_unhealthy
                    if self.cfg.abort_unhealthy else self.health > 0)),
            "n_devices": int(np.prod([self.mesh.shape[a]
                                      for a in self.mesh.axis_names])),
            "live": int(jnp.sum(self.gmap.alive)),
            "total_map_iters": self.total_map_iters,
            "loop_closures": self.loop_closures,
        }
        if nonfinite == 0:
            gt_c = np.stack([-m[:3, :3].T @ m[:3, 3] for m in gt])
            est_c = np.stack([-m[:3, :3].T @ m[:3, 3] for m in est])
            # same convention as FusedSlam/SlamSystem: 'ate' is the
            # reference statistic (mean), 'ate_rmse' the RMSE — gates
            # keyed on 'ate' must mean the same thing in every runtime
            metrics["ate"] = ate_mean(gt_c, est_c)
            metrics["ate_rmse"] = ate_rmse(gt_c, est_c)
        else:
            metrics["ate"] = float("inf")
        if eval_stride:
            psnrs = []
            for i in range(0, len(frames), eval_stride):
                w2c = jnp.asarray(est[i])
                rgb, alpha, _d, _b = self._render(
                    self.gmap, w2c[None], K[None])
                # per-frame exposure, as the fused runtime's exposure_traj:
                # scoring an early frame with the final exposure mis-rates
                # it whenever exposure drifted over the sequence
                rgb = apply_exposure(rgb[0], jnp.asarray(
                    self.exposure_traj[i]))
                gt_img = jnp.asarray(frames[i].image)
                mse = float(jnp.mean((rgb - gt_img) ** 2))
                psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
            metrics["psnr"] = float(np.mean(psnrs))
        return metrics
