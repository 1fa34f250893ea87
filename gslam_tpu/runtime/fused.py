"""Device-resident fused SLAM core: one jitted step per frame, zero host
readbacks until the end of the run.

Motivation. The actor runtime (runtime/system.py) interleaves jitted
kernels with host logic that reads device scalars every frame (keyframe
decision, plateau stop, overflow counters). On the axon TPU transport,
*any* device->host readback permanently flips the process into a slow
dispatch mode (~9.4 s per dispatch, flat, regardless of program size —
measured in scripts/profile_poison*.py), and each dispatch in that mode
pays the full penalty. The actor loop issues dozens of dispatches and
several readbacks per frame, so its wall-clock is dominated by transport
artifacts rather than TPU compute.

This module is the TPU-native answer and the architecture a real
deployment wants anyway: the ENTIRE per-frame SLAM iteration — tracking,
keyframe decision, conditional insertion, windowed map optimization with
plateau early-exit, pruning, trajectory bookkeeping — is one XLA program
over a single device-resident state pytree. The host only feeds pixels in
(`lax.scan` over frame chunks in offline mode; one async dispatch per
frame online) and reads results back once at the end.

Behavioral parity with the actor pipeline (and the reference):
  * tracking: constant-motion prior, exposure carry-over, Adam warm-up +
    strong-Wolfe L-BFGS — identical code path (track_frame_impl).
  * keyframe policy: translation > kf_m * median_depth or view-angle
    (reference backend.py:739-792), evaluated on device.
  * insertion: depth-map densification with the multi-keyframe occlusion
    filter (reference insertion.py:100-273); 5000-splat mock-depth
    bootstrap on frame 0 (reference backend.py:604-630).
  * mapping: the same jitted mapping_step body over a last-8 keyframe ring
    window, with the StopOnPlateau rule (reference utils.py:164-186) as
    device state and per-pass iteration budget (15; 400 at init).
  * pruning: low-opacity / large-radius / optional ill-conditioned masks
    after each pass (reference backend.py:364-391).

Deviations (documented): the frontend tracks against the live map rather
than a 5-frame-stale synced snapshot (strictly fresher); gradient-based
densification (reference backend.py:330-338, fires every 200th step) and
PGO window fan-out run only in the actor runtime; per-frame rerun/disk
telemetry requires host transfers and therefore lives in the actor
runtime too.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import invert_se3, HIGH
from gslam_tpu.mapping.backend_ops import (
    MapConfig, PoseAdamState, init_pose_adam, keyframe_decision_stats,
    mapping_step,
)
from gslam_tpu.mapping.gaussians import GaussianMap, empty_map
from gslam_tpu.mapping.insertion import InsertionConfig, insert_from_depthmap
from gslam_tpu.mapping.keyframes import KeyframeStore, add_keyframe, empty_keyframes
from gslam_tpu.mapping.optimizer import MaskedAdamState, init_adam
from gslam_tpu.mapping import pruning
from gslam_tpu.tracking.track import TrackingConfig, track_frame_impl

# Undecorated bodies: jitted wrappers must not nest (see docs/PERF.md).
_insert_impl = insert_from_depthmap.__wrapped__
_kd_stats_impl = keyframe_decision_stats.__wrapped__
_map_step_impl = mapping_step.__wrapped__


@dataclasses.dataclass(frozen=True)
class FusedConfig:
    tracking: TrackingConfig = TrackingConfig()
    mapping: MapConfig = MapConfig()
    max_frames: int = 2048
    init_n_new: int = 5000  # bootstrap insertion (reference backend.py:619)
    kf_n_new: int = 100  # per-keyframe insertion (reference backend.py:655)
    idle_iters: int = 15  # mapping iterations per frame (idle passes)
    compact_every: int = 32  # frames between in-place live-slot compactions
    use_gt_depths: bool = False

    @property
    def insertion(self) -> InsertionConfig:
        m = self.mapping
        return InsertionConfig(
            depth_variance=0.1 * m.initial_scale,
            no_depth_variance=0.2 * m.initial_scale,
            min_alpha_for_depth=0.1,
            initial_opacity=m.initial_opacity,
        )


class FusedState(NamedTuple):
    """Everything the SLAM iteration touches, resident on device."""

    gmap: GaussianMap
    opt_state: MaskedAdamState
    kf: KeyframeStore
    pose_opt: PoseAdamState
    kf_count: jax.Array  # [] int32 keyframes added so far
    frame_count: jax.Array  # [] int32 frames processed
    traj: jax.Array  # [F, 4, 4] estimated world-to-camera per frame
    exposure_traj: jax.Array  # [F, 2]
    track_losses: jax.Array  # [F]
    kf_flags: jax.Array  # [F] bool — frame became a keyframe
    exposure: jax.Array  # [2] latest exposure (seeds the next frame)
    paused: jax.Array  # [] bool — plateau pause (reset on keyframe)
    plateau_last: jax.Array  # [] f32 last mapping loss
    plateau_count: jax.Array  # [] int32 consecutive decreasing-low steps
    total_map_iters: jax.Array  # [] int32
    max_pairs: jax.Array  # [] int32 overflow telemetry
    key: jax.Array  # PRNG


def init_fused_state(
    cfg: FusedConfig, capacity: int, kf_capacity: int, height: int,
    width: int, seed: int = 0,
) -> FusedState:
    gmap = empty_map(capacity)
    F = cfg.max_frames
    return FusedState(
        gmap=gmap,
        opt_state=init_adam(gmap),
        kf=empty_keyframes(kf_capacity, height, width),
        pose_opt=init_pose_adam(kf_capacity),
        kf_count=jnp.int32(0),
        frame_count=jnp.int32(0),
        traj=jnp.tile(jnp.eye(4, dtype=jnp.float32), (F, 1, 1)),
        exposure_traj=jnp.zeros((F, 2), jnp.float32),
        track_losses=jnp.zeros((F,), jnp.float32),
        kf_flags=jnp.zeros((F,), bool),
        exposure=jnp.zeros((2,), jnp.float32),
        paused=jnp.array(False),
        plateau_last=jnp.array(jnp.inf, jnp.float32),
        plateau_count=jnp.int32(0),
        total_map_iters=jnp.int32(0),
        max_pairs=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )


def constant_motion_prior(pose_a, pose_b):
    return jnp.matmul(
        jnp.matmul(pose_b, invert_se3(pose_a), precision=HIGH), pose_b,
        precision=HIGH,
    )


def slam_step_impl(
    state: FusedState,
    image: jax.Array,  # [H, W, 3]
    gt_depth: jax.Array,  # [H, W] (zeros when not RGB-D)
    K: jax.Array,  # [3, 3]
    width: int,
    height: int,
    cfg: FusedConfig,
) -> FusedState:
    mcfg = cfg.mapping
    kf_cap = state.kf.capacity
    i = state.frame_count

    # ---- tracking (constant-motion prior; skipped on the first frame) ----
    pa = state.traj[jnp.maximum(i - 2, 0)]
    pb = state.traj[jnp.maximum(i - 1, 0)]
    prior = jnp.where(i >= 2, constant_motion_prior(pa, pb), pb)

    def do_track():
        res = track_frame_impl(
            state.gmap, prior, state.exposure, image, K, width, height,
            cfg.tracking,
            gt_depth=gt_depth if cfg.use_gt_depths else None,
        )
        return res.pose, res.exposure, res.loss

    def no_track():
        return prior, state.exposure, jnp.float32(0.0)

    pose, exposure, tloss = jax.lax.cond(i > 0, do_track, no_track)

    # ---- keyframe decision (reference backend.py:739-792) ----
    last_slot = jnp.maximum(state.kf_count - 1, 0) % kf_cap
    prev_kf_pose = state.kf.poses()[last_slot]
    stats = _kd_stats_impl(state.gmap, pose, prev_kf_pose, K, width, height,
                           mcfg)
    take = (
        (i == 0)
        | (stats.translation > mcfg.kf_m * stats.median_depth)
        | (stats.cos_z < mcfg.kf_cos)
    )

    # ---- conditional insertion ----
    slot = state.kf_count % kf_cap
    k_a, k_b, k_next = jax.random.split(state.key, 3)
    icfg = cfg.insertion
    gt_arg = gt_depth if cfg.use_gt_depths else None

    def ins_init():
        # mock noisy unit-depth bootstrap (reference backend.py:604-630)
        mock_depth = (
            1.0 + (jax.random.normal(k_a, (height, width)) - 0.5) * 0.3
        ) * mcfg.initial_scale
        mock_alpha = jnp.full((height, width), 0.01)
        r = _insert_impl(
            k_b, state.gmap, state.opt_state, mock_depth, mock_alpha,
            image, K, pose, n_new=cfg.init_n_new, frame_index=i, cfg=icfg,
            gt_depthmap=gt_arg,
        )
        return r.gmap, r.opt_state

    def ins_kf():
        r = _insert_impl(
            k_b, state.gmap, state.opt_state,
            stats.new_depth * mcfg.initial_scale, stats.new_alpha,
            image, K, pose, n_new=cfg.kf_n_new, frame_index=i, cfg=icfg,
            kf_viewmats=state.kf.poses(), kf_est_depths=state.kf.est_depths,
            kf_mask=state.kf.mask, gt_depthmap=gt_arg,
        )
        return r.gmap, r.opt_state

    def ins_none():
        return state.gmap, state.opt_state

    gmap, opt_state = jax.lax.cond(
        i == 0, ins_init, lambda: jax.lax.cond(take, ins_kf, ins_none)
    )

    # ---- keyframe store write (ring eviction beyond capacity) ----
    def write_kf():
        kf2 = add_keyframe(
            state.kf, slot, image, pose, exposure, i,
            gt_depth=gt_depth, est_depth=stats.new_depth,
        )
        po = state.pose_opt
        po2 = PoseAdamState(
            mu=po.mu.at[slot].set(0.0),
            nu=po.nu.at[slot].set(0.0),
            count=po.count.at[slot].set(0),
        )
        return kf2, po2, state.kf_count + 1

    def keep_kf():
        return state.kf, state.pose_opt, state.kf_count

    kf, pose_opt, kf_count = jax.lax.cond(take, write_kf, keep_kf)

    # ---- optimization window: last `window_size` keyframes of the ring ----
    offs = jnp.arange(mcfg.window_size, dtype=jnp.int32)
    ki = kf_count - 1 - offs
    wmask = ki >= 0
    widx = jnp.where(wmask, ki % kf_cap, 0).astype(jnp.int32)

    # ---- mapping pass: while_loop with plateau early-exit ----
    n_iters = jnp.where(i == 0, mcfg.num_iters_init, cfg.idle_iters)
    paused0 = state.paused & ~take  # keyframes resume optimization
    cap = gmap.capacity

    carry0 = (
        gmap, opt_state, kf, pose_opt,
        jnp.int32(0), paused0, state.plateau_last, state.plateau_count,
        jnp.zeros((mcfg.window_size, cap), jnp.float32),  # last radii
        jnp.zeros((mcfg.window_size, cap), jnp.int32),  # last n_touched
        state.max_pairs,
    )

    def loop_cond(c):
        it, paused = c[4], c[5]
        return (it < n_iters) & ~paused

    def loop_body(c):
        g, o, k2, p, it, paused, last, cnt, _r, _t, mp = c
        g, o, k2, p, aux = _map_step_impl(
            g, o, k2, p, widx, wmask, K, width, height, mcfg)
        loss = aux.photometric_loss
        # StopOnPlateau: low loss AND still decreasing for `patience` steps
        low = loss < mcfg.plateau_min_loss
        dec = last > loss
        cnt = jnp.where(low & dec, cnt + 1, 0)
        paused = paused | (low & (cnt >= mcfg.plateau_patience))
        mp = jnp.maximum(mp, jnp.max(aux.n_pairs).astype(jnp.int32))
        return (g, o, k2, p, it + 1, paused, loss,
                cnt, aux.radii, aux.n_touched, mp)

    (gmap, opt_state, kf, pose_opt, it_done, paused, plast, pcnt,
     radii, n_touched, max_pairs) = jax.lax.while_loop(
        loop_cond, loop_body, carry0)

    # ---- pruning (reference backend.py:364-391); only after real passes ----
    def do_prune():
        remove = pruning.low_opacity_mask(gmap, mcfg.opacity_prune_threshold)
        remove = remove | pruning.large_radius_mask(
            jnp.max(radii, axis=0), mcfg.size_prune_threshold)
        if mcfg.enable_visibility_pruning:
            remove = remove | pruning.ill_conditioned_mask(
                radii[: mcfg.recent_window],
                n_touched[: mcfg.recent_window],
                mcfg.min_visibility_views,
            )
        return pruning.apply_prune(gmap, remove)

    gmap = jax.lax.cond(it_done > 0, do_prune, lambda: gmap)

    # periodic in-place live-slot compaction (SURVEY 5.7 north star):
    # pure permutation, keeps the live set a dense prefix at any capacity
    if cfg.compact_every > 0:
        from gslam_tpu.mapping.gaussians import compact_map

        def do_compact():
            return compact_map(gmap, opt_state)

        gmap, opt_state = jax.lax.cond(
            (i + 1) % cfg.compact_every == 0, do_compact,
            lambda: (gmap, opt_state),
        )

    return state._replace(
        gmap=gmap, opt_state=opt_state, kf=kf, pose_opt=pose_opt,
        kf_count=kf_count, frame_count=i + 1,
        traj=state.traj.at[i].set(pose),
        exposure_traj=state.exposure_traj.at[i].set(exposure),
        track_losses=state.track_losses.at[i].set(tloss),
        kf_flags=state.kf_flags.at[i].set(take),
        exposure=exposure,
        paused=paused, plateau_last=plast, plateau_count=pcnt,
        total_map_iters=state.total_map_iters + it_done,
        max_pairs=max_pairs,
        key=k_next,
    )


# Jitted per-frame entry (online mode: one async dispatch per frame).
slam_step = partial(
    jax.jit, static_argnames=("width", "height", "cfg"),
)(slam_step_impl)


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def slam_scan(
    state: FusedState,
    images: jax.Array,  # [C, H, W, 3]
    gt_depths: jax.Array,  # [C, H, W]
    K: jax.Array,
    width: int,
    height: int,
    cfg: FusedConfig,
) -> FusedState:
    """Offline mode: fold a chunk of frames in ONE dispatch."""

    def body(st, xs):
        img, gtd = xs
        return slam_step_impl(st, img, gtd, K, width, height, cfg), None

    state, _ = jax.lax.scan(body, state, (images, gt_depths))
    return state


class FusedSlam:
    """Host driver around the fused step: streams frames in, reads results
    back once at the end. `chunk` frames are folded per dispatch."""

    def __init__(self, cfg: FusedConfig, width: int, height: int,
                 capacity: int = 2**17, kf_capacity: int = 32, seed: int = 0):
        self.cfg = cfg
        self.width, self.height = width, height
        self.capacity, self.kf_capacity = capacity, kf_capacity
        self.seed = seed

    def run(self, dataset, chunk: int = 16, eval_stride: int = 0,
            sync_every: int = 8) -> dict:
        """chunk > 1 folds frames with lax.scan (fewest dispatches; on the
        current axon TPU stack deep scan nesting can fault the worker, so
        chip runs should use chunk=1). chunk == 1 dispatches slam_step per
        frame and reads back one scalar every `sync_every` frames to bound
        the transport backlog."""
        H, W = self.height, self.width
        state = init_fused_state(
            self.cfg, self.capacity, self.kf_capacity, H, W, self.seed)
        K = jnp.asarray(dataset.camera.K, jnp.float32)

        frames_meta = []  # (index, timestamp, gt_pose) host-side only
        t_start = time.time()
        buf_imgs, buf_depths = [], []

        def flush():
            nonlocal state, buf_imgs, buf_depths
            if not buf_imgs:
                return
            imgs = jnp.asarray(np.stack(buf_imgs), jnp.float32)
            deps = jnp.asarray(np.stack(buf_depths), jnp.float32)
            state = slam_scan(state, imgs, deps, K, W, H, self.cfg)
            buf_imgs, buf_depths = [], []

        zeros_depth = np.zeros((H, W), np.float32)
        for frame in iter(dataset):
            frames_meta.append((frame.index, frame.timestamp, frame.gt_pose))
            depth = (
                np.asarray(frame.gt_depth, np.float32)
                if frame.gt_depth is not None else zeros_depth
            )
            if chunk <= 1:
                state = slam_step(
                    state, jnp.asarray(np.asarray(frame.image, np.float32)),
                    jnp.asarray(depth), K, W, H, self.cfg,
                )
                if sync_every and frame.index % sync_every == sync_every - 1:
                    int(state.frame_count)  # bound the dispatch backlog
            else:
                buf_imgs.append(np.asarray(frame.image, np.float32))
                buf_depths.append(depth)
                if len(buf_imgs) >= chunk:
                    flush()
        flush()
        t_enqueue = time.time() - t_start

        # single readback point: drain + pull results
        n = len(frames_meta)
        traj = np.asarray(state.traj[:n])
        wall = time.time() - t_start
        metrics = {
            "L": n,
            "C": int(state.kf_count),
            "N": int(state.gmap.n_live()),
            "wall_s": wall,
            "enqueue_s": t_enqueue,
            "fps_wall": n / wall if wall > 0 else 0.0,
            "total_map_iters": int(state.total_map_iters),
            "max_pairs_seen": int(state.max_pairs),
            "track_losses_mean": float(np.mean(
                np.asarray(state.track_losses[1:n]))) if n > 1 else 0.0,
            "kf_frames": np.nonzero(np.asarray(state.kf_flags[:n]))[0].tolist(),
        }

        gt = [m[2] for m in frames_meta]
        if all(g is not None for g in gt) and n >= 2:
            from gslam_tpu.eval.trajectory import ate_rmse, trajectory_positions

            gt_t = trajectory_positions(np.stack([np.asarray(g) for g in gt]))
            est_t = trajectory_positions(traj)
            metrics["ate"] = float(ate_rmse(gt_t, est_t))
        self.final_state = state
        self.trajectory = traj

        if eval_stride:
            self._evaluate_renders(dataset, traj, eval_stride, metrics)
        return metrics

    def _evaluate_renders(self, dataset, traj, stride, metrics):
        """Re-render every stride-th frame from the final map and score
        PSNR/SSIM against the dataset images (the run is over; readbacks
        are allowed now)."""
        from gslam_tpu.eval.metrics import psnr
        from gslam_tpu.mapping.backend_ops import render_view_stats
        from gslam_tpu.ops.ssim import ssim as ssim_fn

        K = jnp.asarray(dataset.camera.K, jnp.float32)
        psnrs, ssims = [], []
        for frame in iter(dataset):
            if frame.index % stride != 0 or frame.index >= len(traj):
                continue
            vs = render_view_stats(
                self.final_state.gmap, jnp.asarray(traj[frame.index]), K,
                self.width, self.height, self.cfg.mapping,
            )
            rendered = np.clip(np.asarray(vs.rgb), 0, 1)
            img = np.asarray(frame.image, np.float32)
            psnrs.append(psnr(rendered, img))
            ssims.append(float(ssim_fn(
                jnp.asarray(rendered)[None], jnp.asarray(img)[None])))
        if psnrs:
            metrics["psnr"] = float(np.mean(psnrs))
            metrics["ssim"] = float(np.mean(ssims))
