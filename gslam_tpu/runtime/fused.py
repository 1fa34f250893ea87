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

  * pose graph (enable_pgo): per-keyframe visibility snapshots, consecutive
    + IoU>kf_cov loop-closure edges over the slot adjacency matrix, and
    recent+fan-out window selection — all as fixed-shape device state
    (reference backend.py:675-737,193-247).
  * gradient densification: duplicate/split by dL/dmeans2d norm when a
    frame's pass crosses a multiple of densify_every total steps
    (reference backend.py:330-338).

Deviations (documented): the frontend tracks against the live map rather
than a 5-frame-stale synced snapshot (strictly fresher); PGO fan-out picks
the first k graph neighbors instead of random sampling; densification uses
the final iteration's gradients post-pass instead of mid-pass; per-frame
rerun/disk telemetry requires host transfers and therefore lives in the
actor runtime.
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
from gslam_tpu.mapping.insertion import (
    InsertionConfig, densify_by_gradients, insert_from_depthmap,
)
from gslam_tpu.mapping.keyframes import KeyframeStore, add_keyframe, empty_keyframes
from gslam_tpu.mapping.optimizer import MaskedAdamState, init_adam
from gslam_tpu.mapping import pruning
from gslam_tpu.tracking.track import (
    TrackingConfig, track_frame_pyramid_impl,
)

# Undecorated bodies: jitted wrappers must not nest (see docs/PERF.md).
_insert_impl = insert_from_depthmap.__wrapped__
_kd_stats_impl = keyframe_decision_stats.__wrapped__
_map_step_impl = mapping_step.__wrapped__
_densify_impl = densify_by_gradients.__wrapped__


@dataclasses.dataclass(frozen=True)
class FusedConfig:
    tracking: TrackingConfig = TrackingConfig()
    mapping: MapConfig = MapConfig()
    max_frames: int = 2048
    init_n_new: int = 5000  # bootstrap insertion (reference backend.py:619)
    kf_n_new: int = 100  # per-keyframe insertion (reference backend.py:655)
    idle_iters: int = 15  # mapping iterations per frame (idle passes)
    # Cap on bootstrap mapping iterations folded into frame 0's dispatch;
    # the remainder runs as slam_refine dispatches driven by FusedSlam.run.
    # 0 = whole bootstrap in one dispatch (CPU / small runs). On the axon
    # TPU worker a single dispatch folding ~400 mapping iterations is
    # killed by a per-dispatch limit (docs/PERF.md rule 8), so chip runs
    # need this set (main.py --fused defaults it to 50 on TPU).
    init_iters_per_dispatch: int = 0
    compact_every: int = 32  # frames between in-place live-slot compactions
    # Host-triggered geometric capacity growth (grow_fused_state): when a
    # backlog-sync readback sees live_count >= grow_watermark * capacity,
    # the buffer doubles (up to max_capacity; 0 disables growth). On the
    # axon chip keep max_capacity <= 32768 (docs/PERF.md rule 7).
    max_capacity: int = 0
    grow_watermark: float = 0.85
    use_gt_depths: bool = False
    # "while" = lax.while_loop with plateau early-exit (fewest iterations);
    # "fori" = static trip count with a cond-skipped body (identical result,
    # scan-friendly control flow — see docs/PERF.md on the slam_scan fault).
    mapping_loop: str = "while"
    # Host abort threshold on the device-resident health counter (count of
    # guard-rejected tracked frames + non-finite mapping losses), checked
    # at every backlog-sync readback. A doomed run (r3 flagship: NaN at
    # frame 24, 136 blind frames after) now stops within sync_every frames.
    # 0 disables the abort.
    abort_unhealthy: int = 4
    # NOTE: the chunk dispatch flavor ("scan" | "unroll") is a host-only
    # choice and deliberately NOT config state: on FusedConfig it would be
    # part of every jit static key and invalidate compile caches when
    # toggled even though no traced code reads it. Pass it to
    # FusedSlam.run(chunk_backend=...) instead.

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
    inserted_total: jax.Array  # [] int32 splats actually scattered
    dropped_total: jax.Array  # [] int32 candidates lost to a full buffer
    live_count: jax.Array  # [] int32 live splats (drives host-side growth)
    health: jax.Array  # [] int32 rejected tracks + non-finite mapping
    # losses so far; read at backlog syncs so the host can abort early
    step_ema: jax.Array  # [] f32 EMA of per-frame camera translation —
    # drives the motion-adaptive keyframe trigger (kf_adapt)
    innov_ema: jax.Array  # [] f32 EMA of ACCEPTED tracking innovations
    # (translation of est vs the motion prior) — the plausibility-gate
    # gauge (TrackingConfig.guard_innov_mult)
    consec_rej: jax.Array  # [] int32 consecutive guard rejections —
    # expands the gate bound so a genuine re-lock correction (which grows
    # with dead-reckoned drift) is accepted rather than spiral-rejected
    kf_anchor: jax.Array  # [4, 4] TRACKED pose at the last keyframe event
    # (tracking gauge — the adaptive trigger must not measure across the
    # mapping-optimized keyframe gauge, whose drift vs the tracked
    # trajectory grows without bound and fires the trigger every frame)
    n_evals_traj: jax.Array  # [F] int32 tracking evals per frame
    kd_translation: jax.Array  # [F] keyframe-decision translation
    kd_median_depth: jax.Array  # [F] keyframe-decision median depth
    kd_cos_z: jax.Array  # [F] keyframe-decision view-axis cosine
    kf_vis: jax.Array  # [kf_cap, cap] bool per-keyframe splat visibility
    # snapshots for covisibility loop closure ([kf_cap, 1] dummy w/o PGO)
    adj: jax.Array  # [kf_cap, kf_cap] bool pose-graph adjacency over slots
    key: jax.Array  # PRNG


def init_fused_state(
    cfg: FusedConfig, capacity: int, kf_capacity: int, height: int,
    width: int, seed: int = 0,
) -> FusedState:
    gmap = empty_map(capacity)
    F = cfg.max_frames
    vis_cols = capacity if cfg.mapping.enable_pgo else 1
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
        inserted_total=jnp.int32(0),
        dropped_total=jnp.int32(0),
        live_count=jnp.int32(0),
        health=jnp.int32(0),
        step_ema=jnp.float32(0.0),
        innov_ema=jnp.float32(0.0),
        consec_rej=jnp.int32(0),
        kf_anchor=jnp.eye(4, dtype=jnp.float32),
        n_evals_traj=jnp.zeros((F,), jnp.int32),
        kd_translation=jnp.zeros((F,), jnp.float32),
        kd_median_depth=jnp.zeros((F,), jnp.float32),
        kd_cos_z=jnp.zeros((F,), jnp.float32),
        kf_vis=jnp.zeros((kf_capacity, vis_cols), bool),
        adj=jnp.zeros((kf_capacity, kf_capacity), bool),
        key=jax.random.PRNGKey(seed),
    )


def ring_slot(k, kf_cap: int):
    """Keyframe-store slot of the k-th keyframe (ordinal, 0-based).

    Slot 0 is reserved for the bootstrap keyframe — the gauge anchor whose
    pose stays frozen (frame_idx == 0 in mapping_step; reference
    backend.py:457-470) — and is never evicted. Later keyframes rotate
    through slots 1..kf_cap-1, evicting the oldest non-initial keyframe,
    matching the actor policy (runtime/backend.py:286-294)."""
    return jnp.where(k == 0, 0, 1 + (k - 1) % (kf_cap - 1)).astype(jnp.int32)


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
        res = track_frame_pyramid_impl(
            state.gmap, prior, state.exposure, image, K, width, height,
            cfg.tracking,
            gt_depth=gt_depth if cfg.use_gt_depths else None,
        )
        return (res.pose, res.exposure, res.loss, res.n_evals,
                res.rejected.astype(jnp.int32))

    def no_track():
        return (prior, state.exposure, jnp.float32(0.0), jnp.int32(0),
                jnp.int32(0))

    pose, exposure, tloss, n_evals, rejected = jax.lax.cond(
        i > 0, do_track, no_track)

    # ---- innovation-scaled plausibility gate (TrackingConfig.guard_*) --
    # The in-tracker guard only bounds the step absolutely (max_step);
    # here a history gauge exists: state.innov_ema tracks the typical
    # ACCEPTED innovation (translation of the refined pose vs the motion
    # prior), so a refinement many times that scale — or a large rotation
    # off the prior — is a basin jump, not a correction. It falls back to
    # the prior and counts as a rejection: the pose stays on the motion
    # model, the map stays unpoisoned (keyframes are gated on rejection
    # below), and the next frame re-tracks against a clean map. The bound
    # EXPANDS with consecutive rejections (state.consec_rej): a genuine
    # re-lock correction equals the accumulated dead-reckoning error, and
    # a fixed bound would reject every recovery attempt (the r5 spiral:
    # corrections 3.3 -> 8.6 cm over 5 straight rejections).
    tcfg = cfg.tracking
    innov_ema, consec_rej = state.innov_ema, state.consec_rej
    if tcfg.guard_innov_mult > 0.0:
        delta = jnp.matmul(pose, invert_se3(prior), precision=HIGH)
        innov = jnp.linalg.norm(delta[:3, 3])
        cos_rot = (jnp.trace(delta[:3, :3]) - 1.0) * 0.5
        bound = (
            jnp.maximum(tcfg.guard_innov_mult * innov_ema,
                        tcfg.guard_step_floor)
            + consec_rej.astype(jnp.float32)
            * jnp.maximum(2.0 * innov_ema, 0.5 * tcfg.guard_step_floor))
        implaus = (i >= 3) & (
            (innov > bound) | (cos_rot < jnp.cos(tcfg.guard_max_rot)))
        pose = jnp.where(implaus, prior, pose)
        exposure = jnp.where(implaus, state.exposure, exposure)
        rejected = rejected + implaus.astype(jnp.int32)
        accepted = (rejected == 0) & (i >= 1)
        innov_ema = jnp.where(
            accepted,
            jnp.where(innov_ema == 0.0, innov,
                      0.8 * innov_ema + 0.2 * innov),
            innov_ema)
        consec_rej = jnp.where(rejected > 0, consec_rej + 1,
                               jnp.where(i >= 1, jnp.int32(0), consec_rej))

    # ---- keyframe decision (reference backend.py:739-792) ----
    last_slot = ring_slot(jnp.maximum(state.kf_count - 1, 0), kf_cap)
    prev_kf_pose = state.kf.poses()[last_slot]
    stats = _kd_stats_impl(state.gmap, pose, prev_kf_pose, K, width, height,
                           mcfg)
    # Motion-adaptive trigger (VERDICT r4 weak #7/#8 + TRACKING_STUDY
    # "keyframe density is the third root cause"): a fixed kf_m *
    # median_depth threshold is a per-scene constant — 45 cm at the
    # reference default, which starves mapping on translation-dominant
    # scenes where tracking leaves the mapped frustum in a few frames.
    # Scale the trigger to the OBSERVED median per-frame step instead:
    # take a keyframe once the camera has moved kf_adapt frames' worth of
    # its own recent motion since the last keyframe. An EMA floor keeps a
    # parked camera from taking noise-triggered keyframes.
    frame_step = jnp.linalg.norm(
        jnp.matmul(pose, invert_se3(state.traj[jnp.maximum(i - 1, 0)]),
                   precision=HIGH)[:3, 3])
    step_ema = jnp.where(
        i <= 0, state.step_ema,
        jnp.where(i == 1, frame_step,
                  0.9 * state.step_ema + 0.1 * frame_step))
    moving = step_ema > 1e-3 * stats.median_depth
    anchor_tr = jnp.linalg.norm(
        jnp.matmul(pose, invert_se3(state.kf_anchor),
                   precision=HIGH)[:3, 3])
    adaptive = (
        (mcfg.kf_adapt > 0.0) & moving
        & (anchor_tr > mcfg.kf_adapt * step_ema)
    )
    take = (
        (i == 0)
        | (((stats.translation > mcfg.kf_m * stats.median_depth)
            | (stats.cos_z < mcfg.kf_cos)
            | adaptive)
           # never take a keyframe on a guard-rejected frame: inserting
           # splats at a dead-reckoned pose poisons the map exactly when
           # tracking most needs it clean (the r5 gate's f16-f23 keyframe
           # burst inserted splats out to 34 m median depth)
           & (rejected == 0))
    )
    kf_anchor = jnp.where(take, pose, state.kf_anchor)

    # ---- conditional insertion ----
    slot = ring_slot(state.kf_count, kf_cap)
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
        return r.gmap, r.opt_state, r.n_inserted, r.n_requested

    def ins_kf():
        # The occlusion filter only engages once a second keyframe exists:
        # the bootstrap keyframe's est_depth was rendered against an empty
        # map, so testing candidates against it is meaningless (the actor
        # gates identically; runtime/backend.py:361-368).
        filt_mask = state.kf.mask & (state.kf_count > 1)
        r = _insert_impl(
            k_b, state.gmap, state.opt_state,
            stats.new_depth * mcfg.initial_scale, stats.new_alpha,
            image, K, pose, n_new=cfg.kf_n_new, frame_index=i, cfg=icfg,
            kf_viewmats=state.kf.poses(), kf_est_depths=state.kf.est_depths,
            kf_mask=filt_mask, gt_depthmap=gt_arg,
        )
        return r.gmap, r.opt_state, r.n_inserted, r.n_requested

    def ins_none():
        return state.gmap, state.opt_state, jnp.int32(0), jnp.int32(0)

    gmap, opt_state, n_ins, n_req = jax.lax.cond(
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
        if mcfg.enable_pgo:
            # visibility snapshot for this keyframe + consecutive-keyframe
            # covisibility edge (reference backend.py:672-673); the slot
            # being overwritten loses all its old edges first.
            vis2 = state.kf_vis.at[slot].set(stats.new_visible)
            adj2 = state.adj.at[slot, :].set(False).at[:, slot].set(False)
            is_consec = state.kf_count > 0
            adj2 = adj2.at[slot, last_slot].set(is_consec)
            adj2 = adj2.at[last_slot, slot].set(is_consec)
        else:
            vis2, adj2 = state.kf_vis, state.adj
        return kf2, po2, state.kf_count + 1, vis2, adj2

    def keep_kf():
        return (state.kf, state.pose_opt, state.kf_count, state.kf_vis,
                state.adj)

    kf, pose_opt, kf_count, kf_vis, adj = jax.lax.cond(take, write_kf, keep_kf)

    # Bootstrap optimization budget for THIS dispatch. On the axon
    # transport a single dispatch folding all `num_iters_init` mapping
    # iterations exceeds the worker's per-dispatch time limit and kills it
    # (docs/PERF.md rule 8: 400-iter init crashed at a capacity where a
    # 30-iter init ran fine), so `init_iters_per_dispatch` caps the
    # in-step share and FusedSlam.run drives the remainder through
    # slam_refine dispatches.
    ipd = cfg.init_iters_per_dispatch
    init_budget = min(mcfg.num_iters_init, ipd) if ipd else mcfg.num_iters_init
    n_iters = jnp.where(i == 0, init_budget, cfg.idle_iters)

    (gmap, opt_state, kf, pose_opt, paused, plast, pcnt, total_iters,
     max_pairs, kf_vis, adj, d_ins, d_req, k_next) = _mapping_phase(
        state, gmap, opt_state, kf, pose_opt, kf_count, kf_vis, adj,
        take, i, n_iters, k_next, K, width, height, cfg,
        allow_compact=True,
    )
    n_ins, n_req = n_ins + d_ins, n_req + d_req

    # Health accounting: guard-rejected tracks plus non-finite mapping
    # losses (a NaN map poisons every later frame; count it the moment it
    # appears so the host's next backlog-sync readback can abort the run).
    map_bad = (total_iters > state.total_map_iters) & ~jnp.isfinite(plast)
    health = state.health + rejected + map_bad.astype(jnp.int32)

    return state._replace(
        gmap=gmap, opt_state=opt_state, kf=kf, pose_opt=pose_opt,
        kf_count=kf_count, frame_count=i + 1,
        traj=state.traj.at[i].set(pose),
        exposure_traj=state.exposure_traj.at[i].set(exposure),
        track_losses=state.track_losses.at[i].set(tloss),
        kf_flags=state.kf_flags.at[i].set(take),
        exposure=exposure,
        paused=paused, plateau_last=plast, plateau_count=pcnt,
        total_map_iters=total_iters,
        max_pairs=max_pairs,
        inserted_total=state.inserted_total + n_ins,
        dropped_total=state.dropped_total + (n_req - n_ins),
        live_count=jnp.sum(gmap.alive).astype(jnp.int32),
        health=health,
        step_ema=step_ema,
        innov_ema=innov_ema,
        consec_rej=consec_rej,
        kf_anchor=kf_anchor,
        n_evals_traj=state.n_evals_traj.at[i].set(n_evals),
        kd_translation=state.kd_translation.at[i].set(stats.translation),
        kd_median_depth=state.kd_median_depth.at[i].set(stats.median_depth),
        kd_cos_z=state.kd_cos_z.at[i].set(stats.cos_z),
        kf_vis=kf_vis, adj=adj,
        key=k_next,
    )


def _mapping_phase(
    state: FusedState,
    gmap, opt_state, kf, pose_opt, kf_count, kf_vis, adj,
    take, i, n_iters, key,
    K: jax.Array,
    width: int,
    height: int,
    cfg: FusedConfig,
    allow_compact: bool = True,
):
    """Windowed map optimization + densify + prune + loop closure +
    compaction, shared by the per-frame step and the idle refine step.

    `take`/`i`/`n_iters` are traced scalars: whether this pass follows a
    keyframe add, the current frame index, and the mapping-iteration bound.
    Returns the updated buffers plus densify insert/request counts and the
    advanced PRNG key.
    """
    mcfg = cfg.mapping
    kf_cap = kf.capacity
    k_next = key

    # ---- optimization window ----
    # Plain mode: the last `window_size` keyframes of the ring. With PGO:
    # the last `recent_window` keyframes plus pose-graph neighbors of the
    # newest keyframe (reference backend.py:193-247 fan-out; deterministic
    # first-k selection instead of the reference's random sampling).
    n_recent = mcfg.recent_window if mcfg.enable_pgo else mcfg.window_size
    offs = jnp.arange(n_recent, dtype=jnp.int32)
    ki = kf_count - 1 - offs
    # ordinal ki is still resident iff it is the anchor (0) or among the
    # last kf_cap-1 keyframes (ring eviction of non-initial slots)
    resident = (ki == 0) | (ki >= kf_count - (kf_cap - 1))
    rmask = (ki >= 0) & resident
    rslots = jnp.where(rmask, ring_slot(jnp.maximum(ki, 0), kf_cap), 0)
    if mcfg.enable_pgo:
        newest = ring_slot(jnp.maximum(kf_count - 1, 0), kf_cap)
        in_recent = jnp.zeros((kf_cap,), bool).at[
            jnp.where(rmask, rslots, kf_cap)
        ].set(True, mode="drop")
        cand = adj[newest] & ~in_recent & kf.mask
        n_extra = mcfg.window_size - n_recent
        extra = jnp.nonzero(cand, size=n_extra, fill_value=kf_cap)[0]
        emask = extra < kf_cap
        widx = jnp.concatenate(
            [rslots, jnp.where(emask, extra, 0).astype(jnp.int32)])
        wmask = jnp.concatenate([rmask, emask])
    else:
        widx, wmask = rslots, rmask

    # ---- mapping pass: while_loop with plateau early-exit ----
    paused0 = state.paused & ~take  # keyframes resume optimization
    cap = gmap.capacity

    carry0 = (
        gmap, opt_state, kf, pose_opt,
        jnp.int32(0), paused0, state.plateau_last, state.plateau_count,
        jnp.zeros((mcfg.window_size, cap), jnp.float32),  # last radii
        jnp.zeros((mcfg.window_size, cap), jnp.int32),  # last n_touched
        jnp.zeros((mcfg.window_size, cap, 2), jnp.float32),  # last dL/dm2d
        state.max_pairs,
    )

    def loop_cond(c):
        it, paused = c[4], c[5]
        return (it < n_iters) & ~paused

    def loop_body(c):
        g, o, k2, p, it, paused, last, cnt, _r, _t, _g2, mp = c
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
                cnt, aux.radii, aux.n_touched, aux.means2d_grad, mp)

    if cfg.mapping_loop == "fori":
        # Static trip count with a cond-skipped body: bitwise-identical
        # result to the while_loop (skipped iterations are the identity),
        # but scan-friendly control flow for the chunked dispatch path.
        n_static = max(mcfg.num_iters_init, cfg.idle_iters)

        def fori_body(_, c):
            return jax.lax.cond(loop_cond(c), loop_body, lambda x: x, c)

        carry = jax.lax.fori_loop(0, n_static, fori_body, carry0)
    else:
        carry = jax.lax.while_loop(loop_cond, loop_body, carry0)
    (gmap, opt_state, kf, pose_opt, it_done, paused, plast, pcnt,
     radii, n_touched, m2d_grad, max_pairs) = carry

    total_iters = state.total_map_iters + it_done

    # ---- gradient-driven densification (reference backend.py:330-338):
    # fires when this frame's pass crossed a multiple of densify_every
    # total optimization steps, using the final iteration's dL/dmeans2d
    # (the actor densifies mid-pass; cadence-equivalent deviation). ----
    densified = jnp.array(False)
    d_ins = d_req = jnp.int32(0)
    if mcfg.densify_every > 0:
        k_dens, k_next = jax.random.split(k_next)
        densified = (it_done > 0) & (
            (state.total_map_iters // mcfg.densify_every)
            != (total_iters // mcfg.densify_every)
        )

        def do_densify():
            r = _densify_impl(
                k_dens, gmap, opt_state, m2d_grad, width, height,
                mcfg.densify_max_new, i,
                grow_grad2d=mcfg.grow_grad2d,
                grow_scale3d=mcfg.grow_scale3d,
            )
            return r.gmap, r.opt_state, r.n_inserted, r.n_requested

        gmap, opt_state, d_ins, d_req = jax.lax.cond(
            densified, do_densify,
            lambda: (gmap, opt_state, jnp.int32(0), jnp.int32(0)),
        )

    # ---- pruning (reference backend.py:364-391); only after real passes,
    # and never on a pass that just densified (actor sets prune=False) ----
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

    gmap = jax.lax.cond((it_done > 0) & ~densified, do_prune, lambda: gmap)

    if mcfg.enable_pgo:
        # Refresh visibility snapshots for the window keyframes from the
        # final mapping iteration, then recompute covisibility loop-closure
        # edges by IoU > kf_cov over all resident pairs (reference
        # backend.py:675-737, add_pgo_constraints on each keyframe add).
        vis_w = jnp.where(wmask[:, None], radii > 0, False)
        kf_vis = kf_vis.at[jnp.where(wmask, widx, kf_cap)].set(
            vis_w, mode="drop")

        def close_loops(a):
            vf = kf_vis.astype(jnp.float32)
            inter = jnp.matmul(vf, vf.T, precision=HIGH)
            counts = jnp.sum(vf, axis=1)
            union = counts[:, None] + counts[None, :] - inter
            iou = inter / jnp.maximum(union, 1.0)
            valid = kf.mask[:, None] & kf.mask[None, :]
            eye = jnp.eye(kf_cap, dtype=bool)
            return a | ((iou > mcfg.kf_cov) & valid & ~eye)

        adj = jax.lax.cond(take, close_loops, lambda a: a, adj)

    # periodic in-place live-slot compaction (SURVEY 5.7 north star):
    # pure permutation, keeps the live set a dense prefix at any capacity.
    # kf_vis columns are per-slot, so they must ride the same permutation
    # or later loop-closure IoUs would compare stale slot assignments.
    if cfg.compact_every > 0 and allow_compact:
        from gslam_tpu.mapping.gaussians import compact_map

        def do_compact():
            g2, o2, order = compact_map(gmap, opt_state, return_order=True)
            kv = kf_vis[:, order] if mcfg.enable_pgo else kf_vis
            return g2, o2, kv

        gmap, opt_state, kf_vis = jax.lax.cond(
            (i + 1) % cfg.compact_every == 0, do_compact,
            lambda: (gmap, opt_state, kf_vis),
        )

    return (gmap, opt_state, kf, pose_opt, paused, plast, pcnt,
            total_iters, max_pairs, kf_vis, adj, d_ins, d_req, k_next)


def slam_refine_impl(
    state: FusedState,
    K: jax.Array,
    width: int,
    height: int,
    cfg: FusedConfig,
    n_iters: int,
) -> FusedState:
    """Idle-time map refinement: one bounded mapping pass over the current
    keyframe window. No frame is consumed and no keyframe decision is made
    — this is the fused equivalent of the actor backend's queue-empty
    `optimize_map()` (reference backend.py:842-851). FusedSlam.run also
    uses it to spread the long bootstrap optimization over several short
    dispatches, each within the axon worker's per-dispatch tolerance."""
    # refine never runs under lax.scan, so always use the while_loop
    # mapping body (the "fori" variant's static trip count would pad every
    # refine dispatch to the full bootstrap length)
    if cfg.mapping_loop != "while":
        cfg = dataclasses.replace(cfg, mapping_loop="while")
    (gmap, opt_state, kf, pose_opt, paused, plast, pcnt, total_iters,
     max_pairs, kf_vis, adj, d_ins, d_req, k_next) = _mapping_phase(
        state, state.gmap, state.opt_state, state.kf, state.pose_opt,
        state.kf_count, state.kf_vis, state.adj,
        jnp.array(False), state.frame_count, jnp.int32(n_iters), state.key,
        K, width, height, cfg, allow_compact=False,
    )
    return state._replace(
        gmap=gmap, opt_state=opt_state, kf=kf, pose_opt=pose_opt,
        paused=paused, plateau_last=plast, plateau_count=pcnt,
        total_map_iters=total_iters, max_pairs=max_pairs,
        inserted_total=state.inserted_total + d_ins,
        dropped_total=state.dropped_total + (d_req - d_ins),
        live_count=jnp.sum(gmap.alive).astype(jnp.int32),
        kf_vis=kf_vis, adj=adj, key=k_next,
    )


def grow_fused_state(state: FusedState, new_capacity: int) -> FusedState:
    """Host-triggered splat-capacity growth between dispatches.

    The fused runtime's answer to the reference's grow-by-concat on every
    insert (/root/reference/gslam/insertion.py:27-65): a rare geometric
    doubling driven by the host when `live_count` crosses the watermark.
    Live slots are compacted to the front and every per-slot tensor —
    splat buffer, Adam moments, and (with PGO) the per-keyframe visibility
    columns — rides the same permutation before padding. The next
    slam_step recompiles once for the new shape; doubling amortizes it.
    """
    from gslam_tpu.mapping.gaussians import compact_map, grow_map

    gmap, opt, order = compact_map(state.gmap, state.opt_state,
                                   return_order=True)
    kf_vis = state.kf_vis
    if kf_vis.shape[1] > 1:  # PGO mode: per-slot visibility columns
        kf_vis = kf_vis[:, order]
        pad = jnp.zeros((kf_vis.shape[0], new_capacity - kf_vis.shape[1]),
                        bool)
        kf_vis = jnp.concatenate([kf_vis, pad], axis=1)
    gmap, opt = grow_map(gmap, opt, new_capacity)
    return state._replace(gmap=gmap, opt_state=opt, kf_vis=kf_vis)


# Jitted per-frame entry (online mode: one async dispatch per frame).
slam_step = partial(
    jax.jit, static_argnames=("width", "height", "cfg"),
)(slam_step_impl)

slam_refine = partial(
    jax.jit, static_argnames=("width", "height", "cfg", "n_iters"),
)(slam_refine_impl)


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


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def slam_chunk_unrolled(
    state: FusedState,
    images: jax.Array,  # [C, H, W, 3]
    gt_depths: jax.Array,  # [C, H, W]
    K: jax.Array,
    width: int,
    height: int,
    cfg: FusedConfig,
) -> FusedState:
    """Offline chunk WITHOUT lax.scan: the per-frame steps are unrolled at
    trace time. Gets the same one-dispatch-per-chunk transport benefit as
    `slam_scan` while avoiding the scan(+while_loop+cond+Pallas) nesting
    that faults the axon TPU worker (docs/PERF.md rule on the slam_scan
    fault). Cost: compile time and program size grow ~linearly with the
    chunk length, so keep chunks modest (4-16)."""
    for j in range(images.shape[0]):
        state = slam_step_impl(
            state, images[j], gt_depths[j], K, width, height, cfg)
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
            sync_every: int = 8, resume_from=None,
            checkpoint_every: int = 0, checkpoint_path=None,
            chunk_backend: str = "scan") -> dict:
        """chunk > 1 folds frames per dispatch (`chunk_backend`: "scan" =
        lax.scan, smallest program; "unroll" = trace-time unrolled steps,
        no scan nesting — see docs/PERF.md on the slam_scan fault);
        chunk == 1 dispatches slam_step per frame. Either way, one scalar
        is read back every `sync_every` frames to bound the transport
        backlog: letting many multi-second dispatches pile up unsynced
        crashes the axon TPU worker outright (docs/PERF.md rule 3 — this
        killed the first r3 flagship attempt at 30 enqueued chunks).
        The same readback checks the device-resident health counter and
        aborts the run once cfg.abort_unhealthy rejected/non-finite events
        accumulate. sync_every=0 disables both (CPU / small runs only).

        `resume_from` continues from a `save_fused_checkpoint` snapshot
        (frames already in the snapshot are skipped); `checkpoint_every`
        writes one to `checkpoint_path` every N frames, piggybacking on
        the backlog-sync readbacks so it adds no extra dispatches."""
        from gslam_tpu.runtime.checkpoint import (
            load_fused_checkpoint, save_fused_checkpoint,
        )

        if chunk_backend not in ("scan", "unroll"):
            raise ValueError(f"chunk_backend must be 'scan' or 'unroll', "
                             f"got {chunk_backend!r}")
        H, W = self.height, self.width
        try:
            n_ds = len(dataset)
        except TypeError:
            n_ds = None
        if n_ds is not None and n_ds > self.cfg.max_frames:
            raise ValueError(
                f"dataset has {n_ds} frames but cfg.max_frames="
                f"{self.cfg.max_frames}; trajectory buffers would silently "
                "truncate — raise FusedConfig.max_frames")
        if resume_from:
            state, resumed_meta = load_fused_checkpoint(
                resume_from, self.cfg, self.seed)
            self.capacity = state.gmap.capacity
            # len(resumed_meta) == frame_count (asserted in tests); using
            # the host-side value avoids a device readback here, which
            # would flip the axon transport into its slow post-readback
            # dispatch mode before the run even starts (docs/PERF.md).
            skip_below = len(resumed_meta)
            print(f"[fused] resumed at frame {skip_below} "
                  f"(capacity {self.capacity}) from {resume_from}",
                  flush=True)
        else:
            state = init_fused_state(
                self.cfg, self.capacity, self.kf_capacity, H, W, self.seed)
            resumed_meta, skip_below = [], 0
        K = jnp.asarray(dataset.camera.K, jnp.float32)

        frames_meta = list(resumed_meta)  # (index, timestamp, gt_pose)
        since_ckpt = 0
        t_start = time.time()
        buf_imgs, buf_depths = [], []
        unsynced = 0  # frames dispatched since the last backlog sync

        def maybe_grow():
            # growth decisions piggyback on backlog-sync readbacks: the
            # state is already drained, so reading live_count is one more
            # scalar copy, not a new dispatch
            nonlocal state
            if not self.cfg.max_capacity:
                return
            cap = state.gmap.capacity
            if cap >= self.cfg.max_capacity:
                return
            live = int(state.live_count)
            if live >= self.cfg.grow_watermark * cap:
                new_cap = min(cap * 2, self.cfg.max_capacity)
                state = grow_fused_state(state, new_cap)
                print(f"[fused] grew capacity {cap} -> {new_cap} "
                      f"(live {live})", flush=True)

        def maybe_checkpoint():
            # called at backlog-sync points (state already drained there)
            nonlocal since_ckpt
            if (checkpoint_every and checkpoint_path
                    and since_ckpt >= checkpoint_every):
                save_fused_checkpoint(checkpoint_path, state, frames_meta)
                since_ckpt = 0
                print(f"[fused] checkpoint @ frame {len(frames_meta)} -> "
                      f"{checkpoint_path}", flush=True)

        def check_health(fc):
            # One more scalar copy at an already-drained sync point. A
            # growing counter means the divergence guard is firing (or the
            # map went non-finite) — stop instead of burning chip time on
            # a doomed run (the r3 flagship ran blind for 136 frames).
            if not self.cfg.abort_unhealthy:
                return
            h = int(state.health)
            if h > 0:
                print(f"[fused] health counter {h} at frame {fc}",
                      flush=True)
            if h >= self.cfg.abort_unhealthy:
                raise RuntimeError(
                    f"aborting: health counter reached {h} (>= "
                    f"{self.cfg.abort_unhealthy}) at frame {fc} — tracking "
                    "guard rejections / non-finite mapping losses")

        def flush():
            nonlocal state, buf_imgs, buf_depths, unsynced
            if not buf_imgs:
                return
            imgs = jnp.asarray(np.stack(buf_imgs), jnp.float32)
            deps = jnp.asarray(np.stack(buf_depths), jnp.float32)
            chunk_fn = (slam_chunk_unrolled
                        if chunk_backend == "unroll" else slam_scan)
            state = chunk_fn(state, imgs, deps, K, W, H, self.cfg)
            unsynced += len(buf_imgs)
            buf_imgs, buf_depths = [], []
            if sync_every and unsynced >= sync_every:
                fc = int(state.frame_count)  # bound the dispatch backlog
                unsynced = 0
                print(f"[fused] frame {fc} synced at "
                      f"{time.time() - t_start:.1f}s", flush=True)
                check_health(fc)
                maybe_grow()
                maybe_checkpoint()

        zeros_depth = np.zeros((H, W), np.float32)
        for frame in iter(dataset):
            if frame.index < skip_below:
                continue  # already folded into the resumed state
            frames_meta.append((frame.index, frame.timestamp, frame.gt_pose))
            since_ckpt += 1
            if len(frames_meta) > self.cfg.max_frames:
                raise ValueError(
                    f"stream exceeded cfg.max_frames={self.cfg.max_frames}; "
                    "trajectory buffers would silently truncate")
            depth = (
                np.asarray(frame.gt_depth, np.float32)
                if frame.gt_depth is not None else zeros_depth
            )
            if chunk <= 1:
                state = slam_step(
                    state, jnp.asarray(np.asarray(frame.image, np.float32)),
                    jnp.asarray(depth), K, W, H, self.cfg,
                )
                ipd = self.cfg.init_iters_per_dispatch
                if frame.index == 0 and ipd:
                    # Spread the rest of the bootstrap optimization over
                    # short refine dispatches, draining each (the whole
                    # point is bounding per-dispatch device time).
                    done = min(ipd, self.cfg.mapping.num_iters_init)
                    while done < self.cfg.mapping.num_iters_init:
                        state = slam_refine(state, K, W, H, self.cfg, ipd)
                        int(state.frame_count)
                        done += ipd
                    print(f"[fused] bootstrap refined to {done} iters at "
                          f"{time.time() - t_start:.1f}s", flush=True)
                # frame 0's dispatch folds the (long) bootstrap optimization;
                # drain it alone before enqueuing more work on the chip
                if sync_every and (frame.index == 0
                                   or frame.index % sync_every
                                   == sync_every - 1):
                    fc = int(state.frame_count)  # bound the dispatch backlog
                    print(f"[fused] frame {fc} synced at "
                          f"{time.time() - t_start:.1f}s", flush=True)
                    check_health(fc)
                    maybe_grow()
                    maybe_checkpoint()
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
        finite_mask = np.isfinite(traj.reshape(n, -1)).all(axis=1)
        metrics = {
            "L": n,
            "C": int(state.kf_count),
            "N": int(state.gmap.n_live()),
            "capacity": int(state.gmap.capacity),
            "wall_s": wall,
            "enqueue_s": t_enqueue,
            "fps_wall": n / wall if wall > 0 else 0.0,
            "total_map_iters": int(state.total_map_iters),
            "max_pairs_seen": int(state.max_pairs),
            "inserted_total": int(state.inserted_total),
            "dropped_inserts": int(state.dropped_total),
            "health": int(state.health),
            "nonfinite_poses": int(np.sum(~finite_mask)),
            # a guard rejection is the recovery mechanism WORKING (pose
            # falls back to the motion model, map stays clean, next frame
            # re-tracks): transient rejections leave health > 0 but only
            # persistent ones — reaching the abort threshold — mean the
            # trajectory is dead-reckoned garbage.
            "diverged": bool(
                (~finite_mask).any()
                or (int(state.health) >= self.cfg.abort_unhealthy
                    if self.cfg.abort_unhealthy
                    else int(state.health) > 0)),
            **({"n_pgo_edges": int(jnp.sum(state.adj)) // 2}
               if self.cfg.mapping.enable_pgo else {}),
            "track_losses_mean": float(np.mean(
                np.asarray(state.track_losses[1:n]))) if n > 1 else 0.0,
            "mean_track_evals": float(np.mean(
                np.asarray(state.n_evals_traj[1:n]))) if n > 1 else 0.0,
            "kf_frames": np.nonzero(np.asarray(state.kf_flags[:n]))[0].tolist(),
        }
        # per-frame decision telemetry (VERDICT r3 #6: a failed run must be
        # explainable from committed artifacts alone); main.py writes it to
        # runs/<name>/telemetry.npz
        self.telemetry = {
            "track_losses": np.asarray(state.track_losses[:n]),
            "n_evals": np.asarray(state.n_evals_traj[:n]),
            "kd_translation": np.asarray(state.kd_translation[:n]),
            "kd_median_depth": np.asarray(state.kd_median_depth[:n]),
            "kd_cos_z": np.asarray(state.kd_cos_z[:n]),
            "kf_flags": np.asarray(state.kf_flags[:n]),
            "exposure_traj": np.asarray(state.exposure_traj[:n]),
        }

        gt = [m[2] for m in frames_meta]
        if all(g is not None for g in gt) and n >= 2 and finite_mask.sum() >= 2:
            from gslam_tpu.eval.trajectory import (
                ate_mean, ate_rmse, trajectory_positions,
            )

            gt_t = trajectory_positions(np.stack([np.asarray(g) for g in gt]))
            est_t = trajectory_positions(traj)
            # score the finite frames only; `nonfinite_poses` above records
            # how many were excluded (0 for a healthy run)
            gt_f, est_f = gt_t[finite_mask], est_t[finite_mask]
            metrics["ate"] = float(ate_mean(gt_f, est_f))
            metrics["ate_rmse"] = float(ate_rmse(gt_f, est_f))
        self.final_state = state
        self.trajectory = traj

        if eval_stride:
            self._evaluate_renders(dataset, traj, eval_stride, metrics)
        return metrics

    def _evaluate_renders(self, dataset, traj, stride, metrics,
                          batch: int = 16):
        """Re-render every stride-th frame from the final map and score
        PSNR/SSIM against the dataset images (the run is over; readbacks
        are allowed now). Views are scored in fixed-size batched programs —
        one dispatch per `batch` views instead of one per view."""
        from gslam_tpu.mapping.backend_ops import eval_views

        K = jnp.asarray(dataset.camera.K, jnp.float32)
        poses, imgs = [], []
        for frame in iter(dataset):
            if frame.index % stride != 0 or frame.index >= len(traj):
                continue
            poses.append(traj[frame.index])
            imgs.append(np.asarray(frame.image, np.float32))
        psnrs, ssims = [], []
        for c0 in range(0, len(poses), batch):
            p = np.stack(poses[c0:c0 + batch])
            g = np.stack(imgs[c0:c0 + batch])
            n = len(p)
            if n < batch:  # pad to the compiled batch shape
                p = np.concatenate(
                    [p, np.tile(np.eye(4, dtype=np.float32), (batch - n, 1, 1))])
                g = np.concatenate(
                    [g, np.zeros((batch - n,) + g.shape[1:], np.float32)])
            ps, ss = eval_views(
                self.final_state.gmap, jnp.asarray(p), jnp.asarray(g), K,
                self.width, self.height, self.cfg.mapping,
            )
            psnrs.extend(np.asarray(ps)[:n].tolist())
            ssims.extend(np.asarray(ss)[:n].tolist())
        if psnrs:
            metrics["psnr"] = float(np.mean(psnrs))
            metrics["ssim"] = float(np.mean(ssims))
