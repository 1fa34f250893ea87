"""Mapping backend actor.

Host-side orchestration of the jitted mapping kernels
(gslam_tpu.mapping.backend_ops), mirroring the reference Backend process's
behavior (/root/reference/gslam/backend.py:827-903):

  * REQUEST_INIT -> bootstrap the map from a mock unit-depth map (5000
    splats) and run the long initialization optimization;
  * ADD_FRAME -> keyframe policy (translation/rotation thresholds against
    the rendered median depth), depth-map insertion with occlusion filter,
    a short optimization pass, optional pose-graph loop closures, periodic
    SYNC of the map snapshot to the frontend;
  * idle -> windowed map optimization with plateau-based pausing, then
    pruning and L-BFGS pose refinement;
  * None sentinel -> END_SYNC + checkpoint.

The actor owns fixed-capacity device buffers (splat map + Adam moments +
keyframe store); every state transition is a jitted call that consumes and
returns them (donation deliberately NOT used — see docs/PERF.md). Python
here only decides *which* kernel to launch next. For the transport-optimal
single-program-per-frame variant see runtime/fused.py.
"""

from __future__ import annotations

import dataclasses
import logging
import random as py_random
import time
from contextlib import contextmanager

import numpy as np
import jax
import jax.numpy as jnp

from gslam_tpu.mapping.backend_ops import (
    MapConfig, init_pose_adam, keyframe_decision_stats, mapping_step,
    pose_refinement_lbfgs, render_view_stats, visibility_pass,
)
from gslam_tpu.mapping.gaussians import empty_map, grow_map
from gslam_tpu.mapping.insertion import (
    InsertionConfig, densify_by_gradients, insert_from_depthmap,
)
from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
from gslam_tpu.mapping.optimizer import init_adam
from gslam_tpu.mapping import pruning
from gslam_tpu.io.frames import Frame
from gslam_tpu.runtime.messages import SyncPayload

logger = logging.getLogger("gslam_tpu.backend")


class PlateauStopper:
    """Stop when the loss is low and keeps decreasing for `patience` steps
    (reference StopOnPlateau; /root/reference/gslam/utils.py:164-186)."""

    def __init__(self, patience: int, min_loss: float):
        self.patience = patience
        self.min_loss = min_loss
        self.counter = 0
        self.last = None

    def stop(self, loss: float) -> bool:
        if self.last is None:
            self.last = loss
            return False
        if loss > self.min_loss:
            self.last = loss
            self.counter = 0
            return False
        if self.last > loss:
            self.counter += 1
            if self.counter >= self.patience:
                return True
        else:
            self.counter = 0
        self.last = loss
        return False


class BackendActor:
    def __init__(
        self,
        cfg: MapConfig,
        width: int,
        height: int,
        capacity: int = 2**17,
        kf_capacity: int = 64,
        seed: int = 0,
        rng_seed: int = 0,
    ):
        self.cfg = cfg
        self.width, self.height = width, height
        self.capacity = capacity
        self.kf_capacity = kf_capacity

        self.gmap = empty_map(capacity)
        self.opt_state = init_adam(self.gmap)
        self.kf = empty_keyframes(kf_capacity, height, width)
        self.pose_opt = init_pose_adam(kf_capacity)
        self.key = jax.random.PRNGKey(seed)
        self.py_rng = py_random.Random(rng_seed)

        self.kf_order: list[int] = []  # slots in insertion order
        self.kf_frame_idx: dict[int, int] = {}  # slot -> frame index
        self.frame_slot: dict[int, int] = {}  # frame index -> slot
        self.pose_graph: dict[int, set] = {}
        self.frames: list[Frame] = []
        self.total_step = 0
        self.pause_map_optim = False
        # EMA of per-frame camera translation for the motion-adaptive
        # keyframe trigger (MapConfig.kf_adapt; same rule as the fused
        # runtime's FusedState.step_ema)
        self.step_ema = 0.0
        self._last_pose: np.ndarray | None = None
        # tracked pose at the last keyframe EVENT (tracking gauge; see
        # maybe_add_keyframe — the adaptive trigger must not compare
        # across the mapping-optimized keyframe gauge)
        self._kf_anchor: np.ndarray | None = None
        self.K = None  # shared intrinsics, set on first frame
        self.insertion_cfg = InsertionConfig(
            depth_variance=0.1 * cfg.initial_scale,
            no_depth_variance=0.2 * cfg.initial_scale,
            min_alpha_for_depth=0.1,
            initial_opacity=cfg.initial_opacity,
        )
        # cfg variant without the depth TV term (reference's regularize=False
        # passes; backend.py:867)
        self._cfg_noreg = dataclasses.replace(cfg, depth_tv_weight=0.0)
        self.last_sync_depth = None
        self.last_sync_rgb = None
        self.last_sync_alpha = None
        self.last_sync_pose = None
        # overflow telemetry: max pair-buffer fill and count of saturated
        # mapping iterations (VERDICT r1: silent tile/pair truncation)
        self.max_pairs_seen = 0
        self.n_pair_overflows = 0
        # per-phase wall time, seconds (map/insert/prune/pose_refine/sync)
        self.phase_s: dict[str, float] = {}
        self.phase_n: dict[str, int] = {}

    @contextmanager
    def _timed(self, phase: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phase_s[phase] = self.phase_s.get(phase, 0.0) + time.time() - t0
            self.phase_n[phase] = self.phase_n.get(phase, 0) + 1

    # ---------------- window policy ----------------

    def _window(self) -> tuple[np.ndarray, np.ndarray]:
        """Pick the optimization window (slots + mask), padded to
        cfg.window_size. Mirrors /root/reference/gslam/backend.py:193-247:
        last-8 keyframes in the plain mode (the reference's random-keyframe
        count collapses to 0); pose-graph fan-out sampling when PGO is on."""
        size = self.cfg.window_size
        if self.cfg.enable_pgo and len(self.kf_order) > 1:
            latest = self.kf_frame_idx[self.kf_order[-1]]
            chosen = {latest}
            neighbors = sorted(self.pose_graph.get(latest, set()))
            if 0 < len(neighbors) < size:
                chosen.update(
                    self.py_rng.sample(neighbors, min(len(neighbors), size))
                )
            elif neighbors:
                chosen.update(neighbors)
            for _ in range(size - len(chosen)):
                if not neighbors:
                    break
                hop = sorted(
                    self.pose_graph.get(self.py_rng.choice(neighbors), set())
                )
                if hop:
                    cand = self.py_rng.choice(hop)
                    chosen.add(cand)
            frame_ids = sorted(chosen)[:size]
            slots = [self.frame_slot[f] for f in frame_ids if f in self.frame_slot]
        else:
            slots = self.kf_order[-self.cfg.recent_window:]
        idx = np.zeros(size, np.int32)
        mask = np.zeros(size, bool)
        idx[: len(slots)] = slots
        mask[: len(slots)] = True
        return jnp.asarray(idx), jnp.asarray(mask)

    # ---------------- optimization ----------------

    def optimize_map(self, n_iters=None, prune=True, regularize=True):
        if not self.kf_order:
            return
        with self._timed("map"):
            self._optimize_map(n_iters, prune, regularize)

    def _optimize_map(self, n_iters, prune, regularize):
        cfg = self.cfg if regularize else self._cfg_noreg
        if n_iters is None:
            n_iters = cfg.num_iters_mapping
        stopper = PlateauStopper(cfg.plateau_patience, cfg.plateau_min_loss)
        aux = None
        for _ in range(n_iters):
            self.total_step += 1
            widx, wmask = self._window()
            self.gmap, self.opt_state, self.kf, self.pose_opt, aux = mapping_step(
                self.gmap, self.opt_state, self.kf, self.pose_opt,
                widx, wmask, self.K, self.width, self.height, cfg,
            )
            if self.total_step % cfg.densify_every == 0:
                self.key, k = jax.random.split(self.key)
                res = densify_by_gradients(
                    k, self.gmap, self.opt_state, aux.means2d_grad,
                    self.width, self.height, cfg.densify_max_new,
                    self.frames[-1].index if self.frames else 0,
                    grow_grad2d=cfg.grow_grad2d, grow_scale3d=cfg.grow_scale3d,
                )
                self.gmap, self.opt_state = res.gmap, res.opt_state
                prune = False
            # plateau + overflow checks sync two scalars per iteration
            n_pairs = int(jnp.max(aux.n_pairs))
            self.max_pairs_seen = max(self.max_pairs_seen, n_pairs)
            if n_pairs >= int(cfg.render.pairs_per_gaussian * self.capacity):
                self.n_pair_overflows += 1
                if self.n_pair_overflows in (1, 10, 100, 1000):
                    logger.warning(
                        "pair buffer saturated (%d pairs, %d times so far): "
                        "tile lists are truncating; raise "
                        "render.pairs_per_gaussian or capacity",
                        n_pairs, self.n_pair_overflows,
                    )
            if stopper.stop(float(aux.photometric_loss)):
                self.pause_map_optim = True
                break

        if aux is not None and prune:
            self._apply_pruning(aux.radii, aux.n_touched)
        self._refresh_sync_payload()

    def _apply_pruning(self, radii, n_touched):
        cfg = self.cfg
        remove = pruning.low_opacity_mask(self.gmap, cfg.opacity_prune_threshold)
        remove = remove | pruning.large_radius_mask(
            jnp.max(radii, axis=0), cfg.size_prune_threshold
        )
        if cfg.enable_visibility_pruning and len(self.kf_order) >= 2:
            remove = remove | pruning.ill_conditioned_mask(
                radii[: cfg.recent_window], n_touched[: cfg.recent_window],
                cfg.min_visibility_views,
            )
        self.gmap = pruning.apply_prune(self.gmap, remove)

    def run_pruning(self):
        """Prune based on a fresh render of the last keyframe
        (reference run_pruning; backend.py:409-445)."""
        if not self.kf_order:
            return
        with self._timed("prune"):
            self._run_pruning()

    def _run_pruning(self):
        slot = self.kf_order[-1]
        pose = self.kf.poses()[slot]
        vs = render_view_stats(
            self.gmap, pose, self.K, self.width, self.height, self.cfg
        )
        remove = pruning.low_opacity_mask(self.gmap, self.cfg.opacity_prune_threshold)
        remove = remove | pruning.large_radius_mask(
            vs.radii, self.cfg.size_prune_threshold
        )
        if self.cfg.enable_visibility_pruning and len(self.kf_order) >= 2:
            remove = remove | pruning.ill_conditioned_mask(
                vs.radii[None], vs.n_touched[None], self.cfg.min_visibility_views
            )
        self.gmap = pruning.apply_prune(self.gmap, remove)
        self.last_sync_depth = vs.depth
        self.last_sync_rgb = vs.rgb
        self.last_sync_alpha = vs.alpha
        self.last_sync_pose = np.asarray(pose)

    def refine_poses(self):
        if len(self.kf_order) < 2:
            return
        with self._timed("pose_refine"):
            self._refine_poses()

    def _refine_poses(self):
        widx, wmask = self._window()
        self.kf, _ = pose_refinement_lbfgs(
            self.gmap, self.kf, widx, wmask, self.K,
            self.width, self.height, self.cfg,
        )

    # ---------------- keyframe management ----------------

    def _next_slot(self) -> int:
        for s in range(self.kf_capacity):
            if s not in self.kf_order:
                return s
        # evict the oldest non-initial keyframe (host policy; the reference
        # never evicts but also never bounds memory)
        victim = self.kf_order[1] if len(self.kf_order) > 1 else self.kf_order[0]
        self._remove_keyframe_slot(victim)
        return victim

    def _remove_keyframe_slot(self, slot: int):
        fidx = self.kf_frame_idx.pop(slot)
        self.kf_order.remove(slot)
        self.frame_slot.pop(fidx, None)
        self.pose_graph.pop(fidx, None)
        for n in self.pose_graph.values():
            n.discard(fidx)
        self.kf = self.kf._replace(mask=self.kf.mask.at[slot].set(False))

    def initialize(self, frame: Frame, pose: jnp.ndarray, exposure: jnp.ndarray):
        """Bootstrap from the first frame with a mock noisy unit-depth map
        (reference initialize; backend.py:604-630)."""
        self.K = frame.camera.K
        self.frames.append(frame.strip())
        H, W = self.height, self.width

        self.key, k_depth, k_ins = jax.random.split(self.key, 3)
        mock_depth = (
            1.0 + (jax.random.normal(k_depth, (H, W)) - 0.5) * 0.3
        ) * self.cfg.initial_scale
        mock_alpha = jnp.full((H, W), 0.01)

        gt_depth = (
            jnp.asarray(frame.gt_depth)
            if (self.cfg.use_gt_depths and frame.gt_depth is not None)
            else None
        )
        with self._timed("insert"):
            res = insert_from_depthmap(
                k_ins, self.gmap, self.opt_state, mock_depth, mock_alpha,
                jnp.asarray(frame.image), self.K, pose,
                n_new=5000, frame_index=frame.index, cfg=self.insertion_cfg,
                gt_depthmap=gt_depth,
            )
        self.gmap, self.opt_state = res.gmap, res.opt_state

        slot = self._next_slot()
        self.kf = add_keyframe(
            self.kf, slot, jnp.asarray(frame.image), pose, exposure,
            frame.index,
            gt_depth=jnp.asarray(frame.gt_depth) if frame.gt_depth is not None else None,
        )
        self.kf_order.append(slot)
        self.kf_frame_idx[slot] = frame.index
        self.frame_slot[frame.index] = slot
        self.pose_graph.setdefault(frame.index, set())
        logger.info("initialized map with %d splats", int(res.n_inserted))

    def maybe_add_keyframe(self, frame: Frame, pose, exposure) -> bool:
        """Keyframe decision + insertion (reference to_insert_keyframe +
        add_keyframe; backend.py:632-673,739-792)."""
        last_slot = self.kf_order[-1]
        prev_pose = self.kf.poses()[last_slot]
        stats = keyframe_decision_stats(
            self.gmap, pose, prev_pose, self.K, self.width, self.height, self.cfg
        )
        translation = float(stats.translation)
        med = float(stats.median_depth)
        cos_z = float(stats.cos_z)
        # motion-adaptive trigger (see MapConfig.kf_adapt): keyframe once
        # the camera moved kf_adapt frames' worth of its own recent motion.
        # Measured against the TRACKED pose at the last keyframe EVENT
        # (self._kf_anchor), not the keyframe's map-optimized pose:
        # mapping's pose refinement drifts the keyframe gauge away from
        # the tracking gauge, and that cross-gauge distance grows with
        # trajectory length — using it made the trigger fire every frame
        # on slow scenes (measured: 'tr' 2->26 mm monotone at a 3 mm/frame
        # walk while keyframes fired each frame; psnr dropped 2.9 dB from
        # the per-frame insertions).
        moving = self.step_ema > 1e-3 * med
        if self._kf_anchor is not None:
            rel_a = np.asarray(pose) @ np.linalg.inv(self._kf_anchor)
            anchor_tr = float(np.linalg.norm(rel_a[:3, 3]))
        else:
            anchor_tr = translation
        adaptive = (
            self.cfg.kf_adapt > 0.0 and moving
            and anchor_tr > self.cfg.kf_adapt * self.step_ema
        )
        take = (translation > self.cfg.kf_m * med
                or cos_z < self.cfg.kf_cos or adaptive)
        # never keyframe a guard-rejected (dead-reckoned) frame: inserting
        # splats at a motion-model pose poisons the map (fused twin gates
        # identically in slam_step_impl)
        if not take or frame.rejected:
            return False
        self._kf_anchor = np.asarray(pose)

        # densify from the rendered depth of this view
        self.key, k_ins = jax.random.split(self.key)
        n_kf = len(self.kf_order)
        kwargs = {}
        if n_kf > 1:
            kwargs = dict(
                kf_viewmats=self.kf.poses(),
                kf_est_depths=self.kf.est_depths,
                kf_mask=self.kf.mask,
            )
        gt_depth = (
            jnp.asarray(frame.gt_depth)
            if (self.cfg.use_gt_depths and frame.gt_depth is not None)
            else None
        )
        with self._timed("insert"):
            res = insert_from_depthmap(
                k_ins, self.gmap, self.opt_state,
                stats.new_depth * self.cfg.initial_scale, stats.new_alpha,
                jnp.asarray(frame.image), self.K, pose,
                n_new=100, frame_index=frame.index, cfg=self.insertion_cfg,
                gt_depthmap=gt_depth, **kwargs,
            )
        self.gmap, self.opt_state = res.gmap, res.opt_state

        slot = self._next_slot()
        self.kf = add_keyframe(
            self.kf, slot, jnp.asarray(frame.image), pose, exposure,
            frame.index,
            gt_depth=jnp.asarray(frame.gt_depth) if frame.gt_depth is not None else None,
            est_depth=stats.new_depth,
        )
        self.kf_order.append(slot)
        self.kf_frame_idx[slot] = frame.index
        self.frame_slot[frame.index] = slot
        # consecutive-keyframe covisibility edge (backend.py:672-673)
        if len(self.kf_order) >= 2:
            a = self.kf_frame_idx[self.kf_order[-2]]
            self.pose_graph.setdefault(a, set()).add(frame.index)
            self.pose_graph.setdefault(frame.index, set()).add(a)
        else:
            self.pose_graph.setdefault(frame.index, set())
        return True

    def add_pgo_constraints(self):
        """Loop-closure edges by visible-splat IoU > kf_cov
        (backend.py:702-737)."""
        if len(self.kf_order) < 2:
            return
        slots = list(self.kf_order)
        poses = self.kf.poses()[jnp.asarray(slots)]
        vis = np.asarray(
            visibility_pass(self.gmap, poses, self.K, self.width, self.height, self.cfg)
        )
        for i in range(len(slots)):
            for j in range(i + 1, len(slots)):
                fi = self.kf_frame_idx[slots[i]]
                fj = self.kf_frame_idx[slots[j]]
                if fj in self.pose_graph.get(fi, set()):
                    continue
                inter = np.sum(vis[i] & vis[j])
                union = max(np.sum(vis[i] | vis[j]), 1)
                if inter / union > self.cfg.kf_cov:
                    logger.info("loop closure %d <-> %d", fi, fj)
                    self.pose_graph.setdefault(fi, set()).add(fj)
                    self.pose_graph.setdefault(fj, set()).add(fi)

    # ---------------- sync ----------------

    def _refresh_sync_payload(self):
        if not self.kf_order:
            return
        slot = self.kf_order[-1]
        pose = self.kf.poses()[slot]
        vs = render_view_stats(
            self.gmap, pose, self.K, self.width, self.height, self.cfg
        )
        self.last_sync_depth = vs.depth
        self.last_sync_rgb = vs.rgb
        self.last_sync_alpha = vs.alpha
        self.last_sync_pose = np.asarray(pose)

    def sync_payload(self) -> SyncPayload:
        # Copy out of the donated buffers: the next mapping_step invalidates
        # the current arrays, so the snapshot must own its memory.
        with self._timed("sync"):
            snapshot = jax.tree_util.tree_map(lambda x: x.copy(), self.gmap)
        poses = np.asarray(self.kf.poses())
        kf_poses = {
            self.kf_frame_idx[s]: poses[s] for s in self.kf_order
        }
        return SyncPayload(
            gmap=snapshot,
            keyframe_poses=kf_poses,
            reference_depth=self.last_sync_depth,
            reference_rgb=self.last_sync_rgb,
            pose_graph={k: set(v) for k, v in self.pose_graph.items()},
            reference_alpha=self.last_sync_alpha,
            reference_pose=self.last_sync_pose,
        )

    # ---------------- top-level message handling ----------------

    def handle_request_init(self, frame: Frame, pose, exposure):
        self.pause_map_optim = False
        self._last_pose = np.asarray(pose)
        self._kf_anchor = np.asarray(pose)
        self.initialize(frame, pose, exposure)
        self.optimize_map(self.cfg.num_iters_init, prune=False, regularize=True)

    def handle_add_frame(self, frame: Frame, pose, exposure) -> bool:
        """Returns True if a keyframe was added."""
        self.frames.append(frame.strip())
        pose_np = np.asarray(pose)
        if self._last_pose is not None:
            rel = pose_np @ np.linalg.inv(self._last_pose)
            step = float(np.linalg.norm(rel[:3, 3]))
            self.step_ema = (
                step if self.step_ema == 0.0
                else 0.9 * self.step_ema + 0.1 * step
            )
        self._last_pose = pose_np
        if not self.kf_order:
            logger.warning("ADD_FRAME before initialization")
            self.initialize(frame, pose, exposure)
            return True
        added = self.maybe_add_keyframe(frame, pose, exposure)
        self._maybe_grow()
        if added:
            self.pause_map_optim = False
            self.optimize_map(1, prune=True, regularize=False)
            if self.cfg.enable_pgo:
                self.add_pgo_constraints()
        return added

    def _maybe_grow(self):
        """Geometric capacity growth at 80%% occupancy (rare; the next
        jitted step recompiles once for the new shape). The reference
        grows by concat on every insert (insertion.py:27-65)."""
        n = int(self.gmap.n_live())
        if n <= 0.8 * self.capacity:
            return
        new_cap = self.capacity * 2
        logger.info("growing splat buffer %d -> %d (live=%d)",
                    self.capacity, new_cap, n)
        self.gmap, self.opt_state = grow_map(self.gmap, self.opt_state, new_cap)
        self.capacity = new_cap

    def idle_step(self):
        """One slice of idle-time optimization (reference backend.py:842-851)."""
        if self.pause_map_optim or not self.kf_order:
            return False
        self.optimize_map()
        if len(self.kf_order) > 1:
            self.run_pruning()
            self.refine_poses()
        return True

    def n_live_splats(self) -> int:
        return int(self.gmap.n_live())
