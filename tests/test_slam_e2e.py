"""End-to-end SLAM on a synthetic sequence: deterministic, self-contained.

This is the integration test the reference never had (SURVEY §4): a full
tracking+mapping run over a rendered ground-truth scene, asserting
trajectory and reconstruction quality plus checkpoint round-tripping.
"""

import numpy as np
import pytest

from gslam_tpu.io.synthetic import SyntheticDataset
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.ops.rasterize import RenderConfig
from gslam_tpu.runtime.system import SlamConfig, SlamSystem
from gslam_tpu.tracking.track import TrackingConfig

RCFG = RenderConfig(tile_capacity=128, tile_chunk=8, pairs_per_gaussian=8)

SMALL = dict(
    tracking=TrackingConfig(
        warmup_steps=5, lbfgs_max_iter=10, lbfgs_max_eval=12, render=RCFG
    ),
    mapping=MapConfig(
        num_iters_init=50, num_iters_mapping=6, window_size=5, recent_window=4,
        render=RCFG,
    ),
    capacity=8192,
    kf_capacity=16,
)


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    ds = SyntheticDataset(
        seq_len=10, width=80, height=60, n_splats=600, seed=1, motion_scale=0.015
    )
    run_dir = tmp_path_factory.mktemp("run")
    cfg = SlamConfig(**SMALL, run_dir=str(run_dir), eval_stride=3)
    system = SlamSystem(cfg, 80, 60)
    metrics = system.run(ds)
    return ds, system, metrics, run_dir


def test_slam_completes(slam_run):
    _, system, metrics, _ = slam_run
    assert metrics["L"] == 10
    assert metrics["C"] >= 1
    assert metrics["N"] > 1000  # init inserts 5000 minus pruning


def test_slam_trajectory_quality(slam_run):
    _, _, metrics, _ = slam_run
    # random-walk motion ~1.5 cm/frame over 10 frames; tracking should stay
    # within a few cm of gt
    assert metrics["ate"] < 0.05, metrics


def test_slam_reconstruction_quality(slam_run):
    _, _, metrics, _ = slam_run
    # measured on this scene: psnr 23.90, ssim 0.917, ate 0.021 (CPU) with
    # the kf_adapt default taking C=3 keyframes — mapping's pose
    # refinement over >1 keyframe costs ~1 dB vs the old C=1 run (24.93)
    # because the optimized map gauge no longer coincides with the tracked
    # eval poses, but ATE improves (0.026 -> 0.021) and gate scenes NEED
    # the keyframe density (TRACKING_STUDY). Bands sit just under the
    # measured values to catch regressions without flaking on
    # float-reassociation jitter.
    assert metrics["psnr"] > 23.0, metrics
    assert metrics["ssim"] > 0.89, metrics


def test_slam_artifacts_written(slam_run):
    _, _, _, run_dir = slam_run
    assert (run_dir / "splats.npz").exists()
    assert (run_dir / "metrics.json").exists()
    assert (run_dir / "traj.png").exists()


def test_checkpoint_roundtrip(slam_run):
    from gslam_tpu.runtime.checkpoint import load_map
    from gslam_tpu.mapping.backend_ops import render_view_stats
    import jax.numpy as jnp

    ds, system, _, run_dir = slam_run
    gmap, _ = load_map(run_dir / "splats.npz")
    assert int(gmap.n_live()) == int(system.backend.gmap.n_live())
    # loaded map renders identically
    pose = jnp.asarray(system.frontend.frames[0].est_pose)
    a = render_view_stats(system.backend.gmap, pose, system.backend.K, 80, 60,
                          system.cfg.mapping)
    b = render_view_stats(gmap, pose, system.backend.K, 80, 60,
                          system.cfg.mapping)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=1e-6)


def test_threaded_mode_runs(tmp_path):
    """The queue/thread pipeline produces a sane run too (not bit-identical
    to synchronous, but complete and finite)."""
    ds = SyntheticDataset(
        seq_len=6, width=80, height=60, n_splats=600, seed=2, motion_scale=0.01
    )
    cfg = SlamConfig(**SMALL, run_dir=str(tmp_path / "thr"), synchronous=False)
    system = SlamSystem(cfg, 80, 60)
    metrics = system.run(ds)
    assert metrics["L"] == 6
    assert np.isfinite(metrics.get("ate", np.inf))


def test_actor_nan_frame_survives_with_fallback(tmp_path):
    """Actor-path twin of test_fused_nan_frame_survives_with_fallback
    (VERDICT r4 weak #5: FrontendActor dropped TrackResult.rejected on
    the floor, so the mode the verifier runs was blind to divergence).
    A NaN sensor frame must be guard-rejected and counted in `health`
    while every pose stays finite; one recovered rejection is NOT a
    diverged run (diverged = abort threshold reached or non-finite)."""
    ds = SyntheticDataset(
        seq_len=8, width=64, height=48, n_splats=400, seed=4,
        motion_scale=0.01
    )
    ds.images = ds.images.copy()
    ds.images[3] = np.nan
    cfg = SlamConfig(**SMALL, run_dir=str(tmp_path / "nan"), eval_stride=4)
    system = SlamSystem(cfg, 64, 48)
    metrics = system.run(ds)
    assert metrics["health"] >= 1
    assert metrics["diverged"] is False  # recovered, not diverged
    assert metrics["nonfinite_poses"] == 0
    assert np.isfinite(metrics["ate"])
    assert metrics["mean_track_evals"] > 0


def test_actor_host_abort_on_unhealthy(tmp_path):
    """SlamSystem must abort a doomed run once the actor health counter
    crosses abort_unhealthy (fused twin: test_fused_host_abort_on_unhealthy)."""
    ds = SyntheticDataset(
        seq_len=8, width=64, height=48, n_splats=400, seed=4,
        motion_scale=0.01
    )
    ds.images = ds.images.copy()
    ds.images[2:6] = np.nan
    cfg = SlamConfig(**SMALL, run_dir=str(tmp_path / "abort"),
                     abort_unhealthy=2)
    system = SlamSystem(cfg, 64, 48)
    with pytest.raises(RuntimeError, match="health counter"):
        system.run(ds)


def test_actor_plausibility_guard_rejects_basin_jump(tmp_path, monkeypatch):
    """Motion-scaled plausibility gate (TrackingConfig.guard_*): a tracker
    result far beyond the camera's own recent per-frame motion — the r5
    gate's f16 failure signature (a 2-4x-step basin jump the absolute
    max_step guard passed) — must fall back to the motion prior, count in
    health, and not become a keyframe."""
    import gslam_tpu.runtime.frontend as fe
    from gslam_tpu.tracking.track import TrackResult

    ds = SyntheticDataset(
        seq_len=8, width=64, height=48, n_splats=400, seed=4,
        motion_scale=0.02
    )
    real_track = fe.track_frame
    jump_frames = {6}

    def jumpy_track(gmap, prior, exposure, img, K, w, h, cfg, gt_depth=None):
        res = real_track(gmap, prior, exposure, img, K, w, h, cfg,
                         gt_depth=gt_depth)
        if int(jumpy_track.i) in jump_frames:
            bad = np.asarray(res.pose).copy()
            bad[:3, 3] += 0.5  # ~25x the per-frame step: flagrant jump
            res = TrackResult(pose=bad, exposure=res.exposure,
                              loss=res.loss, n_evals=res.n_evals,
                              rejected=res.rejected)
        jumpy_track.i += 1
        return res

    jumpy_track.i = 1  # frame 0 is pinned, track() starts at frame 1
    monkeypatch.setattr(fe, "track_frame", jumpy_track)

    cfg = SlamConfig(**SMALL, run_dir=str(tmp_path / "guard"), eval_stride=4)
    system = SlamSystem(cfg, 64, 48)
    metrics = system.run(ds)
    assert metrics["health"] >= 1, metrics
    # a transient, recovered rejection is NOT divergence (the guard is
    # the recovery mechanism): diverged only at the abort threshold
    assert metrics["diverged"] is False
    assert metrics["nonfinite_poses"] == 0
    # the jump was replaced by the prior: trajectory stays in-scene
    traj = np.load(tmp_path / "guard" / "trajectory.npy")
    centers = np.stack([-p[:3, :3].T @ p[:3, 3] for p in traj])
    assert np.linalg.norm(np.diff(centers, axis=0), axis=1).max() < 0.2
