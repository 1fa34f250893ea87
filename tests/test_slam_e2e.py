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
    # measured on this scene: psnr 24.93, ssim 0.936 (CPU); bands sit just
    # under the measured values to catch regressions without flaking on
    # float-reassociation jitter (round-2 bands were 15.0 / 0.35)
    assert metrics["psnr"] > 24.0, metrics
    assert metrics["ssim"] > 0.90, metrics


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
