"""Fused device-resident SLAM core (runtime/fused.py): the whole per-frame
iteration is one XLA program; the host reads back only at the end."""

import numpy as np

from gslam_tpu.io.synthetic import SyntheticDataset
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.ops.rasterize import RenderConfig
from gslam_tpu.tracking.track import TrackingConfig
from gslam_tpu.runtime.fused import FusedConfig, FusedSlam

RCFG = RenderConfig(tile_capacity=64, tile_chunk=8, pairs_per_gaussian=8)


def small_fused_cfg(**kw):
    base = dict(
        tracking=TrackingConfig(
            warmup_steps=5, lbfgs_max_iter=10, lbfgs_max_eval=12, render=RCFG
        ),
        mapping=MapConfig(
            window_size=4, recent_window=4, num_iters_init=40,
            num_iters_mapping=5, render=RCFG,
        ),
        max_frames=16, init_n_new=400, kf_n_new=50, idle_iters=5,
    )
    base.update(kw)
    return FusedConfig(**base)


def test_fused_slam_end_to_end(tmp_path):
    """Chunked scan over a synthetic walk: keyframes trigger, the map grows,
    and the trajectory stays within a loose ATE bound — with exactly one
    readback point at the end."""
    ds = SyntheticDataset(seq_len=8, width=80, height=60, n_splats=600,
                          seed=3, motion_scale=0.015)
    slam = FusedSlam(small_fused_cfg(), 80, 60, capacity=2048,
                     kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=4)
    assert m["L"] == 8
    assert m["C"] >= 2, m
    assert m["N"] > 100, m
    assert np.isfinite(m["ate"]) and m["ate"] < 0.2, m
    assert m["total_map_iters"] > 0
    # frame 0 is always a keyframe (bootstrap)
    assert 0 in m["kf_frames"]


def test_fused_chunk_invariance():
    """The chunked scan is just batching: chunk=2 and chunk=8 fold the same
    per-frame program and must give identical trajectories."""
    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=4, motion_scale=0.01)
    cfg = small_fused_cfg(max_frames=8)
    a = FusedSlam(cfg, 64, 48, capacity=1024, kf_capacity=8, seed=0)
    ma = a.run(ds, chunk=2)
    ds2 = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                           seed=4, motion_scale=0.01)
    b = FusedSlam(cfg, 64, 48, capacity=1024, kf_capacity=8, seed=0)
    mb = b.run(ds2, chunk=8)
    np.testing.assert_allclose(a.trajectory, b.trajectory, atol=1e-5)
    assert ma["C"] == mb["C"]
