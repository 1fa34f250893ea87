"""SLAM-mode variants: RGB-D (gt depths), pose-graph optimization, pallas
backend end-to-end, and the TUM loaders against a generated mini-sequence."""

import numpy as np
import pytest

from gslam_tpu.io.synthetic import SyntheticDataset
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.ops.rasterize import RenderConfig
from gslam_tpu.runtime.system import SlamConfig, SlamSystem
from gslam_tpu.tracking.track import TrackingConfig

RCFG = RenderConfig(tile_capacity=128, tile_chunk=8)


def small_cfg(**m_extra):
    return dict(
        tracking=TrackingConfig(
            warmup_steps=5, lbfgs_max_iter=10, lbfgs_max_eval=12, render=RCFG,
            use_gt_depths=m_extra.get("use_gt_depths", False),
        ),
        mapping=MapConfig(
            num_iters_init=40, num_iters_mapping=5, window_size=5,
            recent_window=4, render=RCFG, **m_extra,
        ),
        capacity=8192,
        kf_capacity=16,
    )


def test_rgbd_mode(tmp_path):
    ds = SyntheticDataset(seq_len=8, width=80, height=60, n_splats=600,
                          seed=3, motion_scale=0.015, with_depth=True)
    cfg = SlamConfig(**small_cfg(use_gt_depths=True),
                     run_dir=str(tmp_path), eval_stride=4)
    metrics = SlamSystem(cfg, 80, 60).run(ds)
    assert metrics["L"] == 8
    assert metrics["ate"] < 0.08, metrics
    assert metrics["psnr"] > 14.0, metrics


def test_pgo_mode(tmp_path):
    ds = SyntheticDataset(seq_len=8, width=80, height=60, n_splats=600,
                          seed=4, motion_scale=0.02)
    cfg = SlamConfig(**small_cfg(enable_pgo=True, kf_m=0.03),
                     run_dir=str(tmp_path), eval_stride=4)
    system = SlamSystem(cfg, 80, 60)
    metrics = system.run(ds)
    assert metrics["L"] == 8
    # pose graph has nodes for every keyframe and at least the chain edges
    pg = system.backend.pose_graph
    kf_ids = sorted(system.backend.frame_slot.keys())
    assert all(k in pg for k in kf_ids)
    if len(kf_ids) >= 2:
        assert any(pg[k] for k in kf_ids)


def test_tum_loader_roundtrip(tmp_path, rng):
    """Generate a minimal TUM-format sequence on disk and load it."""
    from PIL import Image

    seq = tmp_path / "rgbd_dataset_freiburg3_mini"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(4):
        ts = 100.0 + i * 0.05
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        Image.fromarray(img).save(seq / f"rgb/{ts:.6f}.png")
        depth = rng.integers(100, 30000, (480, 640), dtype=np.uint16)
        Image.fromarray(depth).save(seq / f"depth/{ts:.6f}.png")
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        gt_lines.append(f"{ts:.6f} {0.1 * i} 0.0 0.0 0.0 0.0 0.0 1.0")
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines))
    (seq / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines))
    acc = "\n".join(
        f"{100.0 + i * 0.01:.6f} 0.1 9.8 0.05" for i in range(20)
    )
    (seq / "accelerometer.txt").write_text("# accel\n" + acc)

    from gslam_tpu.io.tum import TumRGBDataset

    ds = TumRGBDataset(seq, seq_len=3)
    assert len(ds) == 3
    f = ds[1]
    assert f.image.shape[2] == 3 and f.image.dtype == np.float32
    assert 0.0 <= f.image.min() and f.image.max() <= 1.0
    assert f.gt_depth is not None and f.gt_depth.max() <= 13.11  # 65535/5000
    # fr3 has zero distortion: gt translation x=0.1*i; w2c = inv(c2w) -> -0.1*i
    np.testing.assert_allclose(f.gt_pose[0, 3], -0.1, atol=1e-5)

    # async merged stream
    from gslam_tpu.io.tum_async import TumAsyncDataset, IMUSample
    from gslam_tpu.io.frames import Frame

    ads = TumAsyncDataset(seq, seq_len=3)
    events = list(ads)
    kinds = [type(e).__name__ for e in events]
    assert "IMUSample" in kinds and "Frame" in kinds
    stamps = [e.timestamp for e in events]
    assert stamps == sorted(stamps)
    n_imu = sum(isinstance(e, IMUSample) for e in events)
    assert n_imu == 20
    assert sum(isinstance(e, Frame) for e in events) == 3


def test_sensor_stream_backpressure():
    ds = SyntheticDataset(seq_len=12, width=48, height=32, n_splats=100, seed=0)
    from gslam_tpu.io.stream import SensorStream

    stream = SensorStream(ds, maxsize=3).start()
    got = []
    while True:
        f = stream.get(timeout=30)
        if f is None:
            break
        got.append(f.index)
    assert got == list(range(12))
