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


def test_warp_tracking_method(tmp_path):
    """method='warp' is selectable end-to-end (reference frontend.py:219-220):
    the frontend tracks by dense warp alignment against the synced keyframe
    render instead of differentiable splat rendering."""
    ds = SyntheticDataset(seq_len=6, width=80, height=60, n_splats=600,
                          seed=5, motion_scale=0.01)
    base = small_cfg()
    base["tracking"] = TrackingConfig(
        method="warp", warmup_steps=5, lbfgs_max_iter=10, lbfgs_max_eval=12,
        render=RCFG,
    )
    cfg = SlamConfig(**base, run_dir=str(tmp_path), eval_stride=3,
                     sync_every=2)
    metrics = SlamSystem(cfg, 80, 60).run(ds)
    assert metrics["L"] == 6
    assert np.isfinite(metrics["ate"])
    assert metrics["ate"] < 0.15, metrics


def test_checkpoint_resume(tmp_path):
    """--resume continues a run: state round-trips through save_checkpoint /
    restore_system and the resumed run finishes the sequence."""
    from gslam_tpu.runtime.checkpoint import restore_system, save_checkpoint

    make_ds = lambda n: SyntheticDataset(  # noqa: E731
        seq_len=n, width=80, height=60, n_splats=600, seed=6,
        motion_scale=0.015,
    )
    cfg = SlamConfig(**small_cfg(), run_dir=str(tmp_path / "a"), eval_stride=4)

    # phase 1: first 4 frames, checkpoint
    sys_a = SlamSystem(cfg, 80, 60)
    for frame in make_ds(4):
        sys_a._process_frame_sync(frame)
    ckpt = tmp_path / "ckpt.npz"
    save_checkpoint(ckpt, sys_a)

    # phase 2: fresh system, restore, continue over the full sequence
    cfg_b = SlamConfig(**small_cfg(), run_dir=str(tmp_path / "b"),
                       eval_stride=4)
    sys_b = SlamSystem(cfg_b, 80, 60)
    nxt = restore_system(ckpt, sys_b)
    assert nxt == 4
    np.testing.assert_array_equal(
        np.asarray(sys_b.backend.gmap.alive), np.asarray(sys_a.backend.gmap.alive)
    )
    np.testing.assert_allclose(
        np.asarray(sys_b.backend.gmap.means), np.asarray(sys_a.backend.gmap.means)
    )
    assert sys_b.backend.kf_order == sys_a.backend.kf_order
    assert len(sys_b.frontend.frames) == 4

    metrics = sys_b.run(make_ds(8))
    assert metrics["L"] == 8
    assert np.isfinite(metrics["ate"])


def test_mapping_step_padded_window_no_slot0_alias():
    """Padded window slots must not scribble on keyframe slot 0 (ADVICE r1):
    est_depths of a windowed keyframe is freshly written, and keyframes
    outside the window stay untouched."""
    import jax.numpy as jnp
    from gslam_tpu.mapping.backend_ops import (
        MapConfig, init_pose_adam, mapping_step,
    )
    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam

    H, W, cap = 32, 32, 256
    rng = np.random.default_rng(0)
    gmap = empty_map(cap)._replace(
        means=jnp.asarray(rng.normal(0, 0.5, (cap, 3)).astype(np.float32))
        + jnp.asarray([0, 0, 2.0], jnp.float32),
        log_scales=jnp.full((cap, 3), np.log(0.1), jnp.float32),
        logit_opacities=jnp.full((cap,), 1.0, jnp.float32),
        alive=jnp.ones((cap,), bool),
    )
    K = jnp.asarray([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], jnp.float32)
    kf = empty_keyframes(4, H, W)
    img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    for slot in range(3):
        kf = add_keyframe(kf, slot, img, jnp.eye(4), jnp.zeros(2), slot)
    sentinel = 777.0
    kf = kf._replace(est_depths=kf.est_depths.at[:].set(sentinel))

    cfg = MapConfig(window_size=4, recent_window=4,
                    render=RenderConfig(tile_capacity=64, tile_chunk=8))
    # window = slots [0, 1, 2] + one padded slot (mask False, safe idx 0)
    widx = jnp.asarray([0, 1, 2, 0], jnp.int32)
    wmask = jnp.asarray([True, True, True, False])
    gmap, opt_state, kf, pose_opt, aux = mapping_step(
        gmap, init_adam(gmap), kf, init_pose_adam(4), widx, wmask,
        K, W, H, cfg,
    )
    est = np.asarray(kf.est_depths)
    # windowed slots got fresh renders (not the stale sentinel)
    for slot in range(3):
        assert not np.allclose(est[slot], sentinel), f"slot {slot} stale"
    # out-of-window slot 3 untouched
    np.testing.assert_array_equal(est[3], sentinel)
    # padded camera contributed nothing to visibility stats
    assert aux.radii.shape[0] == 4
    np.testing.assert_array_equal(np.asarray(aux.radii[3]), 0)


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
