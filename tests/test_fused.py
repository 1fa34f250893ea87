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
    # 1500 bootstrap splats give tracking a dense enough map for cm-level
    # ATE; kf_m=0.04 keeps keyframes triggering on the ~1.5 cm/frame walk
    # (the default 0.15*median_depth never trips on this short sequence).
    cfg = small_fused_cfg(
        init_n_new=1500,
        mapping=MapConfig(window_size=4, recent_window=4, num_iters_init=40,
                          num_iters_mapping=5, kf_m=0.04, render=RCFG),
    )
    slam = FusedSlam(cfg, 80, 60, capacity=4096, kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=4)
    assert m["L"] == 8
    assert m["C"] >= 2, m
    assert m["N"] > 100, m
    # measured 0.047 on this scene (CPU); band leaves float-reassociation
    # headroom while still catching real regressions (was 0.2 in round 2)
    assert np.isfinite(m["ate"]) and m["ate"] < 0.06, m
    assert m["total_map_iters"] > 0
    # frame 0 is always a keyframe (bootstrap)
    assert 0 in m["kf_frames"]


def test_fused_ring_never_evicts_anchor():
    """With kf_capacity=4 and more keyframes than slots, the bootstrap
    keyframe (the gauge anchor, frame_idx 0) must stay resident in slot 0
    with an untouched pose delta, matching the actor backend's
    evict-oldest-non-initial policy (runtime/backend.py:286-294)."""
    ds = SyntheticDataset(seq_len=10, width=64, height=48, n_splats=400,
                          seed=5, motion_scale=0.06)  # aggressive motion
    cfg = small_fused_cfg(
        max_frames=16,
        mapping=MapConfig(window_size=3, recent_window=3, num_iters_init=30,
                          num_iters_mapping=3, kf_m=0.01, render=RCFG),
    )
    slam = FusedSlam(cfg, 64, 48, capacity=2048, kf_capacity=4, seed=0)
    m = slam.run(ds, chunk=1, sync_every=0)
    assert m["C"] > 4, f"needs ring wrap to be meaningful: {m}"
    kf = slam.final_state.kf
    # anchor resident in slot 0 with its pose delta never optimized
    assert int(kf.frame_idx[0]) == 0
    np.testing.assert_array_equal(np.asarray(kf.d_rot6[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(kf.d_t[0]), 0.0)
    # later keyframes rotated through slots 1..3 only
    assert all(int(f) != 0 for f in np.asarray(kf.frame_idx[1:]))


def test_fused_fori_matches_while():
    """mapping_loop='fori' (static trip count, cond-skipped body) must be
    numerically identical to the while_loop plateau early-exit."""
    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=4, motion_scale=0.01)
    a = FusedSlam(small_fused_cfg(max_frames=8), 64, 48, capacity=1024,
                  kf_capacity=8, seed=0)
    ma = a.run(ds, chunk=1, sync_every=0)
    ds2 = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                           seed=4, motion_scale=0.01)
    b = FusedSlam(small_fused_cfg(max_frames=8, mapping_loop="fori"), 64, 48,
                  capacity=1024, kf_capacity=8, seed=0)
    mb = b.run(ds2, chunk=1, sync_every=0)
    # The two loop forms compile to different XLA programs, so float
    # reassociation drifts ~1e-3 over a multi-frame optimization; semantics
    # (keyframe decisions, iteration counts incl. plateau exits) must agree
    # exactly.
    np.testing.assert_allclose(a.trajectory, b.trajectory, atol=1e-2)
    assert ma["C"] == mb["C"]
    assert ma["total_map_iters"] == mb["total_map_iters"]
    assert ma["kf_frames"] == mb["kf_frames"]


def test_fused_overflow_counters():
    """A buffer too small for the requested insertions surfaces dropped
    candidates in the metrics instead of silently saturating."""
    ds = SyntheticDataset(seq_len=3, width=64, height=48, n_splats=400,
                          seed=4, motion_scale=0.01)
    cfg = small_fused_cfg(max_frames=8, init_n_new=400)
    slam = FusedSlam(cfg, 64, 48, capacity=128, kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=1, sync_every=0)
    assert m["inserted_total"] <= 128
    assert m["dropped_inserts"] > 0, m


def test_fused_pgo_and_densify():
    """PGO in the fused runtime: covisibility loop-closure edges appear
    between non-consecutive keyframes (small motion => IoU ~ 1), and the
    pose-graph window fan-out + gradient densification paths execute
    end-to-end on device state."""
    ds = SyntheticDataset(seq_len=8, width=64, height=48, n_splats=400,
                          seed=5, motion_scale=0.04)
    cfg = small_fused_cfg(
        max_frames=16,
        # compact_every=2 forces live-slot compactions mid-run, exercising
        # the kf_vis column permutation (stale columns would break the IoU)
        compact_every=2,
        mapping=MapConfig(window_size=4, recent_window=2, num_iters_init=30,
                          num_iters_mapping=4, kf_m=0.01, enable_pgo=True,
                          densify_every=20, densify_max_new=64,
                          grow_grad2d=1e-8, render=RCFG),
    )
    slam = FusedSlam(cfg, 64, 48, capacity=4096, kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=1, sync_every=0)
    assert m["C"] >= 4, m
    # more edges than the consecutive chain alone => loop closures fired
    assert m["n_pgo_edges"] > m["C"] - 1, m
    # gradient densification fired (init pass crosses densify_every=20)
    assert m["inserted_total"] > 0
    ds2 = SyntheticDataset(seq_len=8, width=64, height=48, n_splats=400,
                           seed=5, motion_scale=0.04)
    cfg_nd = small_fused_cfg(
        max_frames=16,
        mapping=MapConfig(window_size=4, recent_window=2, num_iters_init=30,
                          num_iters_mapping=4, kf_m=0.01, enable_pgo=True,
                          densify_every=0, render=RCFG),
    )
    slam2 = FusedSlam(cfg_nd, 64, 48, capacity=4096, kf_capacity=8, seed=0)
    m2 = slam2.run(ds2, chunk=1, sync_every=0)
    assert m["inserted_total"] > m2["inserted_total"], (m, m2)


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


def test_fused_unrolled_chunk_matches_per_frame():
    """chunk_backend='unroll' folds k frames into one program by trace-time
    unrolling of the SAME slam_step_impl the per-frame mode dispatches, so
    the trajectories must agree to float tolerance (no scan involved; this
    is the axon-safe chunked dispatch, docs/PERF.md)."""
    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=4, motion_scale=0.01)
    a = FusedSlam(small_fused_cfg(max_frames=8), 64, 48, capacity=1024,
                  kf_capacity=8, seed=0)
    ma = a.run(ds, chunk=1, sync_every=0)
    ds2 = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                           seed=4, motion_scale=0.01)
    b = FusedSlam(small_fused_cfg(max_frames=8),
                  64, 48, capacity=1024, kf_capacity=8, seed=0)
    mb = b.run(ds2, chunk=3, chunk_backend="unroll")
    np.testing.assert_allclose(a.trajectory, b.trajectory, atol=1e-5)
    assert ma["C"] == mb["C"]


def test_fused_init_split_matches_monolithic():
    """Splitting the bootstrap optimization across short dispatches
    (init_iters_per_dispatch + host-driven slam_refine) runs the same
    mapping math as the monolithic frame-0 dispatch; quality metrics must
    land in the same band. Exact equality is not expected: the split path
    evaluates the densify cadence at each dispatch boundary and advances
    the PRNG once per refine dispatch."""
    kw = dict(init_n_new=1500, max_frames=8,
              mapping=MapConfig(window_size=4, recent_window=4,
                                num_iters_init=40, num_iters_mapping=5,
                                kf_m=0.04, render=RCFG))
    ds = SyntheticDataset(seq_len=8, width=80, height=60, n_splats=600,
                          seed=3, motion_scale=0.015)
    mono = FusedSlam(small_fused_cfg(**kw), 80, 60, capacity=4096,
                     kf_capacity=8, seed=0).run(ds, chunk=1, sync_every=2)
    split = FusedSlam(small_fused_cfg(init_iters_per_dispatch=15, **kw),
                      80, 60, capacity=4096, kf_capacity=8, seed=0
                      ).run(ds, chunk=1, sync_every=2)
    assert split["C"] == mono["C"]
    assert split["total_map_iters"] >= mono["total_map_iters"]
    assert np.isfinite(split["ate"]) and split["ate"] < 0.06, split
    assert abs(split["ate"] - mono["ate"]) < 0.03, (split["ate"], mono["ate"])


def test_fused_capacity_growth():
    """A run that overfills its initial buffer grows geometrically at the
    backlog syncs (host-triggered grow_fused_state) instead of silently
    dropping inserts forever; per-slot state (kf_vis with PGO) rides the
    compaction permutation."""
    ds = SyntheticDataset(seq_len=8, width=80, height=60, n_splats=600,
                          seed=3, motion_scale=0.015)
    cfg = small_fused_cfg(
        init_n_new=700, kf_n_new=200, max_capacity=4096,
        mapping=MapConfig(window_size=4, recent_window=2, num_iters_init=30,
                          num_iters_mapping=4, kf_m=0.02, enable_pgo=True,
                          render=RCFG),
    )
    slam = FusedSlam(cfg, 80, 60, capacity=512, kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=1, sync_every=2)
    # the watermark tripped (bootstrap fills ~483/512 live) and the run
    # completed cleanly at the recompiled larger shape
    assert m["capacity"] > 512, m
    assert m["C"] >= 2, m
    assert np.isfinite(m["ate"]), m


def test_grow_fused_state_permutes_kf_vis():
    """grow_fused_state carries the per-keyframe visibility columns through
    the live-slot compaction: each surviving splat (matched by its unique
    mean) keeps exactly its pre-growth visibility column, and the padded
    slots are all invisible."""
    from gslam_tpu.runtime.fused import grow_fused_state

    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=5, motion_scale=0.03)
    cfg = small_fused_cfg(
        init_n_new=200, kf_n_new=50,
        mapping=MapConfig(window_size=3, recent_window=3, num_iters_init=15,
                          num_iters_mapping=3, kf_m=0.01, enable_pgo=True,
                          render=RCFG),
    )
    slam = FusedSlam(cfg, 64, 48, capacity=512, kf_capacity=4, seed=0)
    slam.run(ds, chunk=1, sync_every=0)
    st = slam.final_state
    assert bool(np.asarray(st.kf_vis).any()), "need nonzero visibility"

    grown = grow_fused_state(st, 1024)
    assert grown.gmap.capacity == 1024
    pre_alive = np.asarray(st.gmap.alive)
    post_alive = np.asarray(grown.gmap.alive)
    assert pre_alive.sum() == post_alive.sum()
    post_idx = {
        tuple(np.asarray(grown.gmap.means)[j]): j
        for j in np.nonzero(post_alive)[0]
    }
    pre_vis = np.asarray(st.kf_vis)
    post_vis = np.asarray(grown.kf_vis)
    for i_pre in np.nonzero(pre_alive)[0]:
        j = post_idx[tuple(np.asarray(st.gmap.means)[i_pre])]
        np.testing.assert_array_equal(pre_vis[:, i_pre], post_vis[:, j])
    # the freshly padded slots carry no visibility
    assert not post_vis[:, 512:].any()


def test_fused_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Checkpoint mid-run, reload in a fresh FusedSlam, finish — the
    resumed trajectory and map match the uninterrupted run (same state,
    same programs; only the host sync schedule differs)."""
    ds = SyntheticDataset(seq_len=8, width=80, height=60, n_splats=600,
                          seed=3, motion_scale=0.015)
    cfg = small_fused_cfg(
        init_n_new=1500,
        mapping=MapConfig(window_size=4, recent_window=4, num_iters_init=40,
                          num_iters_mapping=5, kf_m=0.04, render=RCFG),
    )
    ref = FusedSlam(cfg, 80, 60, capacity=4096, kf_capacity=8, seed=0)
    m_ref = ref.run(ds, chunk=1, sync_every=3)

    ckpt = tmp_path / "fused_ckpt.npz"
    first = FusedSlam(cfg, 80, 60, capacity=4096, kf_capacity=8, seed=0)
    # syncs land at frames 0, 2, 5; checkpoint_every=4 -> the last (and
    # only) snapshot is at frame 5, so resume still has frames 6-7 to do
    m_first = first.run(ds, chunk=1, sync_every=3, checkpoint_every=4,
                        checkpoint_path=ckpt)
    assert ckpt.exists()
    assert m_first["L"] == m_ref["L"]
    from gslam_tpu.runtime.checkpoint import load_fused_checkpoint
    st_ck, meta_ck = load_fused_checkpoint(str(ckpt), cfg, seed=0)
    assert int(st_ck.frame_count) == 6, int(st_ck.frame_count)
    assert len(meta_ck) == 6

    second = FusedSlam(cfg, 80, 60, capacity=4096, kf_capacity=8, seed=0)
    m2 = second.run(ds, chunk=1, sync_every=3, resume_from=str(ckpt))
    assert m2["L"] == 8
    assert m2["C"] == m_ref["C"], (m2["C"], m_ref["C"])
    np.testing.assert_allclose(
        np.asarray(second.trajectory), np.asarray(ref.trajectory),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(second.final_state.gmap.means),
        np.asarray(ref.final_state.gmap.means), atol=1e-4)
    assert abs(m2["ate"] - m_ref["ate"]) < 1e-4, (m2["ate"], m_ref["ate"])


def test_fused_nan_frame_survives_with_fallback():
    """A NaN-poisoned frame must not poison the run: the tracking guard
    rejects the non-finite refinement, falls back to the motion prior,
    increments the health counter, and every later pose stays finite
    (VERDICT r3: the flagship went NaN at frame 24 and ran blind for 136
    frames with nothing noticing)."""
    ds = SyntheticDataset(seq_len=8, width=64, height=48, n_splats=400,
                          seed=4, motion_scale=0.01)
    ds.images = ds.images.copy()
    ds.images[3] = np.nan  # sensor glitch: a whole frame of NaNs
    slam = FusedSlam(small_fused_cfg(max_frames=8), 64, 48, capacity=1024,
                     kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=1, sync_every=0)
    assert np.isfinite(slam.trajectory).all()
    assert m["health"] >= 1
    # one recovered rejection is honest health accounting, not a
    # diverged run: diverged = abort threshold reached or non-finite
    assert m["diverged"] is False
    assert m["nonfinite_poses"] == 0


def test_fused_host_abort_on_unhealthy():
    """The backlog-sync readback must abort a doomed run within
    sync_every frames once the health counter crosses the threshold."""
    import pytest

    ds = SyntheticDataset(seq_len=8, width=64, height=48, n_splats=400,
                          seed=4, motion_scale=0.01)
    ds.images = ds.images.copy()
    ds.images[2:6] = np.nan
    cfg = small_fused_cfg(max_frames=8, abort_unhealthy=2)
    slam = FusedSlam(cfg, 64, 48, capacity=1024, kf_capacity=8, seed=0)
    with pytest.raises(RuntimeError, match="health counter"):
        slam.run(ds, chunk=1, sync_every=2)


def test_keyframes_trigger_at_default_config_via_kf_adapt():
    """Motion-adaptive trigger (MapConfig.kf_adapt): on a ~1.5 cm/frame
    translation walk the DEFAULT config must take keyframes — r4's gate
    only passed with a hand-tuned --set mapping.kf_m=0.015 because the
    fixed kf_m * median_depth threshold (~0.3 m) never trips at realistic
    motion (VERDICT r4 weak #7, TRACKING_STUDY 'keyframe density')."""
    ds = SyntheticDataset(seq_len=10, width=64, height=48, n_splats=400,
                          seed=5, motion_scale=0.012)
    cfg = small_fused_cfg(max_frames=10)  # DEFAULT kf_m/kf_adapt/kf_cos
    slam = FusedSlam(cfg, 64, 48, capacity=2048, kf_capacity=8, seed=0)
    m = slam.run(ds, chunk=1, sync_every=0)
    # bootstrap + adaptive keyframes every ~2-3 frames of motion
    assert m["C"] >= 3, m
    # and the fixed-threshold rule alone would NOT have fired
    kd_tr = slam.telemetry["kd_translation"]
    kd_med = slam.telemetry["kd_median_depth"]
    assert not (kd_tr[1:] > 0.15 * kd_med[1:]).any(), (
        "scene too fast: the fixed kf_m rule fires, test no longer "
        "isolates kf_adapt")


def test_kf_cos_angle_rule_fires_on_pure_rotation():
    """View-angle trigger (MapConfig.kf_cos, reference backend.py:739-792):
    `keyframe_decision_stats` on a 7-degree pan with ZERO translation must
    report cos_z below cos(pi/30) — i.e. the angle rule fires — while the
    translation (kf_m) rule does not (VERDICT r4 weak #8: the angle path
    had no test at all).

    This is a unit test of the decision function rather than a full SLAM
    integration: at test-scale resolution (64x48) pure rotation is
    photometrically near-ambiguous with sideways translation, so a real
    tracked pan estimates translation instead of yaw (measured: a 2
    deg/frame pan tracks as 2-10 cm/frame sideways steps at loss 9e-3,
    with or without the gt-depth lock) and the estimated poses never
    accumulate view angle. The TRIGGER path is what was untested, and it
    is a pure jitted function — exercise it directly."""
    import math

    import jax.numpy as jnp

    from gslam_tpu.mapping.backend_ops import keyframe_decision_stats
    from gslam_tpu.mapping.gaussians import empty_map
    from gslam_tpu.core.transforms import so3_exp

    rng = np.random.default_rng(3)
    cap, W, H = 256, 64, 48
    z = rng.uniform(0.8, 2.0, cap).astype(np.float32)
    gmap = empty_map(cap)._replace(
        means=jnp.asarray(np.stack(
            [rng.normal(0, 0.5, cap), rng.normal(0, 0.4, cap), z],
            -1).astype(np.float32)),
        log_scales=jnp.full((cap, 3), np.log(0.06), jnp.float32),
        logit_opacities=jnp.asarray(
            rng.normal(1.0, 0.3, cap).astype(np.float32)),
        logit_colors=jnp.asarray(
            rng.normal(0, 1, (cap, 3)).astype(np.float32)),
        alive=jnp.ones(cap, bool),
    )
    K = jnp.asarray(
        [[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]], jnp.float32)
    prev = jnp.eye(4, dtype=jnp.float32)
    yaw = math.radians(7.0)  # past the pi/30 = 6 deg threshold
    new = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(
        so3_exp(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))

    cfg = MapConfig(window_size=4, recent_window=4, render=RCFG)
    stats = keyframe_decision_stats(gmap, new, prev, K, W, H, cfg=cfg)

    assert float(stats.translation) < 1e-5  # pan in place: no translation
    assert float(stats.cos_z) < math.cos(math.pi / 30), stats.cos_z
    # the translation rule must NOT fire — only the angle rule can
    assert float(stats.translation) < cfg.kf_m * float(stats.median_depth)
    # and a sub-threshold pan must NOT fire the angle rule
    small = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(
        so3_exp(jnp.asarray([0.0, math.radians(3.0), 0.0], jnp.float32)))
    s2 = keyframe_decision_stats(gmap, small, prev, K, W, H, cfg=cfg)
    assert float(s2.cos_z) > math.cos(math.pi / 30), s2.cos_z
