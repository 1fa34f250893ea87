"""Multi-chip SLAM loop (parallel/slam.py) on the virtual 8-device mesh.

Round-3 sharding tests covered isolated mapping steps; these cover the
FULL loop — banded tracking, GSPMD insertion, windowed banded mapping,
pruning, depth repartition — and its equality with the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.io.synthetic import SyntheticDataset
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.ops.rasterize import RenderConfig
from gslam_tpu.tracking.track import TrackingConfig
from tests.scene_utils import make_scene

RCFG = RenderConfig(tile_capacity=64, tile_chunk=8, pairs_per_gaussian=8)


def _n_devices() -> int:
    try:
        return len(jax.devices("cpu"))
    except RuntimeError:
        return 0


def _slam_cfg(rcfg=RCFG, **kw):
    from gslam_tpu.parallel.slam import ShardedSlamConfig

    kw.setdefault("init_n_new", 600)
    kw.setdefault("kf_n_new", 100)
    kw.setdefault("mapping", MapConfig(window_size=3, num_iters_init=20,
                                       num_iters_mapping=4, render=rcfg))
    return ShardedSlamConfig(
        tracking=TrackingConfig(warmup_steps=4, lbfgs_max_iter=20,
                                lbfgs_max_eval=25, render=rcfg),
        idle_iters=1, **kw)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_banded_track_render_matches_full(rng):
    """The per-band tile render + layer composite inside the sharded
    tracking loss must reproduce the single-device fused tracking render
    when the partition view equals the render view."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gslam_tpu.mapping.gaussians import GaussianMap
    from gslam_tpu.ops.rasterize import compute_bins
    from gslam_tpu.ops.track_fused import (
        gather_tracking_tiles, render_tracking_fused,
    )
    from gslam_tpu.parallel.sharding import make_mesh, partition_by_depth
    from gslam_tpu.parallel.slam import _compose_bands

    params, viewmat, Ks, width, height = make_scene(rng, n=256)
    gmap = GaussianMap(ages=jnp.zeros(256, jnp.int32), **params)
    # Tile lists must not saturate: a band's lists hold D x tile_capacity
    # entries per tile in aggregate, so a saturated single-device tile
    # renders FEWER splats than its banded decomposition (the bands are
    # more complete, not wrong). Equality needs headroom on both sides.
    rcfg = RenderConfig(tile_capacity=160, tile_chunk=8,
                        pairs_per_gaussian=8)
    tcfg = TrackingConfig(render=rcfg)
    pose, K = viewmat[0], Ks[0]

    # single-device reference on the SAME depth-ordered buffer
    gmap = partition_by_depth(gmap, pose)
    bins = compute_bins(gmap.means, gmap.quats, gmap.log_scales, gmap.alive,
                        pose[None], K[None], width, height, rcfg,
                        radius_scale=tcfg.bin_radius_margin)
    occ = np.asarray(bins.tile_mask[0]).sum(-1)
    assert occ.max() < rcfg.tile_capacity, "fixture saturates tile lists"
    tiles = gather_tracking_tiles(gmap, bins)
    ref_rgb, ref_depth, ref_beta, ref_alpha = render_tracking_fused(
        tiles, pose, K, width, height, rcfg)

    mesh = make_mesh(8, axis="gauss")
    gmap_s = jax.device_put(gmap, NamedSharding(mesh, P("gauss")))

    def prep_band(g, p, k):
        b = compute_bins(g.means, g.quats, g.log_scales, g.alive, p[None],
                         k[None], width, height, rcfg,
                         radius_scale=tcfg.bin_radius_margin)
        return gather_tracking_tiles(g, b)

    def band_layers(tg, p, k):
        rgb, depth, beta, alpha = render_tracking_fused(
            tg, p, k, width, height, rcfg)
        return _compose_bands(
            jax.lax.all_gather(rgb, "gauss"),
            jax.lax.all_gather(alpha, "gauss"),
            jax.lax.all_gather(depth, "gauss"),
            jax.lax.all_gather(beta, "gauss"), rcfg.beta_background)

    tiles_s = jax.shard_map(prep_band, mesh=mesh,
                            in_specs=(P("gauss"), P(), P()),
                            out_specs=P("gauss"))(gmap_s, pose, K)
    rgb, alpha, depth, beta = jax.shard_map(
        band_layers, mesh=mesh, in_specs=(P("gauss"), P(), P()),
        out_specs=P(), check_vma=False)(tiles_s, pose, K)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(beta), np.asarray(ref_beta),
                               atol=1e-4)


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_sharded_insert_matches_single_device(rng):
    """GSPMD insertion: the scatter into a band-sharded buffer must produce
    bit-identical results to the replicated single-device insert."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gslam_tpu.mapping.gaussians import GaussianMap, empty_map
    from gslam_tpu.mapping.insertion import insert_from_depthmap
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.parallel.sharding import make_mesh

    h, w = 24, 32
    gmap = empty_map(512)
    # pre-populate a few live splats so free slots are non-trivial
    alive = gmap.alive.at[:37].set(True)
    gmap = gmap._replace(
        alive=alive, means=jnp.asarray(rng.normal(size=(512, 3)), jnp.float32))
    opt = init_adam(gmap)
    key = jax.random.PRNGKey(5)
    depth = jnp.asarray(1.0 + rng.random((h, w)), jnp.float32)
    alpha = jnp.asarray(rng.random((h, w)), jnp.float32)
    img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    K = jnp.asarray([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    pose = jnp.eye(4)

    ref = insert_from_depthmap(key, gmap, opt, depth, alpha, img, K, pose,
                               n_new=64, frame_index=3)

    mesh = make_mesh(8, axis="gauss")
    gsh = NamedSharding(mesh, P("gauss"))
    spec = jax.tree_util.tree_map(
        lambda x: gsh if (hasattr(x, "ndim") and x.ndim >= 1
                          and x.shape[0] == 512)
        else NamedSharding(mesh, P()), gmap)
    ospec = jax.tree_util.tree_map(
        lambda x: gsh if x.ndim >= 1 and x.shape[0] == 512
        else NamedSharding(mesh, P()), opt)
    gmap_s = jax.device_put(gmap, spec)
    opt_s = jax.device_put(opt, ospec)
    out = insert_from_depthmap(key, gmap_s, opt_s, depth, alpha, img, K,
                               pose, n_new=64, frame_index=3)

    assert int(out.n_inserted) == int(ref.n_inserted) > 0
    for f in ("means", "log_scales", "logit_colors"):
        np.testing.assert_allclose(np.asarray(getattr(out.gmap, f)),
                                   np.asarray(getattr(ref.gmap, f)),
                                   atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.gmap.alive),
                                  np.asarray(ref.gmap.alive))


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_sharded_slam_e2e_tracks():
    """Full multi-chip SLAM loop on an 8-band mesh: finite, healthy, and
    within the ATE bound on an easy-motion scene."""
    from gslam_tpu.parallel.sharding import make_mesh
    from gslam_tpu.parallel.slam import ShardedSlam

    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=3, motion_scale=0.01)
    mesh = make_mesh(8, axis="gauss")
    slam = ShardedSlam(_slam_cfg(), mesh, 64, 48, capacity=1024,
                       kf_capacity=8, seed=0)
    m = slam.run(ds, eval_stride=2)
    assert m["L"] == 6 and m["C"] >= 1
    assert m["health"] == 0 and m["nonfinite_poses"] == 0
    assert np.isfinite(m["ate"]) and m["ate"] < 0.05, m
    assert m["psnr"] > 15.0, m
    assert m["live"] > 0


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_sharded_slam_e2e_rgbd():
    """RGB-D sharded loop: the banded tracking loss must apply the same
    alpha-normalized, alpha-masked depth lock as the single-chip fused
    path (ADVICE r4 medium: the raw composited depth at weight 1.0 is a
    pose-independent bias on young maps)."""
    from gslam_tpu.parallel.sharding import make_mesh
    from gslam_tpu.parallel.slam import ShardedSlam

    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=3, motion_scale=0.01)
    mesh = make_mesh(8, axis="gauss")
    slam = ShardedSlam(_slam_cfg(use_gt_depths=True), mesh, 64, 48,
                       capacity=1024, kf_capacity=8, seed=0)
    m = slam.run(ds, eval_stride=2)
    assert m["L"] == 6 and m["C"] >= 1
    assert m["health"] == 0 and m["nonfinite_poses"] == 0
    assert np.isfinite(m["ate"]) and m["ate"] < 0.05, m
    assert m["psnr"] > 15.0, m


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_sharded_slam_mesh_size_invariance():
    """The SAME ShardedSlam program on a 1-band and an 8-band mesh solves
    the same problem. Bitwise trajectory equality is unachievable — the
    band composite reassociates float sums (~1e-7), which flips strong-
    Wolfe line-search branches and amplifies chaotically through the
    insert/map loop — so assert statistical equivalence: both healthy,
    both within the quality bound, trajectories within a loose envelope."""
    from gslam_tpu.parallel.sharding import make_mesh
    from gslam_tpu.parallel.slam import ShardedSlam

    ds = SyntheticDataset(seq_len=4, width=48, height=32, n_splats=300,
                          seed=5, motion_scale=0.008)
    # effective tile capacity is D x tile_capacity (per-band lists), so a
    # saturated tile would legitimately render differently across mesh
    # sizes — give every tile headroom at D=1 to compare algorithms only
    cfg = _slam_cfg(rcfg=RenderConfig(tile_capacity=256, tile_chunk=8,
                                      pairs_per_gaussian=8),
                    init_n_new=300, kf_n_new=50)
    runs = {}
    for n in (1, 8):
        slam = ShardedSlam(cfg, make_mesh(n, axis="gauss"), 48, 32,
                           capacity=512, kf_capacity=8, seed=0)
        m = slam.run(ds)
        runs[n] = (np.stack(slam.trajectory), m)
    t1, m1 = runs[1]
    t8, m8 = runs[8]
    assert m1["health"] == m8["health"] == 0
    assert m1["nonfinite_poses"] == m8["nonfinite_poses"] == 0
    assert m1["ate"] < 0.02 and m8["ate"] < 0.02, (m1["ate"], m8["ate"])
    assert abs(m1["ate"] - m8["ate"]) < 0.01
    np.testing.assert_allclose(t8, t1, atol=0.05)


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_sharded_pgo_and_densify():
    """Pose graph + gradient densification under sharding (VERDICT r4
    next #10 — they were single-chip-only): on an 8-band mesh the loop
    must (a) take visibility snapshots and close loops by IoU > kf_cov
    (reference backend.py:675-737), (b) include pose-graph neighbors in
    the optimization window, and (c) fire gradient densification at the
    densify_every cadence using the banded dL/dmeans2d probe — and the
    run must stay healthy and within the quality bound."""
    from gslam_tpu.parallel.sharding import make_mesh
    from gslam_tpu.parallel.slam import ShardedSlam

    ds = SyntheticDataset(seq_len=6, width=64, height=48, n_splats=400,
                          seed=3, motion_scale=0.012)
    cfg = _slam_cfg(
        init_n_new=800,
        mapping=MapConfig(window_size=4, recent_window=2, num_iters_init=20,
                          num_iters_mapping=4, render=RCFG, enable_pgo=True,
                          densify_every=8, densify_max_new=64))
    mesh = make_mesh(8, axis="gauss")
    slam = ShardedSlam(cfg, mesh, 64, 48, capacity=1024, kf_capacity=8,
                       seed=0)
    m = slam.run(ds, eval_stride=3)
    assert m["health"] == 0 and m["nonfinite_poses"] == 0
    assert np.isfinite(m["ate"]) and m["ate"] < 0.05, m
    # slow in-place walk over a shared view: consecutive keyframes overlap
    # almost fully, so the IoU rule must have produced loop-closure edges
    assert m["loop_closures"] >= 1, m
    # adjacency is symmetric, no self-edges
    assert (slam.adj == slam.adj.T).all() and not slam.adj.diagonal().any()
    # densify fired at least once (total_map_iters crossed a multiple of 8)
    assert m["total_map_iters"] >= 8
    assert m["live"] > cfg.init_n_new, m  # densified splats present


@pytest.mark.skipif(_n_devices() < 8, reason="needs 8 virtual devices")
def test_sharded_pgo_mesh_size_invariance():
    """PGO + densify give statistically equivalent results on a 1-band and
    an 8-band mesh (same envelope argument as
    test_sharded_slam_mesh_size_invariance)."""
    from gslam_tpu.parallel.sharding import make_mesh
    from gslam_tpu.parallel.slam import ShardedSlam

    ds = SyntheticDataset(seq_len=4, width=48, height=32, n_splats=300,
                          seed=5, motion_scale=0.008)
    cfg = _slam_cfg(
        rcfg=RenderConfig(tile_capacity=256, tile_chunk=8,
                          pairs_per_gaussian=8),
        init_n_new=300, kf_n_new=50,
        mapping=MapConfig(window_size=3, recent_window=2, num_iters_init=20,
                          num_iters_mapping=4, enable_pgo=True,
                          densify_every=8, densify_max_new=32,
                          render=RenderConfig(tile_capacity=256,
                                              tile_chunk=8,
                                              pairs_per_gaussian=8)))
    runs = {}
    for n in (1, 8):
        slam = ShardedSlam(cfg, make_mesh(n, axis="gauss"), 48, 32,
                           capacity=512, kf_capacity=8, seed=0)
        m = slam.run(ds)
        runs[n] = (np.stack(slam.trajectory), m)
    t1, m1 = runs[1]
    t8, m8 = runs[8]
    assert m1["health"] == m8["health"] == 0
    assert m1["ate"] < 0.02 and m8["ate"] < 0.02, (m1["ate"], m8["ate"])
    np.testing.assert_allclose(t8, t1, atol=0.05)
