"""Gauss-Newton / Levenberg-Marquardt tracker (TrackingConfig.method='gn').

The GN tracker replaces the ~200-closure-eval L-BFGS line search with a
p<=11-dim damped normal system per iteration (tracking/track.py
track_frame_gn_impl; reference objective at
/root/reference/gslam/frontend.py:604-658). These tests assert the
quadratic-convergence claim the round-5 perf work rests on: far fewer
render evaluations for equal-or-better pose error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.io.synthetic import SyntheticDataset
from gslam_tpu.ops.rasterize import RenderConfig
from gslam_tpu.tracking.track import TrackingConfig, track_frame


def _center(m):
    m = np.asarray(m)
    return -m[:3, :3].T @ m[:3, 3]


@pytest.fixture(scope="module")
def scene():
    return SyntheticDataset(
        seq_len=4, width=96, height=72, n_splats=1500, seed=0,
        motion_scale=0.03)


_RCFG = RenderConfig(tile_capacity=128, tile_chunk=16)


def test_gn_converges_from_prev_frame_prior(scene):
    """~7 cm prior error -> sub-mm in <= ~25 render evals (L-BFGS needs
    ~200 for the same scene per docs/TRACKING_STUDY.md)."""
    ds = scene
    K = jnp.asarray(ds.camera.K)
    cfg = TrackingConfig(method="gn", gn_iters=10, render=_RCFG)
    prior = jnp.asarray(ds.poses[0])
    r = track_frame(ds.gt_map, prior, jnp.zeros(2),
                    jnp.asarray(ds.images[1]), K, 96, 72, cfg)
    err_prior = np.linalg.norm(_center(prior) - _center(ds.poses[1]))
    err = np.linalg.norm(_center(r.pose) - _center(ds.poses[1]))
    assert not bool(r.rejected)
    assert err_prior > 0.02  # the prior really is far off
    assert err < 1e-3, (err_prior, err)
    assert int(r.n_evals) <= 2 * cfg.gn_iters + 1


def test_gn_rgbd_depth_residual(scene):
    """RGB-D mode: the alpha-normalized depth rows are part of the normal
    system and the tracker still converges."""
    ds = scene
    K = jnp.asarray(ds.camera.K)
    cfg = TrackingConfig(method="gn", gn_iters=10, use_gt_depths=True,
                         render=_RCFG)
    # gt depth for frame 1 rendered from the gt map at the gt pose
    from gslam_tpu.ops.rasterize import render

    out = render(**ds.gt_map.render_kwargs(),
                 viewmats=jnp.asarray(ds.poses[1])[None], Ks=K[None],
                 width=96, height=72, cfg=_RCFG)
    gt_depth = out.depth[0] / jnp.maximum(out.alpha[0], 1e-3)
    r = track_frame(ds.gt_map, jnp.asarray(ds.poses[0]), jnp.zeros(2),
                    jnp.asarray(ds.images[1]), K, 96, 72, cfg,
                    gt_depth=gt_depth)
    err = np.linalg.norm(_center(r.pose) - _center(ds.poses[1]))
    assert not bool(r.rejected)
    assert err < 2e-3, err


def test_gn_guard_rejects_nonfinite_image(scene):
    """A NaN frame must trip the divergence guard, not poison the pose."""
    ds = scene
    K = jnp.asarray(ds.camera.K)
    cfg = TrackingConfig(method="gn", gn_iters=4, render=_RCFG)
    bad = jnp.full_like(jnp.asarray(ds.images[1]), jnp.nan)
    prior = jnp.asarray(ds.poses[0])
    r = track_frame(ds.gt_map, prior, jnp.zeros(2), bad, K, 96, 72, cfg)
    assert bool(r.rejected)
    # fallback pose is the untouched prior
    np.testing.assert_allclose(np.asarray(r.pose), np.asarray(prior),
                               atol=1e-6)


def test_gn_pyramid_dispatch(scene):
    """method='gn' + pyramid_levels>1 runs GN at every level."""
    ds = scene
    K = jnp.asarray(ds.camera.K)
    cfg = TrackingConfig(method="gn", gn_iters=6, pyramid_levels=2,
                         render=_RCFG)
    r = track_frame(ds.gt_map, jnp.asarray(ds.poses[0]), jnp.zeros(2),
                    jnp.asarray(ds.images[1]), K, 96, 72, cfg)
    err = np.linalg.norm(_center(r.pose) - _center(ds.poses[1]))
    assert not bool(r.rejected)
    assert err < 1e-3, err
    assert int(r.n_evals) <= 2 * (2 * cfg.gn_iters + 1)
