import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.ops import render, RenderConfig
from gslam_tpu.ops.binning import bin_gaussians
from gslam_tpu.ops.projection import project_gaussians
from gslam_tpu.ops.rasterize_dense import render_dense

from scene_utils import make_scene

CFG = RenderConfig(tile_size=16, tile_capacity=128, tile_chunk=4)


def test_projection_center_gaussian():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    means = jnp.array([[0.0, 0.0, 2.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.1)
    out = project_gaussians(means, quats, scales, jnp.eye(4), K, 64, 48)
    np.testing.assert_allclose(np.asarray(out.means2d), [[32.0, 24.0]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depths), [2.0], atol=1e-6)
    assert bool(out.valid[0])
    # isotropic: conic diag equal, off-diag ~0; sigma2d = (100*0.1/2)^2+0.3 = 25.3
    conic = np.asarray(out.conics[0])
    np.testing.assert_allclose(conic[0], 1.0 / 25.3, rtol=1e-4)
    np.testing.assert_allclose(conic[2], 1.0 / 25.3, rtol=1e-4)
    np.testing.assert_allclose(conic[1], 0.0, atol=1e-6)
    # radius = ceil(3*sqrt(25.3)) = ceil(15.09) = 16
    assert float(out.radii[0]) == 16.0


def test_projection_culling():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    means = jnp.array([[0.0, 0.0, -2.0], [50.0, 0.0, 2.0], [0.0, 0.0, 2.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1))
    scales = jnp.full((3, 3), 0.1)
    out = project_gaussians(means, quats, scales, jnp.eye(4), K, 64, 48)
    assert not bool(out.valid[0])  # behind camera
    assert not bool(out.valid[1])  # far outside image
    assert bool(out.valid[2])
    assert float(out.radii[0]) == 0.0


def test_projection_pose_gradient():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    means = jnp.array([[0.3, -0.2, 2.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    scales = jnp.full((1, 3), 0.1)

    def f(viewmat):
        out = project_gaussians(means, quats, scales, viewmat, K, 64, 48)
        return jnp.sum(out.means2d)

    g = jax.grad(f)(jnp.eye(4))
    assert np.abs(np.asarray(g)).max() > 0
    assert np.all(np.isfinite(np.asarray(g)))


def test_binning_matches_bruteforce(rng):
    n, w, h, ts = 50, 64, 48, 16
    tiles_x, tiles_y = 4, 3
    xy = jnp.asarray(rng.uniform(-10, 70, size=(n, 2)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0, 20, size=n).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 5, size=n).astype(np.float32))
    valid = jnp.asarray(rng.random(n) > 0.2)

    bins = bin_gaussians(xy, radii, depths, valid, ts, tiles_x, tiles_y,
                         max_pairs=n * 12, capacity=64, max_span=16)

    xy_np, r_np, v_np, d_np = map(np.asarray, (xy, radii, valid, depths))
    for t in range(tiles_x * tiles_y):
        tx, ty = t % tiles_x, t // tiles_x
        expected = []
        for i in range(n):
            if not v_np[i]:
                continue
            x0 = np.clip(np.floor((xy_np[i, 0] - r_np[i]) / ts), 0, tiles_x - 1)
            x1 = np.clip(np.floor((xy_np[i, 0] + r_np[i]) / ts), 0, tiles_x - 1)
            y0 = np.clip(np.floor((xy_np[i, 1] - r_np[i]) / ts), 0, tiles_y - 1)
            y1 = np.clip(np.floor((xy_np[i, 1] + r_np[i]) / ts), 0, tiles_y - 1)
            if x0 <= tx <= x1 and y0 <= ty <= y1:
                expected.append(i)
        expected = sorted(expected, key=lambda i: d_np[i])
        got = np.asarray(bins.tile_gauss[t])[np.asarray(bins.tile_mask[t])]
        assert int(bins.tile_counts[t]) == len(expected)
        # same set, depth-sorted order
        assert list(got) == expected, f"tile {t}"


def test_tiled_matches_dense(rng):
    params, viewmats, Ks, w, h = make_scene(rng, n=120)
    out = render(**params, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
    d_rgb, d_alpha, d_depth, d_beta, d_radii, d_touch = render_dense(
        **params, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG
    )
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(d_rgb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(d_alpha), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(d_depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.beta), np.asarray(d_beta), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.n_touched), np.asarray(d_touch))


def test_tiled_matches_dense_odd_size(rng):
    # image size not a multiple of tile_size
    params, viewmats, Ks, _, _ = make_scene(rng, n=60, width=50, height=37)
    out = render(**params, viewmats=viewmats, Ks=Ks, width=50, height=37, cfg=CFG)
    d_rgb, d_alpha, *_ = render_dense(
        **params, viewmats=viewmats, Ks=Ks, width=50, height=37, cfg=CFG
    )
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(d_rgb), atol=2e-5)


def test_render_with_background(rng):
    params, viewmats, Ks, w, h = make_scene(rng, n=5)
    bg = jnp.array([0.2, 0.4, 0.6])
    out = render(**params, viewmats=viewmats, Ks=Ks, width=w, height=h,
                 bg_rgb=bg, cfg=CFG)
    # pixels with no splats show pure background
    alpha = np.asarray(out.alpha[0])
    rgb = np.asarray(out.rgb[0])
    empty = alpha < 1e-6
    assert empty.any()
    np.testing.assert_allclose(rgb[empty], np.tile([0.2, 0.4, 0.6], (empty.sum(), 1)),
                               atol=1e-6)


def test_dead_splats_invisible(rng):
    params, viewmats, Ks, w, h = make_scene(rng, n=50)
    out_all = render(**params, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
    params2 = dict(params)
    params2["alive"] = params["alive"].at[:25].set(False)
    out_half = render(**params2, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
    params3 = {
        k: (v[25:] if k != "alive" else v[25:]) for k, v in params.items()
    }
    out_sliced = render(**params3, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
    assert not np.allclose(np.asarray(out_all.rgb), np.asarray(out_half.rgb))
    np.testing.assert_allclose(
        np.asarray(out_half.rgb), np.asarray(out_sliced.rgb), atol=1e-5
    )
    assert np.asarray(out_half.radii[0, :25]).max() == 0.0


def test_grad_matches_dense(rng):
    params, viewmats, Ks, w, h = make_scene(rng, n=40)
    target = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))

    def loss_tiled(means, log_scales, viewmats):
        p = dict(params, means=means, log_scales=log_scales)
        out = render(**p, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
        return jnp.mean((out.rgb - target) ** 2)

    def loss_dense(means, log_scales, viewmats):
        p = dict(params, means=means, log_scales=log_scales)
        rgb, *_ = render_dense(**p, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
        return jnp.mean((rgb - target) ** 2)

    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2))(
        params["means"], params["log_scales"], viewmats
    )
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(
        params["means"], params["log_scales"], viewmats
    )
    for a, b in zip(g_t, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3)


@pytest.mark.parametrize("argname", ["means", "logit_opacities"])
def test_grad_numeric(rng, argname):
    params, viewmats, Ks, w, h = make_scene(rng, n=10)
    target = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))

    def loss(x):
        p = dict(params)
        p[argname] = x
        out = render(**p, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG)
        return jnp.mean((out.rgb - target) ** 2)

    x0 = params[argname]
    g = np.asarray(jax.grad(loss)(x0))
    # check a few coordinates by central differences
    flat = np.asarray(x0).reshape(-1)
    idxs = rng.choice(flat.size, size=4, replace=False)
    eps = 1e-3
    for i in idxs:
        delta = np.zeros_like(flat)
        delta[i] = eps
        d = jnp.asarray(delta.reshape(np.asarray(x0).shape))
        fd = (float(loss(x0 + d)) - float(loss(x0 - d))) / (2 * eps)
        assert abs(fd - g.reshape(-1)[i]) < 5e-3 * max(1.0, abs(fd)), (
            argname, i, fd, g.reshape(-1)[i])


def test_pose_gradient_descends(rng):
    """Perturbed camera pose: one gradient step reduces photometric error."""
    params, viewmats, Ks, w, h = make_scene(rng, n=80)
    target = render(**params, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=CFG).rgb

    from gslam_tpu.core.transforms import se3_exp
    xi = jnp.array([0.01, -0.01, 0.02, 0.004, -0.003, 0.002])

    def loss(xi):
        vm = (se3_exp(xi) @ viewmats[0])[None]
        out = render(**params, viewmats=vm, Ks=Ks, width=w, height=h, cfg=CFG)
        return jnp.mean((out.rgb - target) ** 2)

    l0 = float(loss(xi))
    g = jax.grad(loss)(xi)
    l1 = float(loss(xi - 0.3 * g / (jnp.linalg.norm(g) + 1e-12) * 0.01))
    assert np.all(np.isfinite(np.asarray(g)))
    assert l1 < l0
