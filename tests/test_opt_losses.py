import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from gslam_tpu.opt import lbfgs
from gslam_tpu.ops.ssim import ssim
from gslam_tpu.ops.losses import (
    tracking_photometric, mapping_photometric, isotropic_scale_loss,
    edge_aware_depth_tv, masked_depth_l1, apply_exposure,
)
from gslam_tpu.ops.knn import knn_distances, mean_knn_scale


def test_lbfgs_quadratic():
    A = jnp.diag(jnp.array([1.0, 10.0, 100.0]))
    b = jnp.array([1.0, -2.0, 3.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs(f, jnp.zeros(3), max_iter=50, max_eval=100)
    x_star = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-4)


def test_lbfgs_rosenbrock():
    def f(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = lbfgs(f, jnp.array([-1.2, 1.0]), max_iter=100, max_eval=500)
    # compare against scipy from the same start
    ref = scipy.optimize.minimize(
        lambda x: float(f(jnp.asarray(x, dtype=jnp.float32))),
        np.array([-1.2, 1.0]),
        method="L-BFGS-B",
    )
    assert float(res.f) < 1e-4 or float(res.f) <= ref.fun * 1.5 + 1e-6


def test_lbfgs_matches_torch_on_pose_like_problem(rng):
    """9-dim nonconvex problem shaped like a pose refinement."""
    import torch

    W = rng.normal(size=(32, 9)).astype(np.float32)
    y = rng.normal(size=32).astype(np.float32)

    def f_jax(x):
        r = jnp.tanh(jnp.asarray(W) @ x) - jnp.asarray(y)
        return jnp.sum(r**2)

    res = lbfgs(f_jax, jnp.zeros(9), max_iter=20, max_eval=25, history=5, lr=1.0)

    xt = torch.zeros(9, requires_grad=True)
    opt = torch.optim.LBFGS(
        [xt], history_size=5, line_search_fn="strong_wolfe", max_iter=20
    )

    def closure():
        opt.zero_grad()
        loss = ((torch.tanh(torch.tensor(W) @ xt) - torch.tensor(y)) ** 2).sum()
        loss.backward()
        return loss

    opt.step(closure)
    f_torch = float(closure())
    assert float(res.f) <= f_torch * 1.05 + 1e-5, (float(res.f), f_torch)


def _ssim_numpy(a, b, size=11, sigma=1.5):
    from scipy.ndimage import correlate1d

    x = np.arange(size) - (size - 1) / 2
    w = np.exp(-(x**2) / (2 * sigma**2))
    w /= w.sum()

    def filt(img):
        out = correlate1d(img, w, axis=0, mode="constant")
        out = correlate1d(out, w, axis=1, mode="constant")
        r = (size - 1) // 2
        return out[r:-r, r:-r]

    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for ch in range(a.shape[-1]):
        x1, x2 = a[..., ch], b[..., ch]
        mu1, mu2 = filt(x1), filt(x2)
        s1 = filt(x1 * x1) - mu1**2
        s2 = filt(x2 * x2) - mu2**2
        s12 = filt(x1 * x2) - mu1 * mu2
        v = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
        )
        vals.append(v)
    return np.mean(vals)


def test_ssim_reference(rng):
    a = rng.random((1, 24, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = _ssim_numpy(a[0], b[0])
    assert abs(got - want) < 1e-4
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.9999


def test_tracking_photometric(rng):
    r = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    g = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    betas = jnp.full((8, 8), 2.0)
    want = float(jnp.mean(jnp.sum((r - g) ** 2, -1)) / 4.0)
    got = float(tracking_photometric(r, g, betas))
    assert abs(got - want) < 1e-6
    assert abs(float(tracking_photometric(r, g, betas, "l1"))
               - float(jnp.mean(jnp.abs(r - g)))) < 1e-7


def test_mapping_photometric_padding_invariance(rng):
    """Padded camera slots must not change the loss."""
    r = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    g = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    betas = jnp.asarray(rng.random((2, 8, 8)).astype(np.float32) + 0.5)
    full = mapping_photometric(r, g, betas, cam_mask=jnp.array([True, True]))
    r_pad = jnp.concatenate([r, jnp.zeros_like(r)], 0)
    g_pad = jnp.concatenate([g, jnp.ones_like(g)], 0)
    b_pad = jnp.concatenate([betas, jnp.full_like(betas, 9.0)], 0)
    padded = mapping_photometric(
        r_pad, g_pad, b_pad, cam_mask=jnp.array([True, True, False, False])
    )
    np.testing.assert_allclose(float(full), float(padded), rtol=1e-6)


def test_isotropic_loss():
    ls = jnp.log(jnp.array([[1.0, 1.0, 1.0], [1.0, 2.0, 4.0]]))
    vis = jnp.array([True, True])
    # splat 0 isotropic -> 0; splat 1 mean log-scale = log(2) -> |1-2|+|2-2|+|4-2| = 3
    got = float(isotropic_scale_loss(ls, vis))
    assert abs(got - 3.0) < 1e-5
    got0 = float(isotropic_scale_loss(ls, jnp.array([True, False])))
    assert abs(got0) < 1e-6


def test_edge_aware_tv_flat_depth():
    depth = jnp.ones((1, 8, 8))
    rgb = jnp.zeros((1, 8, 8, 3))
    mask = jnp.ones((1, 8, 8), bool)
    assert float(edge_aware_depth_tv(depth, rgb, mask)) == 0.0


def test_masked_depth_l1():
    r = jnp.array([[[2.0, 3.0]]])
    g = jnp.array([[[1.0, 0.0]]])  # second pixel invalid (gt=0)
    assert float(masked_depth_l1(r, g)) == 1.0


def test_apply_exposure():
    rgb = jnp.full((4, 4, 3), 0.5)
    out = apply_exposure(rgb, jnp.array([jnp.log(2.0), 0.1]))
    np.testing.assert_allclose(np.asarray(out), 1.1, atol=1e-6)
    # batched over cameras
    rgbs = jnp.full((2, 4, 4, 3), 0.5)
    exp = jnp.array([[0.0, 0.0], [jnp.log(2.0), 0.0]])
    out = apply_exposure(rgbs, exp)
    np.testing.assert_allclose(np.asarray(out[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 1.0, atol=1e-6)


def test_knn(rng):
    pts = jnp.asarray(rng.random((50, 3)).astype(np.float32))
    d = np.asarray(knn_distances(pts, 4))
    from sklearn.neighbors import NearestNeighbors

    ref, _ = NearestNeighbors(n_neighbors=4).fit(np.asarray(pts)).kneighbors(
        np.asarray(pts)
    )
    np.testing.assert_allclose(d, ref, atol=2e-3)
    s = np.asarray(mean_knn_scale(pts, 4))
    np.testing.assert_allclose(s, ref[:, 1:].mean(-1), atol=2e-3)


def test_warmup_lbfgs_quadratic():
    from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs

    A = jnp.diag(jnp.array([1.0, 10.0, 100.0]))
    b = jnp.array([1.0, -2.0, 3.0])
    x, f, ne = warmup_lbfgs(
        lambda x: 0.5 * x @ A @ x - b @ x, jnp.zeros(3),
        warmup_steps=0, max_iter=50, max_eval=100,
    )
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(A), np.asarray(b)), atol=1e-3
    )


def test_warmup_lbfgs_rosenbrock():
    from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs

    x, f, ne = warmup_lbfgs(
        lambda x: (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2,
        jnp.array([-1.2, 1.0]), warmup_steps=0, max_iter=100, max_eval=400,
    )
    assert float(f) < 1e-6, (float(f), np.asarray(x))


def test_warmup_lbfgs_matches_torch(rng):
    import torch
    from gslam_tpu.opt.lbfgs_compact import warmup_lbfgs

    W = rng.normal(size=(32, 9)).astype(np.float32)
    y = rng.normal(size=32).astype(np.float32)
    x, f, ne = warmup_lbfgs(
        lambda x: jnp.sum((jnp.tanh(jnp.asarray(W) @ x) - jnp.asarray(y)) ** 2),
        jnp.zeros(9), warmup_steps=0, max_iter=20, max_eval=25, history=5,
        lr=1.0,
    )
    xt = torch.zeros(9, requires_grad=True)
    opt = torch.optim.LBFGS([xt], history_size=5, line_search_fn="strong_wolfe",
                            max_iter=20)

    def closure():
        opt.zero_grad()
        loss = ((torch.tanh(torch.tensor(W) @ xt) - torch.tensor(y)) ** 2).sum()
        loss.backward()
        return loss

    opt.step(closure)
    with torch.no_grad():
        f_torch = float(
            ((torch.tanh(torch.tensor(W) @ xt) - torch.tensor(y)) ** 2).sum()
        )
    assert float(f) <= f_torch * 1.10 + 1e-4, (float(f), f_torch)
