import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.mapping.gaussians import (
    GaussianMap, empty_map, masked_median, compact_free_slots,
)
from gslam_tpu.mapping.optimizer import (
    init_adam, adam_step, zero_state_at, DEFAULT_LRS,
)
from gslam_tpu.mapping.insertion import (
    InsertionConfig, insert_from_depthmap, densify_by_gradients,
)
from gslam_tpu.mapping import pruning


def test_empty_map():
    m = empty_map(64)
    assert m.capacity == 64
    assert int(m.n_live()) == 0


def test_masked_median():
    v = jnp.array([5.0, 1.0, 3.0, 100.0])
    mask = jnp.array([True, True, True, False])
    assert float(masked_median(v, mask)) == 3.0
    v2 = jnp.array([[1.0, 10.0], [2.0, 20.0], [3.0, 30.0], [9e9, 9e9]])
    m2 = jnp.array([True, True, True, False])
    np.testing.assert_allclose(np.asarray(masked_median(v2, m2)), [2.0, 20.0])


def test_compact_free_slots():
    alive = jnp.array([True, False, True, False, False])
    slots = np.asarray(compact_free_slots(alive, 4))
    np.testing.assert_array_equal(slots, [1, 3, 4, 5])  # 5 = capacity sentinel


def test_adam_matches_torch_semantics():
    import torch

    m = empty_map(8)
    m = m._replace(
        means=jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)),
        alive=jnp.ones(8, bool),
    )
    state = init_adam(m)
    g = {f: jnp.ones_like(v) * 0.1 for f, v in m.trainable().items()}

    t_param = torch.nn.Parameter(torch.tensor(np.asarray(m.means)))
    t_opt = torch.optim.Adam([t_param], lr=DEFAULT_LRS["means"])
    for _ in range(3):
        m, state = adam_step(m, g, state)
        t_opt.zero_grad()
        t_param.grad = torch.full_like(t_param, 0.1)
        t_opt.step()
    np.testing.assert_allclose(
        np.asarray(m.means), t_param.detach().numpy(), atol=1e-6
    )


def test_adam_only_updates_alive():
    m = empty_map(4)._replace(alive=jnp.array([True, False, True, False]))
    state = init_adam(m)
    g = {f: jnp.ones_like(v) for f, v in m.trainable().items()}
    m2, _ = adam_step(m, g, state)
    np.testing.assert_array_equal(
        np.asarray(m2.means[1]), np.asarray(m.means[1])
    )
    assert not np.allclose(np.asarray(m2.means[0]), np.asarray(m.means[0]))


def test_zero_state_at():
    m = empty_map(4)._replace(alive=jnp.ones(4, bool))
    state = init_adam(m)
    g = {f: jnp.ones_like(v) for f, v in m.trainable().items()}
    _, state = adam_step(m, g, state)
    state = zero_state_at(state, jnp.array([1, 4]))  # 4 out of range -> dropped
    assert np.asarray(state.mu["means"][1]).max() == 0.0
    assert np.asarray(state.mu["means"][0]).max() != 0.0


def test_insert_from_depthmap_basic():
    H, W = 24, 32
    key = jax.random.PRNGKey(0)
    m = empty_map(256)
    state = init_adam(m)
    K = jnp.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    depth = jnp.ones((H, W))
    alpha = jnp.zeros((H, W))  # nothing rendered yet -> all invalid region
    img = jnp.full((H, W, 3), 0.5)
    res = insert_from_depthmap(
        key, m, state, depth, alpha, img, K, jnp.eye(4), n_new=100, frame_index=7,
    )
    assert int(res.n_inserted) == 100
    assert int(res.gmap.n_live()) == 100
    live = np.asarray(res.gmap.alive)
    ages = np.asarray(res.gmap.ages)[live]
    np.testing.assert_array_equal(ages, 7)
    # depths were median(1.0) + noise*0.2 -> means z around 1
    zs = np.asarray(res.gmap.means)[live][:, 2]
    assert 0.4 < zs.mean() < 1.6
    # colors should be logit(0.5) = 0
    np.testing.assert_allclose(np.asarray(res.gmap.logit_colors)[live], 0.0, atol=1e-5)


def test_insert_respects_capacity():
    H, W = 8, 8
    m = empty_map(16)._replace(alive=jnp.ones(16, bool).at[:4].set(False))
    state = init_adam(m)
    K = jnp.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]])
    res = insert_from_depthmap(
        jax.random.PRNGKey(1), m, state, jnp.ones((H, W)), jnp.zeros((H, W)),
        jnp.full((H, W, 3), 0.5), K, jnp.eye(4), n_new=10, frame_index=0,
    )
    assert int(res.n_inserted) == 4  # only 4 free slots


def test_insert_occlusion_filter():
    """Candidates landing in front of existing keyframe depth are dropped."""
    H, W = 16, 16
    m = empty_map(256)
    # one live splat so the median-scale path is used
    m = m._replace(alive=m.alive.at[0].set(True),
                   log_scales=m.log_scales.at[0].set(jnp.log(0.1)))
    state = init_adam(m)
    K = jnp.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
    depth = jnp.full((H, W), 5.0)  # candidates appear at z~5 (+noise)
    alpha = jnp.ones((H, W))  # all "valid depth" -> depths kept near 5
    img = jnp.full((H, W, 3), 0.5)

    # keyframe that already saw geometry at depth 1.0 -> z~5 is behind: kept
    kf_vm = jnp.eye(4)[None]
    kf_depth_near = jnp.full((1, H, W), 1.0)
    kf_depth_far = jnp.full((1, H, W), 100.0)
    kf_mask = jnp.array([True])

    common = dict(
        gmap=m, opt_state=state, depthmap=depth, alphas=alpha, image=img,
        K=K, viewmat=jnp.eye(4), n_new=32, frame_index=0,
        kf_viewmats=kf_vm, kf_mask=kf_mask,
    )
    # NOTE: valid-region pixels aren't picked (backend inserts only in
    # low-alpha regions), so use alpha=0 to route picks through, with the
    # median fill at 5.
    common["alphas"] = jnp.zeros((H, W))
    res_behind = insert_from_depthmap(
        jax.random.PRNGKey(2), kf_est_depths=kf_depth_near, **common
    )
    res_front = insert_from_depthmap(
        jax.random.PRNGKey(2), kf_est_depths=kf_depth_far, **common
    )
    assert int(res_behind.n_inserted) == 32  # behind existing depth: kept
    assert int(res_front.n_inserted) == 0  # in front of existing depth: dropped


def test_densify_by_gradients():
    cap = 32
    m = empty_map(cap)
    m = m._replace(
        alive=m.alive.at[:4].set(True),
        means=m.means.at[:4].set(jnp.arange(12, dtype=jnp.float32).reshape(4, 3)),
        log_scales=m.log_scales.at[:4].set(
            jnp.log(jnp.array([[0.001] * 3, [0.5] * 3, [0.001] * 3, [0.5] * 3]))
        ),
    )
    state = init_adam(m)
    grad = jnp.zeros((1, cap, 2))
    grad = grad.at[0, 0].set(jnp.array([1.0, 1.0]))  # small + high grad -> duplicate
    grad = grad.at[0, 1].set(jnp.array([1.0, 1.0]))  # large + high grad -> split
    res = densify_by_gradients(
        jax.random.PRNGKey(0), m, state, grad, 64, 48, max_new=8, frame_index=3
    )
    assert int(res.n_inserted) == 2
    assert int(res.gmap.n_live()) == 6
    live_new = np.asarray(res.gmap.alive) & (np.asarray(res.gmap.ages) == 3)
    new_scales = np.exp(np.asarray(res.gmap.log_scales)[live_new])
    # the duplicate keeps 0.001; the split gets 0.5/1.6
    assert np.isclose(sorted(new_scales[:, 0])[0], 0.001, rtol=1e-3)
    assert np.isclose(sorted(new_scales[:, 0])[1], 0.5 / 1.6, rtol=1e-3)


def test_pruning_masks():
    m = empty_map(6)._replace(
        alive=jnp.ones(6, bool),
        logit_opacities=jnp.array([-3.0, 3.0, 3.0, 3.0, 3.0, 3.0]),
    )
    low = pruning.low_opacity_mask(m)
    np.testing.assert_array_equal(np.asarray(low), [True] + [False] * 5)

    radii = jnp.array([[10.0, 300.0, 0.0, 5.0, 5.0, 5.0]])
    big = pruning.large_radius_mask(jnp.max(radii, axis=0))
    np.testing.assert_array_equal(np.asarray(big), [False, True] + [False] * 4)

    r = jnp.tile(jnp.array([[1.0, 0.0, 1.0, 1.0, 1.0, 1.0]]), (5, 1))
    nt = jnp.tile(jnp.array([[0, 0, 5, 0, 5, 5]]), (5, 1))
    ill = pruning.ill_conditioned_mask(r, nt, max_views=3)
    np.testing.assert_array_equal(
        np.asarray(ill), [True, False, False, True, False, False]
    )

    m2 = pruning.apply_prune(m, low)
    assert int(m2.n_live()) == 5


def test_opacity_decay():
    m = empty_map(3)._replace(
        alive=jnp.ones(3, bool),
        logit_opacities=jnp.array([2.0, -2.0, 2.0]),
    )
    radii = jnp.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 1.0]])
    m2 = pruning.opacity_decay(m, radii, decay=0.5)
    np.testing.assert_allclose(np.asarray(m2.logit_opacities), [1.0, -1.0, 2.0])
