import numpy as np
import jax
import jax.numpy as jnp

from gslam_tpu.eval.trajectory import (
    kabsch_umeyama, ate_rmse, align_trajectory, trajectory_positions,
)
from gslam_tpu.eval.metrics import psnr
from gslam_tpu.eval.spline import (
    init_spline, seed_from_poses, spline_pose, spline_velocity,
    spline_acceleration, fit_spline,
)
from gslam_tpu.core.transforms import so3_exp


def test_kabsch_recovers_similarity(rng):
    a = rng.random((40, 3))
    R_true = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    c_true, t_true = 1.7, np.array([0.4, -1.0, 2.0])
    # a = t + c R b  =>  b = R^T (a - t)/c
    b = (R_true.T @ ((a - t_true) / c_true).T).T
    R, c, t = kabsch_umeyama(a, b)
    np.testing.assert_allclose(R, R_true, atol=1e-5)
    assert abs(c - c_true) < 1e-5
    np.testing.assert_allclose(t, t_true, atol=1e-5)
    assert ate_rmse(a, b) < 1e-6


def test_align_trajectory_reduces_error(rng):
    gt = np.cumsum(rng.normal(size=(30, 3)) * 0.1, axis=0)
    est = gt * 2.0 + np.array([5, 5, 5])  # scaled + shifted
    aligned = align_trajectory(gt, est)
    assert np.linalg.norm(aligned - gt) < 1e-4


def test_trajectory_positions():
    w2c = np.eye(4)[None].repeat(2, 0).astype(np.float64)
    w2c[1, :3, 3] = [1.0, 0, 0]  # t = -R c -> c = -t for R=I
    pos = trajectory_positions(w2c)
    np.testing.assert_allclose(pos[1], [-1, 0, 0], atol=1e-8)


def test_psnr():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6


def test_spline_interpolates_line():
    sp = init_spline(32, interval=0.5, start_time=0.0)
    times = jnp.arange(20, dtype=jnp.float32) * 0.5
    pos = jnp.stack([times, 2 * times, jnp.zeros_like(times)], -1)
    rot = jnp.tile(jnp.eye(3)[None], (20, 1, 1))
    sp = seed_from_poses(sp, times, rot, pos)
    q_t = jnp.array([3.0, 5.25, 7.4])
    R, p = spline_pose(sp, q_t)
    # straight line: spline reproduces it exactly in the interior
    np.testing.assert_allclose(np.asarray(p[:, 0]), np.asarray(q_t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p[:, 1]), 2 * np.asarray(q_t), atol=2e-3)
    v = spline_velocity(sp, q_t)
    np.testing.assert_allclose(np.asarray(v), np.tile([1.0, 2.0, 0.0], (3, 1)),
                               atol=1e-3)
    a = spline_acceleration(sp, q_t)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-2)


def test_spline_rotation_continuity():
    sp = init_spline(16, interval=1.0, start_time=0.0)
    times = jnp.arange(10, dtype=jnp.float32)
    w = jnp.stack([0.1 * times, jnp.zeros_like(times), jnp.zeros_like(times)], -1)
    rot = so3_exp(w)
    pos = jnp.zeros((10, 3))
    sp = seed_from_poses(sp, times, rot, pos)
    R, _ = spline_pose(sp, jnp.array([4.0, 4.5, 5.0]))
    Rn = np.asarray(R)
    # orthonormality preserved
    for i in range(3):
        np.testing.assert_allclose(Rn[i] @ Rn[i].T, np.eye(3), atol=1e-5)


def test_fit_spline_to_noisy_poses(rng):
    sp = init_spline(24, interval=0.5, start_time=0.0)
    times = jnp.asarray(np.linspace(0, 8, 40, dtype=np.float32))
    pos_gt = jnp.stack(
        [jnp.sin(times), jnp.cos(times), 0.2 * times], -1
    )
    rot_gt = jnp.tile(jnp.eye(3)[None], (40, 1, 1))
    sp = seed_from_poses(sp, times, rot_gt, pos_gt)
    noisy = pos_gt + jnp.asarray(rng.normal(scale=0.05, size=(40, 3)).astype(np.float32))
    sp2, losses = fit_spline(sp, times, rot_gt, noisy, n_steps=100)
    assert float(losses[-1]) < float(losses[0])
    _, p = spline_pose(sp2, times[5:-5])
    err = np.linalg.norm(np.asarray(p) - np.asarray(pos_gt[5:-5]), axis=-1)
    assert err.mean() < 0.1


def test_warp_track_recovers_translation(rng):
    """Warp tracking: recover a small known pose offset between two renders."""
    from gslam_tpu.tracking.warp import warp_track, warp_image, bilinear_sample
    from gslam_tpu.tracking.track import TrackingConfig
    from gslam_tpu.ops.rasterize import RenderConfig, render
    import scene_utils

    params, viewmats, Ks, w, h = scene_utils.make_scene(rng, n=150, width=64,
                                                        height=48)
    cfg = RenderConfig(tile_capacity=128, tile_chunk=4)
    ref = render(**params, viewmats=viewmats, Ks=Ks, width=w, height=h, cfg=cfg)

    from gslam_tpu.core.transforms import se3_exp

    xi = jnp.array([0.01, -0.008, 0.0, 0.0, 0.0, 0.004])
    new_pose_gt = se3_exp(xi) @ viewmats[0]
    new = render(**params, viewmats=new_pose_gt[None], Ks=Ks, width=w, height=h,
                 cfg=cfg)

    tcfg = TrackingConfig(
        lbfgs_max_iter=30, lbfgs_max_eval=80, learn_exposure=False,
    )
    pose, _, loss = warp_track(
        viewmats[0], viewmats[0], ref.rgb[0], ref.depth[0], new.rgb[0],
        Ks[0], jnp.zeros(2), tcfg, ref_alpha=ref.alpha[0],
    )
    err0 = float(jnp.linalg.norm(viewmats[0][:3, 3] - new_pose_gt[:3, 3]))
    err1 = float(jnp.linalg.norm(pose[:3, 3] - new_pose_gt[:3, 3]))
    # warp with rendered (approximate) depth: expect meaningful, not
    # exact, convergence
    assert err1 < 0.7 * err0, (err0, err1)


def test_native_crc8():
    from gslam_tpu.io.native import crc8

    assert crc8(b"123456789") == 0xF4
    assert crc8(b"") == 0x00


def test_teleop_packet():
    import struct
    from teleop import make_packet, START_BYTE, CommandSmoother

    pkt = make_packet(0.2, -0.5)
    assert len(pkt) == 10
    assert pkt[0] == START_BYTE
    v, w = struct.unpack("<ff", pkt[1:9])
    assert abs(v - 0.2) < 1e-6 and abs(w + 0.5) < 1e-6
    from gslam_tpu.io.native import crc8

    assert pkt[9] == crc8(pkt[:9])

    sm = CommandSmoother(alpha=0.5)
    v1, _ = sm.update(1.0, 0.0)
    v2, _ = sm.update(1.0, 0.0)
    assert 0 < v1 < v2 < 1.0


def test_false_colormap():
    from gslam_tpu.viz.visualization import false_colormap

    img = np.linspace(0, 1, 64).reshape(8, 8)
    out = false_colormap(img)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8

    masked = false_colormap(img, mask=img > 0.5)
    assert (masked[img <= 0.5] == 0).all()


def test_compact_and_grow_preserve_render(rng):
    """compact_map permutes live splats to a dense prefix and grow_map
    doubles capacity; both must leave the rendered image unchanged
    (the rasterizer is slot-order agnostic: depth-sorted blending)."""
    import jax.numpy as jnp

    from gslam_tpu.mapping.gaussians import compact_map, empty_map, grow_map
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.ops.rasterize import RenderConfig, render

    cap, W, H = 128, 48, 32
    alive = np.zeros(cap, bool)
    alive[rng.choice(cap, 70, replace=False)] = True  # fragmented slots
    z = rng.uniform(1.0, 3.0, cap).astype(np.float32)
    gmap = empty_map(cap)._replace(
        means=jnp.asarray(
            np.stack([rng.normal(0, 0.5, cap), rng.normal(0, 0.4, cap), z],
                     -1).astype(np.float32)),
        log_scales=jnp.full((cap, 3), np.log(0.08), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(0.5, 0.3, cap).astype(np.float32)),
        logit_colors=jnp.asarray(rng.normal(0, 1, (cap, 3)).astype(np.float32)),
        alive=jnp.asarray(alive),
    )
    opt = init_adam(gmap)
    K = jnp.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], jnp.float32)
    rcfg = RenderConfig(tile_capacity=96, tile_chunk=6)

    def img(g):
        out = render(**g.render_kwargs(), viewmats=jnp.eye(4)[None],
                     Ks=K[None], width=W, height=H, cfg=rcfg)
        return np.asarray(out.rgb[0])

    base = img(gmap)

    g2, opt2 = compact_map(gmap, opt)
    assert int(g2.n_live()) == 70
    # dense prefix: all live slots first
    a2 = np.asarray(g2.alive)
    assert a2[:70].all() and not a2[70:].any()
    np.testing.assert_allclose(img(g2), base, atol=1e-5)

    g3, opt3 = grow_map(gmap, opt, cap * 2)
    assert g3.capacity == cap * 2
    assert int(g3.n_live()) == 70
    np.testing.assert_allclose(img(g3), base, atol=1e-5)
    for f in opt3.mu:
        assert opt3.mu[f].shape[0] == cap * 2


def test_train_util_throttle():
    from gslam_tpu.viz.viewer import TrainUtilThrottle

    th = TrainUtilThrottle(train_util=0.9, max_img_res=2048, warmup_steps=5)
    th.num_train_rays_per_sec = 1e6
    th.num_view_rays_per_sec = 1e5

    # reference formula (viewer.py:213-219): train_time = n/train_s,
    # view_time = res^2/view_s, every = u*view_time/(train_time*(1-u))
    n = 4096
    expect = 0.9 * (2048**2 / 1e5) / ((n / 1e6) * 0.1)
    assert abs(th.update_every(n) - expect) / expect < 1e-9

    # warm-up suppresses refreshes; afterwards the cadence honors the
    # computed interval (here huge, so only the crossing step refreshes)
    assert not th.should_refresh(3, n)
    th2 = TrainUtilThrottle(train_util=0.5, max_img_res=64, warmup_steps=0)
    th2.num_train_rays_per_sec = 1e6
    th2.num_view_rays_per_sec = 1e6
    every = th2.update_every(n)  # 0.5*(4096/1e6)/((4096/1e6)*0.5) = 1.0
    assert abs(every - 1.0) < 1e-9
    assert th2.should_refresh(2, n)
    assert not th2.should_refresh(3, n)  # 3 > 2 + 1.0 is False
    assert th2.should_refresh(4, n)

    # train_util=1 disables viewer refreshes entirely
    th3 = TrainUtilThrottle(train_util=1.0, warmup_steps=0)
    th3.num_train_rays_per_sec = 1e6
    assert not th3.should_refresh(100, n)

    # camera movement stalls training for move_grace seconds
    th.note_move(1000.0)
    assert th.train_stalled(1000.05)
    assert not th.train_stalled(1000.2)


def test_serve_viewer_with_stub_server(rng):
    """Drive the FULL viewer serve path (reference viewer.py:59-244) with a
    stub viser server: GUI wiring, client-connect render thread, all three
    render targets, and the pause / target-switch / train-util callbacks —
    no SDK required."""
    import time

    from tests.scene_utils import make_scene
    from gslam_tpu.mapping.gaussians import GaussianMap
    from gslam_tpu.mapping.backend_ops import MapConfig
    from gslam_tpu.ops.rasterize import RenderConfig
    from gslam_tpu.viz.viewer import (
        camera_to_w2c_K, render_viewer_target, serve_viewer,
    )

    params, _, _, _, _ = make_scene(rng, n=200)
    gmap = GaussianMap(ages=jnp.zeros(200, jnp.int32), **params)
    cfg = MapConfig(render=RenderConfig(
        tile_capacity=64, tile_chunk=8, pairs_per_gaussian=8))

    class Handle:
        def __init__(self, value=None):
            self.value = value
            self._cbs = []

        def on_click(self, fn):
            self._cbs.append(fn)
            return fn

        on_update = on_click

        def fire(self):
            for fn in self._cbs:
                fn(self)

    class Gui:
        def __init__(self):
            self.handles = {}

        def add_folder(self, name):
            import contextlib

            return contextlib.nullcontext()

        def add_button(self, name):
            h = Handle()
            self.handles[name] = h
            return h

        def add_dropdown(self, name, options, initial_value):
            h = Handle(initial_value)
            self.handles[name] = h
            return h

        def add_slider(self, name, min, max, step, initial_value):
            h = Handle(initial_value)
            self.handles[name] = h
            return h

    class StubServer:
        def __init__(self):
            self.gui = Gui()
            self.connect_cb = None

        def on_client_connect(self, fn):
            self.connect_cb = fn
            return fn

    class Scene:
        def __init__(self):
            self.images = []

        def set_background_image(self, img, format=None):
            self.images.append(np.asarray(img))

    class Camera:
        wxyz = np.array([1.0, 0, 0, 0], np.float32)
        position = np.array([0.0, 0.0, -2.0], np.float32)
        fov = 1.0

        def on_update(self, fn):
            return fn

    class Client:
        camera = Camera()

        def __init__(self):
            self.scene = Scene()

    server = StubServer()
    state = serve_viewer(gmap, width=64, height=48, map_config=cfg,
                         server=server, block=False)
    assert server.connect_cb is not None

    # GUI callbacks mutate the viewer state
    server.gui.handles["pause/resume"].fire()
    assert state.paused
    server.gui.handles["pause/resume"].fire()
    assert not state.paused
    server.gui.handles["target"].value = "depth"
    server.gui.handles["target"].fire()
    assert state.target_type == "depth"
    server.gui.handles["train util"].value = 0.5
    server.gui.handles["train util"].fire()
    assert state.throttle.train_util == 0.5

    # a client connects: the render thread must push frames
    client = Client()
    server.connect_cb(client)
    deadline = time.time() + 60.0
    while not client.scene.images and time.time() < deadline:
        time.sleep(0.05)
    state.stop = True
    assert client.scene.images, "serve loop produced no frames"
    img = client.scene.images[0]
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8

    # every render target produces a valid image through the same path
    w2c, K = camera_to_w2c_K(Camera.wxyz, Camera.position, Camera.fov, 64, 48)
    for target in ("rgb", "depth", "n_touched"):
        im = render_viewer_target(gmap, target, w2c, K, 64, 48, cfg)
        assert im.shape == (48, 64, 3) and im.dtype == np.uint8


def test_tracking_guard_rejects_nonfinite(rng):
    """track_frame with a non-finite image must return the prior pose with
    rejected=True instead of a NaN pose (tracking/track.py guard)."""
    from tests.scene_utils import make_scene
    from gslam_tpu.mapping.gaussians import GaussianMap
    from gslam_tpu.ops.rasterize import RenderConfig
    from gslam_tpu.tracking.track import TrackingConfig, track_frame

    params, viewmat, Ks, width, height = make_scene(rng, n=200)
    gmap = GaussianMap(ages=jnp.zeros(200, jnp.int32), **params)
    tcfg = TrackingConfig(
        warmup_steps=3, lbfgs_max_iter=6, lbfgs_max_eval=8,
        render=RenderConfig(tile_capacity=64, tile_chunk=8,
                            pairs_per_gaussian=8))
    bad = jnp.full((height, width, 3), jnp.nan)
    res = track_frame(gmap, viewmat[0], jnp.zeros(2), bad, Ks[0],
                      width, height, tcfg)
    assert bool(res.rejected)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(viewmat[0]))
    assert np.isfinite(float(res.loss))
