#!/usr/bin/env python3
"""Headline benchmark. Prints ONE JSON line.

The headline `value` is the DEVICE-BOUND tracking FPS — the marginal rate
of two different-length `lax.scan` full-track programs (the axon
transport's flat per-dispatch cost cancels in the difference; docs/PERF.md
rule 1 says anything measured before the first readback is an
enqueue/elide rate, not device execution). The async enqueue FPS is kept
as detail only.

Three sections, each in a FRESH subprocess so the axon transport's
first-readback mode flip (docs/PERF.md) cannot poison another section's
numbers:

  tracking   — per-frame camera tracking against a frozen 50k-splat map at
               320x240 (BASELINE config 1, vs the 30 FPS north star):
               device-bound FPS at BOTH the full tracking budget and a
               converged-frame eval budget, plus enqueue/sync rates.
  mapping    — the reference mapping op point (10-camera window, 131k cap,
               100k live; /root/reference/gslam/backend.py:71-76), measured
               BEFORE any readback in its process, plus the same scan
               marginal-rate device measurement.
  onemillion — render + mapping-iter + compaction at 2^20 capacity
               (BASELINE config 3 scale evidence).

Budget discipline (VERDICT r4 missing #3 / weak #6): the whole run fits a
hard wall-clock budget (BENCH_BUDGET_S, default 1140 s) — a short device
wait, per-section budgets clipped to the time remaining, a SIGTERM/SIGALRM
handler that flushes the best-effort summary line, and the running summary
persisted to runs/bench/latest.json after every section. If the device
never answers, the newest valid committed artifact is re-emitted with
`"stale": true` instead of losing the round's evidence.

Each section prints progressive `{"part": ...}` JSON lines so a fault in a
later measurement cannot lose earlier results; the orchestrator merges
whatever arrived into the final line.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = "/root/repo"
TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1140"))
T_START = time.time()


def _remaining() -> float:
    return TOTAL_BUDGET_S - (time.time() - T_START)


def _jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", f"{REPO}/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _emit(part: str, payload: dict):
    print(json.dumps({"part": part, **payload}), flush=True)


def _make_map(cap, n_live, W, H, fx, rng, scale_lo=0.004, scale_hi=0.016,
              z_hi=4.5, opacity=1.5):
    import jax.numpy as jnp

    from gslam_tpu.mapping.gaussians import empty_map

    z = rng.uniform(1.2, z_hi, cap).astype(np.float32)
    u = rng.uniform(0, W, cap).astype(np.float32)
    v = rng.uniform(0, H, cap).astype(np.float32)
    means = np.stack([(u - W / 2) * z / fx, (v - H / 2) * z / fx, z], -1)
    alive = np.zeros(cap, bool)
    alive[:n_live] = True
    return empty_map(cap)._replace(
        means=jnp.asarray(means),
        quats=jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(rng.uniform(scale_lo, scale_hi, (cap, 3)) * z[:, None])
            .astype(np.float32)),
        logit_opacities=jnp.full((cap,), opacity),
        logit_colors=jnp.asarray(
            rng.normal(size=(cap, 3)).astype(np.float32) * 1.5),
        log_uncertainties=jnp.zeros((cap,)),
        alive=jnp.asarray(alive),
    )


# ---------------------------------------------------------------- tracking


def section_tracking():
    jax = _jax()
    import jax.numpy as jnp

    from gslam_tpu.core.transforms import se3_exp
    from gslam_tpu.ops.rasterize import RenderConfig, render
    from gslam_tpu.tracking.track import TrackingConfig, track_frame

    W, H = 320, 240
    N = 50_000
    rng = np.random.default_rng(0)
    fx = 280.0
    K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], jnp.float32)
    gmap = _make_map(N, N, W, H, fx, rng)
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    tcfg = TrackingConfig(render=rcfg)

    # ground-truth frames along a gentle trajectory
    n_frames = 10
    xis = rng.normal(scale=0.004, size=(n_frames, 6)).astype(np.float32)
    poses, cur = [], jnp.eye(4)
    for i in range(n_frames):
        cur = se3_exp(jnp.asarray(xis[i])) @ cur
        poses.append(cur)
    poses = jnp.stack(poses)
    out = render(
        **gmap.render_kwargs(), viewmats=poses,
        Ks=jnp.tile(K[None], (n_frames, 1, 1)), width=W, height=H, cfg=rcfg,
    )
    gt_imgs = jnp.clip(out.rgb, 0.0, 1.0)
    jax.block_until_ready(gt_imgs)

    res = track_frame(gmap, jnp.eye(4), jnp.zeros(2), gt_imgs[0], K, W, H, tcfg)
    jax.block_until_ready(res.pose)

    # (a) async pipelined loop — enqueue/elide rate, the streaming op mode
    t0 = time.time()
    prev_pose, exposure = jnp.eye(4), jnp.zeros(2)
    for i in range(n_frames):
        res = track_frame(gmap, prev_pose, exposure, gt_imgs[i], K, W, H, tcfg)
        prev_pose, exposure = res.pose, res.exposure
    jax.block_until_ready(prev_pose)
    dt = time.time() - t0
    fps_enqueue = n_frames / dt

    # (b) sync per-frame latency (block after every frame)
    t0 = time.time()
    prev_s, exp_s = jnp.eye(4), jnp.zeros(2)
    for i in range(n_frames):
        r = track_frame(gmap, prev_s, exp_s, gt_imgs[i], K, W, H, tcfg)
        prev_s, exp_s = r.pose, r.exposure
        jax.block_until_ready(prev_s)
    dt_sync = time.time() - t0

    # correctness readback — AFTER the timed regions; flips the transport
    pose_err = float(jnp.linalg.norm(prev_pose[:3, 3] - poses[-1][:3, 3]))
    _emit("tracking", {
        "fps_enqueue": round(fps_enqueue, 3),
        "mean_track_ms": round(1e3 * dt / n_frames, 2),
        "sync_track_ms": round(1e3 * dt_sync / n_frames, 2),
        "sync_fps": round(n_frames / dt_sync, 2),
        "n_evals_last_frame": int(res.n_evals),
        "final_pose_err_m": round(pose_err, 5),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    })

    # (c) device-throughput lower bound: marginal rate between two scan
    # lengths; the flat per-dispatch transport cost cancels. One scanned
    # step = full track_frame (prior -> warm-up Adam -> L-BFGS).
    from functools import partial

    from gslam_tpu.tracking.track import track_frame_impl

    # NB every device array is an ARGUMENT (incl. gmap/K): a jit that
    # captures a committed buffer dispatches ~190 ms flat (PERF.md rule 1).
    def marginal_rate(cfg_used, part_name, n1, n2, track_impl=None):
        track_impl = track_impl or track_frame_impl

        @partial(jax.jit, static_argnames=("n",))
        def scan_cfg(g, pose0, exposure0, imgs, Karg, eps, n):
            def body(c, i):
                pose, expo = c
                r = track_impl(
                    g, pose, expo, imgs[i % n_frames] + eps, Karg, W, H,
                    cfg_used)
                return (r.pose, r.exposure), None

            (p, e), _ = jax.lax.scan(
                body, (pose0, exposure0), jnp.arange(n), length=n)
            return p, e

        p, _ = scan_cfg(gmap, jnp.eye(4), jnp.zeros(2), gt_imgs, K,
                        jnp.float32(0.0), n1)
        float(p[0, 0])  # compile + flip
        times = {}
        for k, n in ((1, n1), (2, n2)):
            t0 = time.time()
            p, _ = scan_cfg(gmap, jnp.eye(4), jnp.zeros(2), gt_imgs, K,
                            jnp.float32(k) * 1e-7, n)
            float(p[0, 0])
            times[k] = time.time() - t0
        step_ms = 1e3 * (times[2] - times[1]) / (n2 - n1)
        _emit(part_name, {
            "device_track_ms": round(step_ms, 3),
            "device_fps_lower_bound": round(1e3 / max(step_ms, 1e-6), 1),
            "max_evals": cfg_used.lbfgs_max_eval,
            "method": f"marginal rate of lax.scan({n1}) vs lax.scan({n2}) "
                      "full-track steps, one readback each; flat dispatch "
                      "cost cancels in the difference",
            "scan_s": {str(k): round(v, 2) for k, v in times.items()},
        })

    # full tracking budget (the accuracy-proven operating point) — this is
    # the HEADLINE measurement
    marginal_rate(tcfg, "tracking_device", 8, 32)
    # converged-frame budget: easy frames exit the in-jit loop early; this
    # bounds what a converged stream costs per frame on device
    import dataclasses

    tcfg36 = dataclasses.replace(tcfg, lbfgs_max_eval=36, lbfgs_max_iter=30)
    marginal_rate(tcfg36, "tracking_device_converged", 8, 32)

    # Gauss-Newton operating point (r5): pyramid(3) x 8 LM iters/level —
    # the accuracy-proven config (docs/TRACKING_STUDY.md r5 oracle table:
    # all frames sub-cm at est-prior chaining where L-BFGS basin-jumps).
    # When this part lands, it becomes the headline: same accuracy bar,
    # ~4x fewer evals, most of them at 1/16-cost coarse resolution.
    from gslam_tpu.tracking.track import track_frame_pyramid_impl

    try:
        gn_cfg = dataclasses.replace(
            tcfg, method="gn", gn_iters=8, pyramid_levels=3)
        marginal_rate(gn_cfg, "tracking_device_gn", 4, 12,
                      track_impl=track_frame_pyramid_impl)
    except Exception as e:  # keep earlier parts if the GN program faults
        _emit("tracking_device_gn", {"error": repr(e)[:200]})


# ---------------------------------------------------------------- mapping


def _mapping_op_point():
    import jax.numpy as jnp

    from gslam_tpu.mapping.backend_ops import MapConfig, init_pose_adam
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.ops.rasterize import RenderConfig

    W, H = 320, 240
    CAP, N_LIVE, KF_CAP, WINDOW = 131_072, 100_000, 32, 10
    rng = np.random.default_rng(0)
    fx = 280.0
    K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], jnp.float32)
    gmap = _make_map(CAP, N_LIVE, W, H, fx, rng)
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=50, pairs_per_gaussian=8)
    cfg = MapConfig(window_size=WINDOW, render=rcfg)
    kf = empty_keyframes(KF_CAP, H, W)
    for slot in range(12):
        img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
        pose = jnp.eye(4).at[0, 3].add(0.01 * slot)
        kf = add_keyframe(kf, slot, img, pose, jnp.zeros(2), slot)
    widx = jnp.asarray(np.arange(WINDOW) + 2, jnp.int32)
    wmask = jnp.ones(WINDOW, bool)
    return (gmap, init_adam(gmap), kf, init_pose_adam(KF_CAP), widx, wmask,
            K, W, H, cfg)


def section_mapping():
    jax = _jax()
    import jax.numpy as jnp

    from gslam_tpu.mapping.backend_ops import mapping_step

    (gmap, opt_state, kf, pose_opt, widx, wmask, K, W, H, cfg) = (
        _mapping_op_point())

    # Adaptive warm-up (committed-input recompile; docs/PERF.md 1b). No
    # readbacks anywhere in this region: the process stays in enqueue mode,
    # exactly like mid-run SLAM.
    st = [gmap, opt_state, kf, pose_opt]
    for _ in range(6):
        tw = time.time()
        g, o, k2, p, aux = mapping_step(
            st[0], st[1], st[2], st[3], widx, wmask, K, W, H, cfg)
        st = [g, o, k2, p]
        jax.block_until_ready(aux.total_loss)
        if time.time() - tw < 0.05:
            break
    t0 = time.time()
    iters = 30
    for _ in range(iters):
        g, o, k2, p, aux = mapping_step(
            st[0], st[1], st[2], st[3], widx, wmask, K, W, H, cfg)
        st = [g, o, k2, p]
    jax.block_until_ready(aux.total_loss)
    map_ms = (time.time() - t0) / iters * 1e3
    _emit("mapping", {
        "mapping_iter_ms": round(map_ms, 3),
        "mapping_passes_per_s": round(1.0 / (15 * map_ms / 1e3), 2),
        "op_point": "10-cam window, 131k cap (100k live), 320x240, "
                    "15 iters/pass, vs >=10 Hz target",
        "method": "fresh process, zero readbacks before/inside the timed "
                  "region (enqueue mode = the streaming SLAM op mode)",
    })

    # device marginal rate via two scan lengths (one dispatch each)
    from functools import partial

    from gslam_tpu.mapping.backend_ops import mapping_step as _ms

    step_impl = _ms.__wrapped__

    # NB device arrays (widx/wmask/K) are ARGUMENTS, not captures (PERF.md
    # rule 1: captured committed buffers poison the dispatch path).
    @partial(jax.jit, static_argnames=("n",))
    def scan_map(g, o, k2, p, wi, wm, Karg, eps, n):
        def body(c, _):
            g, o, k2, p = c
            k2 = k2._replace(images=k2.images + eps)
            g, o, k2, p, aux = step_impl(
                g, o, k2, p, wi, wm, Karg, W, H, cfg)
            return (g, o, k2, p), aux.total_loss

        c, losses = jax.lax.scan(body, (g, o, k2, p), None, length=n)
        return losses

    n1, n2 = 5, 20
    losses = scan_map(st[0], st[1], st[2], st[3], widx, wmask, K,
                      jnp.float32(0.0), n1)
    float(losses[0])  # compile + flip
    times = {}
    for k, n in ((1, n1), (2, n2)):
        t0 = time.time()
        losses = scan_map(st[0], st[1], st[2], st[3], widx, wmask, K,
                          jnp.float32(k) * 1e-7, n)
        float(losses[0])
        times[k] = time.time() - t0
    step_ms = 1e3 * (times[2] - times[1]) / (n2 - n1)
    _emit("mapping_device", {
        "device_mapping_iter_ms": round(step_ms, 3),
        "device_mapping_passes_per_s": round(1.0 / (15 * step_ms / 1e3), 2),
        "method": f"marginal rate of lax.scan({n1}) vs lax.scan({n2}) "
                  "mapping steps, one readback each",
        "scan_s": {str(k): round(v, 2) for k, v in times.items()},
    })


# -------------------------------------------------------------- onemillion


def section_onemillion():
    jax = _jax()
    import jax.numpy as jnp

    from gslam_tpu.mapping.backend_ops import (
        MapConfig, init_pose_adam, mapping_step,
    )
    from gslam_tpu.mapping.gaussians import compact_map
    from gslam_tpu.mapping.keyframes import add_keyframe, empty_keyframes
    from gslam_tpu.mapping.optimizer import init_adam
    from gslam_tpu.ops.rasterize import RenderConfig, render

    W, H = 640, 480
    CAP, N_LIVE, KF_CAP, WINDOW = 1 << 20, 1_000_000, 16, 10
    rng = np.random.default_rng(0)
    fx = 560.0
    K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], jnp.float32)
    gmap = _make_map(CAP, N_LIVE, W, H, fx, rng, scale_lo=0.002,
                     scale_hi=0.008, z_hi=6.0, opacity=0.5)
    rcfg = RenderConfig(tile_capacity=256, tile_chunk=60, pairs_per_gaussian=4)
    cfg = MapConfig(window_size=WINDOW, render=rcfg)
    kf = empty_keyframes(KF_CAP, H, W)
    for slot in range(12):
        img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
        pose = jnp.eye(4).at[0, 3].add(0.02 * slot)
        kf = add_keyframe(kf, slot, img, pose, jnp.zeros(2), slot)
    opt_state = init_adam(gmap)
    pose_opt = init_pose_adam(KF_CAP)
    widx = jnp.asarray(np.arange(WINDOW) + 2, jnp.int32)
    wmask = jnp.ones(WINDOW, bool)

    # single-view render at 1M live splats
    out = render(**gmap.render_kwargs(), viewmats=jnp.eye(4)[None],
                 Ks=K[None], width=W, height=H, cfg=rcfg)
    jax.block_until_ready(out.rgb)
    t0 = time.time()
    reps = 10
    for i in range(reps):
        out = render(
            **gmap.render_kwargs(),
            viewmats=jnp.eye(4).at[0, 3].add(i * 1e-6)[None], Ks=K[None],
            width=W, height=H, cfg=rcfg)
    jax.block_until_ready(out.rgb)
    render_ms = (time.time() - t0) / reps * 1e3

    # in-place live-slot compaction at 2^20 capacity
    g2, o2 = compact_map(gmap, opt_state)
    jax.block_until_ready(g2.alive)
    t0 = time.time()
    for _ in range(5):
        g2, o2 = compact_map(g2, o2)
    jax.block_until_ready(g2.alive)
    compact_ms = (time.time() - t0) / 5 * 1e3

    # mapping step at 1M (adaptive warm-up per docs/PERF.md 1b)
    st = [gmap, opt_state, kf, pose_opt]
    for _ in range(6):
        tw = time.time()
        g, o, k2, p, aux = mapping_step(
            st[0], st[1], st[2], st[3], widx, wmask, K, W, H, cfg)
        st = [g, o, k2, p]
        jax.block_until_ready(aux.total_loss)
        if time.time() - tw < 0.25:
            break
    t0 = time.time()
    iters = 15
    for _ in range(iters):
        g, o, k2, p, aux = mapping_step(
            st[0], st[1], st[2], st[3], widx, wmask, K, W, H, cfg)
        st = [g, o, k2, p]
    jax.block_until_ready(aux.total_loss)
    map_ms = (time.time() - t0) / iters * 1e3

    _emit("onemillion", {
        "capacity": CAP,
        "n_live": N_LIVE,
        "render_ms_640x480": round(render_ms, 2),
        "compact_ms": round(compact_ms, 2),
        "mapping_iter_ms": round(map_ms, 2),
        "mapping_passes_per_s": round(1.0 / (15 * map_ms / 1e3), 2),
    })

    # device marginal rates at the 1M op point (same methodology as the
    # other sections: two scan lengths, one readback each — flat dispatch
    # cost cancels, so these are honest even after the transport flip)
    from functools import partial

    from gslam_tpu.mapping.backend_ops import mapping_step as _ms

    step_impl = _ms.__wrapped__

    @partial(jax.jit, static_argnames=("n",))
    def scan_render(g, Karg, eps, n):
        def body(c, i):
            vm = jnp.eye(4).at[0, 3].add(eps + i * 1e-7)
            out = render(**g.render_kwargs(), viewmats=vm[None], Ks=Karg[None],
                         width=W, height=H, cfg=rcfg)
            return c, out.rgb[0, 0, 0]

        _, px = jax.lax.scan(body, 0.0, jnp.arange(n), length=n)
        return px

    @partial(jax.jit, static_argnames=("n",))
    def scan_map1m(g, o, k2, p, wi, wm, Karg, eps, n):
        def body(c, _):
            g, o, k2, p = c
            k2 = k2._replace(images=k2.images + eps)
            g, o, k2, p, aux = step_impl(g, o, k2, p, wi, wm, Karg, W, H, cfg)
            return (g, o, k2, p), aux.total_loss

        _, losses = jax.lax.scan(body, (g, o, k2, p), None, length=n)
        return losses

    try:
        px = scan_render(gmap, K, jnp.float32(0.0), 4)
        float(px[0])  # compile
        rtimes = {}
        for k, n in ((1, 4), (2, 12)):
            t0 = time.time()
            px = scan_render(gmap, K, jnp.float32(k) * 1e-7, n)
            float(px[0])
            rtimes[k] = time.time() - t0
        r_ms = 1e3 * (rtimes[2] - rtimes[1]) / 8
        losses = scan_map1m(st[0], st[1], st[2], st[3], widx, wmask, K,
                            jnp.float32(0.0), 3)
        float(losses[0])
        mtimes = {}
        for k, n in ((1, 3), (2, 9)):
            t0 = time.time()
            losses = scan_map1m(st[0], st[1], st[2], st[3], widx, wmask, K,
                                jnp.float32(k) * 1e-7, n)
            float(losses[0])
            mtimes[k] = time.time() - t0
        m_ms = 1e3 * (mtimes[2] - mtimes[1]) / 6
        _emit("onemillion_device", {
            "device_render_ms": round(r_ms, 2),
            "device_mapping_iter_ms": round(m_ms, 2),
            "device_mapping_passes_per_s": round(1.0 / (15 * m_ms / 1e3), 2),
            "method": "marginal rate of two scan lengths, one readback each",
        })
    except Exception as e:  # keep the enqueue numbers if the scans fault
        _emit("onemillion_device", {"error": repr(e)[:200]})


# ------------------------------------------------------------ orchestrator


def preflight():
    """Tiny matmul + readback in a subprocess with a hard timeout.

    The axon TPU worker wedges after kernel faults and can stay down for
    hours (docs/PERF.md rule 5); while it is down, every section
    subprocess hangs at its first device op and burns its whole budget.
    Probe once up front so a dead chip yields a fast, self-describing
    result instead of 30 minutes of silent timeouts."""
    code = ("import jax, jax.numpy as jnp; "
            "print(jax.devices()); "
            "print(float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=240, cwd=REPO,
        )
        # ones(8,8) @ ones(8,8) sums to 8*8*8 = 512.0. (A "64.0" check
        # left over from a pre-matmul probe classified every HEALTHY
        # probe as failed and burned whole recovery windows — r4 bug.)
        ok = proc.returncode == 0 and "512.0" in proc.stdout
        if not ok:
            # Keep the probe's own words: rc, last stderr lines. Without
            # this, a mis-configured client (bad env, import error) is
            # indistinguishable from a wedged worker in the retry log.
            tail = "\n".join((proc.stderr or "").strip().splitlines()[-4:])
            print(f"bench: probe rc={proc.returncode} stdout="
                  f"{proc.stdout.strip()[:120]!r} stderr_tail={tail[:400]!r}",
                  file=sys.stderr, flush=True)
        return ok
    except subprocess.TimeoutExpired:
        print("bench: probe timed out after 240s (worker wedged or "
              "platform init hang)", file=sys.stderr, flush=True)
        return False


def wait_for_device(budget_s: float = 240.0, poll_s: float = 60.0):
    """Poll preflight until the worker answers or the budget runs out.

    The wait is SHORT (4 min, not r4's 60 min): the driver that invokes
    bench.py has its own timeout, and r4 proved a long wait starves every
    section and loses the whole artifact (BENCH_r04.json = rc 124, nothing
    parsed — VERDICT r4 missing #3). If the device never answers inside
    the short window, main() falls back to the newest valid committed
    artifact instead of emitting nothing."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        if preflight():
            return True, attempt
        if time.time() - t0 >= budget_s or _remaining() < 300:
            return False, attempt
        print(f"bench: preflight attempt {attempt} failed; device down "
              f"{time.time() - t0:.0f}s, retrying in {poll_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(poll_s)


def _summarize(parts: dict) -> dict:
    """Build the headline line from whatever parts have arrived.

    The headline is the DEVICE-BOUND tracking FPS at the full (accuracy-
    proven) budget — the marginal-rate measurement PERF.md's transport
    model endorses as device execution (VERDICT r4 weak #1: the enqueue
    rate must never headline again)."""
    gn = parts.get("tracking_device_gn", {})
    td = parts.get("tracking_device", {})
    fps_gn = gn.get("device_fps_lower_bound", 0.0) or 0.0
    fps_lb = td.get("device_fps_lower_bound", 0.0) or 0.0
    if fps_gn:
        metric = ("device-bound tracking FPS (marginal-rate), frozen "
                  "50k-splat map @320x240, GN pyr3x8 operating point "
                  "(accuracy-proven, TRACKING_STUDY r5) (1 chip)")
        fps = fps_gn
    else:
        metric = ("device-bound tracking FPS (marginal-rate), frozen "
                  "50k-splat map @320x240, full eval budget (1 chip)")
        fps = fps_lb
    return {
        "metric": metric,
        "value": fps,
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4) if fps else 0.0,
        "detail": parts,
    }


def _flush_latest(parts: dict):
    try:
        os.makedirs(f"{REPO}/runs/bench", exist_ok=True)
        with open(f"{REPO}/runs/bench/latest.json", "w") as f:
            json.dump(_summarize(parts), f)
    except OSError:
        pass


def _fallback_artifact() -> dict | None:
    """Newest valid committed bench artifact, re-emitted as stale."""
    import glob

    best = None
    for path in sorted(glob.glob(f"{REPO}/runs/bench/bench_r*_chip*.json")):
        try:
            d = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        det = d.get("detail", {})
        fps = det.get("tracking_device", {}).get("device_fps_lower_bound")
        if isinstance(fps, (int, float)) and fps > 0:
            best = (path, det)
    if best is None:
        return None
    path, det = best
    out = _summarize(det)
    out["stale"] = True
    out["stale_source"] = os.path.relpath(path, REPO)
    return out


def run_sections(parts: dict):
    ok, attempts = wait_for_device()
    if not ok:
        parts["errors"] = [
            f"preflight: device unreachable after {attempts} probes "
            "(worker wedged or platform init hangs) — all sections "
            "skipped; see docs/PERF.md rule 5"
        ]
        return parts, False
    for section, budget in (("tracking", 480), ("mapping", 330),
                            ("onemillion", 330)):
        budget = min(budget, _remaining() - 20)
        if budget < 60:
            parts.setdefault("errors", []).append(
                f"{section}: skipped, {_remaining():.0f}s left of the "
                f"{TOTAL_BUDGET_S:.0f}s total budget")
            continue
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--section", section],
                capture_output=True, text=True, timeout=budget, cwd=REPO,
            )
            out = proc.stdout
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"")
            out = out.decode() if isinstance(out, bytes) else out
            parts.setdefault("errors", []).append(
                f"{section}: timeout after {budget:.0f}s")
        for line in out.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            name = d.pop("part", None)
            if name:
                parts[name] = d
        _flush_latest(parts)
    return parts, True


def main():
    if "--section" in sys.argv:
        section = sys.argv[sys.argv.index("--section") + 1]
        {"tracking": section_tracking,
         "mapping": section_mapping,
         "onemillion": section_onemillion}[section]()
        return

    # If an external timeout kills this process anyway, flush the current
    # best-effort summary line first so the caller still parses something.
    state = {"parts": {}}

    def _bail(signum, frame):
        print(json.dumps(_summarize(state["parts"])), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(int(TOTAL_BUDGET_S + 120))

    parts, measured = run_sections(state["parts"])
    result = _summarize(parts)
    if not measured or not result["value"]:
        fb = _fallback_artifact()
        if fb is not None:
            fb.setdefault("detail", {}).setdefault("errors", []).extend(
                parts.get("errors", []))
            result = fb
    signal.alarm(0)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
