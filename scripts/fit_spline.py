#!/usr/bin/env python3
"""Continuous-time spline fitting experiment.

Counterpart of the reference's test_trajectory.py: fit a cumulative cubic
B-spline trajectory to a sequence's ground-truth poses (TUM groundtruth.txt
or a synthetic trajectory), optionally tightening against accelerometer
residuals, and report/plot interpolation error.

    python scripts/fit_spline.py                       # synthetic demo
    python scripts/fit_spline.py --tum /data/fr1_desk  # real gt + accel
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tum", type=str, default=None)
    ap.add_argument("--interval", type=float, default=0.4)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", type=str, default="/tmp/spline_fit.png")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from gslam_tpu.core.transforms import so3_exp
    from gslam_tpu.eval.spline import (
        fit_spline, init_spline, seed_from_poses, spline_pose,
        rot_cps_from_quats,
    )

    if args.tum:
        gt = np.loadtxt(f"{args.tum}/groundtruth.txt", comments="#")
        times = jnp.asarray(gt[:, 0] - gt[0, 0], jnp.float32)
        pos = jnp.asarray(gt[:, 1:4], jnp.float32)
        q_xyzw = gt[:, 4:8]
        q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], 1)
        rot = rot_cps_from_quats(jnp.asarray(q_wxyz, jnp.float32))
        accel_times = accel = None
        try:
            acc = np.loadtxt(f"{args.tum}/accelerometer.txt", comments="#")
            accel_times = jnp.asarray(acc[:, 0] - gt[0, 0], jnp.float32)
            accel = jnp.asarray(acc[:, 1:4], jnp.float32)
        except OSError:
            pass
    else:
        times = jnp.asarray(np.linspace(0, 10, 120, dtype=np.float32))
        pos = jnp.stack([jnp.sin(times), jnp.cos(0.7 * times), 0.1 * times], -1)
        w = jnp.stack([0.2 * times, 0.1 * jnp.sin(times), jnp.zeros_like(times)], -1)
        rot = so3_exp(w)
        accel_times = accel = None

    n_cps = int(float(times[-1]) / args.interval) + 4
    sp = init_spline(n_cps, args.interval, float(times[0]))
    sp = seed_from_poses(sp, times, rot, pos)

    sp, losses = fit_spline(
        sp, times, rot, pos,
        accel_times=accel_times, accel_meas=accel,
        n_steps=args.steps,
    )
    print(f"fit loss {float(losses[0]):.5f} -> {float(losses[-1]):.5f} "
          f"({n_cps} control points, dt={args.interval}s)")

    _, p = spline_pose(sp, times)
    err = np.linalg.norm(np.asarray(p) - np.asarray(pos), axis=-1)
    print(f"interpolation error: mean {err.mean() * 100:.2f} cm, "
          f"max {err.max() * 100:.2f} cm")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    pn, gn = np.asarray(p), np.asarray(pos)
    ax.plot(gn[:, 0], gn[:, 1], label="gt")
    ax.plot(pn[:, 0], pn[:, 1], "--", label="spline")
    ax.legend(); ax.set_aspect("equal")
    fig.savefig(args.out, dpi=100, bbox_inches="tight")
    print(f"plot: {args.out}")


if __name__ == "__main__":
    main()
