"""Decode a run directory into a per-frame diagnostic table.

Joins trajectory.npy + telemetry.npz against the dataset's ground-truth
poses and prints, per frame: absolute translation error, gt step size,
the keyframe-decision inputs (translation since last keyframe, the
kf_m*median_depth threshold, view-axis cosine), the keyframe flag, the
final tracking loss, and the L-BFGS eval count. This is the table that
root-caused the r3 flagship divergence and both r4 gate failures
(docs/TRACKING_STUDY.md) — run it on any finished run before drawing
conclusions from metrics.json alone.

Usage: python scripts/decode_run.py runs/r4_gate_cpu [--kf-m 0.015]
The dataset path is read from the run's args.txt (--scene ...).
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np


def load_gt_poses(run_dir: Path) -> np.ndarray:
    args_txt = (run_dir / "args.txt").read_text()
    m = re.search(r"--scene[= ](\S+)", args_txt)
    if not m:
        raise SystemExit(f"no --scene in {run_dir}/args.txt")
    scene = np.load(m.group(1))
    return scene["gt_poses"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--kf-m", type=float, default=None,
                    help="kf_m used by the run (default: parse args.txt, "
                         "falling back to 0.04)")
    args = ap.parse_args()
    run = args.run_dir

    traj = np.load(run / "trajectory.npy")
    tel = np.load(run / "telemetry.npz")
    gt = load_gt_poses(run)
    kf_m = args.kf_m
    if kf_m is None:
        m = re.search(r"mapping\.kf_m=([0-9.]+)", (run / "args.txt").read_text())
        kf_m = float(m.group(1)) if m else 0.04

    F = min(len(traj), len(tel["kf_flags"]))
    est_t, gt_t = traj[:F, :3, 3], gt[:F, :3, 3]
    err = np.linalg.norm(est_t - gt_t, axis=1)
    step = np.r_[0.0, np.linalg.norm(np.diff(gt_t, axis=0), axis=1)]

    print(f"{'f':>3} {'err_cm':>7} {'gt_step':>7} {'kd_trans':>8} "
          f"{'thresh':>7} {'cos_z':>7} {'kf':>2} {'loss':>8} {'evals':>5}")
    for i in range(F):
        md = float(tel["kd_median_depth"][i])
        print(f"{i:3d} {err[i] * 100:7.2f} {step[i] * 100:7.2f} "
              f"{float(tel['kd_translation'][i]):8.4f} {kf_m * md:7.4f} "
              f"{float(tel['kd_cos_z'][i]):7.4f} "
              f"{int(tel['kf_flags'][i]):2d} "
              f"{float(tel['track_losses'][i]):8.4f} "
              f"{int(tel['n_evals'][i]):5d}")

    metrics = json.loads((run / "metrics.json").read_text())
    print(f"\nate={metrics.get('ate')} ate_rmse={metrics.get('ate_rmse')} "
          f"psnr={metrics.get('psnr')} diverged={metrics.get('diverged')} "
          f"health={metrics.get('health')} kf={metrics.get('kf_frames')}")


if __name__ == "__main__":
    main()
