#!/usr/bin/env python3
"""Isolating study: why did tracking diverge at realistic motion?

The r3 flagship (monocular, 4.7 cm/frame) drifted 2-3 cm/frame from frame
1 and exploded at the first keyframe burst (VERDICT r3). Candidate causes
no prior experiment separated: (a) L-BFGS eval budget too small, (b) the
frozen bin lists (bin_radius_margin) invalid at this motion, (c) the
constant-motion prior compounding errors, (d) the map itself being wrong
(monocular mock-depth bootstrap geometry / insertion at mistracked poses).

This script isolates them by tracking against maps of controlled quality:

  oracle      — track every frame against the dataset's GROUND-TRUTH splat
                scene (synthetic only): any error is pure tracker error.
                `--prior gt` uses the gt constant-motion prior (single-
                frame convergence, no compounding); `--prior est` chains
                the tracker's own estimates (compounding included).
  mono / rgbd — the full fused SLAM loop (map built online), monocular or
                RGB-D; isolates map-quality effects by comparison with
                oracle at the same motion.

Usage:
  JAX_PLATFORMS=cpu python scripts/study_tracking.py oracle \
      --motion 0.045 --frames 16 --evals 75 --margin 1.5 --prior est
  JAX_PLATFORMS=cpu python scripts/study_tracking.py mono --motion 0.045

Prints one JSON line with per-frame translation errors (meters).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xf = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_cpu_max_isa=AVX2").strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["oracle", "mono", "rgbd"])
    ap.add_argument("--motion", type=float, default=0.045)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--n-splats", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--evals", type=int, default=200)
    ap.add_argument("--iters", type=int, default=160)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--margin", type=float, default=1.5)
    ap.add_argument("--prior", choices=["gt", "est", "identity"],
                    default="est")
    ap.add_argument("--scene", choices=["synthetic", "raytrace"],
                    default="synthetic")
    ap.add_argument("--kf-m", type=float, default=0.04)
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument("--pyramid", type=int, default=1,
                    help="coarse-to-fine levels (1 = flat tracker)")
    ap.add_argument("--pyramid-evals", type=str, default="100,70,50",
                    help="per-level eval budgets, coarse->fine")
    ap.add_argument("--tracker", choices=["lbfgs", "gn"], default="lbfgs",
                    help="gn = Levenberg-Marquardt on the residual vector "
                         "(TrackingConfig.method='gn')")
    ap.add_argument("--gn-iters", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from gslam_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from gslam_tpu.tracking.track import (
        TrackingConfig, constant_motion_prior, track_frame,
    )
    from gslam_tpu.eval.trajectory import trajectory_positions

    if args.scene == "synthetic":
        from gslam_tpu.io.synthetic import SyntheticDataset

        ds = SyntheticDataset(
            seq_len=args.frames, width=args.width, height=args.height,
            n_splats=args.n_splats, seed=args.seed, motion_scale=args.motion)
    else:
        from gslam_tpu.io.raytrace import RaytracedDataset

        ds = RaytracedDataset(
            seq_len=args.frames, width=args.width, height=args.height,
            seed=args.seed, motion_scale=args.motion)

    gt_centers = trajectory_positions(ds.poses)
    steps = np.linalg.norm(np.diff(gt_centers, axis=0), axis=1)
    out = {
        "mode": args.mode, "motion": args.motion, "frames": args.frames,
        "median_step_m": float(np.median(steps)),
        "evals": args.evals, "margin": args.margin, "warmup": args.warmup,
        "prior": args.prior, "scene": args.scene, "tag": args.tag,
    }

    pyr_evals = tuple(int(v) for v in args.pyramid_evals.split(","))
    tcfg = TrackingConfig(
        lbfgs_max_eval=args.evals, lbfgs_max_iter=args.iters,
        warmup_steps=args.warmup, bin_radius_margin=args.margin,
        pyramid_levels=args.pyramid, pyramid_evals=pyr_evals,
        method="gn" if args.tracker == "gn" else "igs",
        gn_iters=args.gn_iters,
    )
    out["tracker"] = args.tracker
    out["pyramid"] = args.pyramid
    if args.pyramid > 1:
        out["pyramid_evals"] = list(pyr_evals)

    if args.mode == "oracle":
        if args.scene != "synthetic":
            raise SystemExit("oracle mode needs the synthetic gt splat map")
        gmap = ds.gt_map
        K = jnp.asarray(ds.camera.K)
        est = [np.asarray(ds.poses[0])]
        exposure = jnp.zeros(2)
        errs, evals = [], []
        for i in range(1, args.frames):
            if args.prior == "gt":
                a = jnp.asarray(ds.poses[max(i - 2, 0)])
                b = jnp.asarray(ds.poses[i - 1])
            elif args.prior == "est":
                a = jnp.asarray(est[max(i - 2, 0)])
                b = jnp.asarray(est[i - 1])
            else:
                a = b = jnp.asarray(est[i - 1])
            prior = constant_motion_prior(a, b) if i >= 2 else b
            r = track_frame(gmap, prior, exposure,
                            jnp.asarray(ds.images[i]), K,
                            args.width, args.height, tcfg)
            est.append(np.asarray(r.pose))
            exposure = r.exposure
            c_est = trajectory_positions(np.asarray(r.pose)[None])[0]
            errs.append(float(np.linalg.norm(c_est - gt_centers[i])))
            evals.append(int(r.n_evals))
        out["per_frame_err_m"] = [round(e, 5) for e in errs]
        out["max_err_m"] = max(errs)
        out["mean_evals"] = float(np.mean(evals))
    else:
        from gslam_tpu.mapping.backend_ops import MapConfig
        from gslam_tpu.runtime.fused import FusedConfig, FusedSlam

        use_gt = args.mode == "rgbd"
        fcfg = FusedConfig(
            tracking=TrackingConfig(
                lbfgs_max_eval=args.evals, lbfgs_max_iter=args.iters,
                warmup_steps=args.warmup, bin_radius_margin=args.margin,
                use_gt_depths=use_gt,
                pyramid_levels=args.pyramid, pyramid_evals=pyr_evals,
                method="gn" if args.tracker == "gn" else "igs",
                gn_iters=args.gn_iters,
            ),
            mapping=MapConfig(kf_m=args.kf_m, use_gt_depths=use_gt),
            max_frames=args.frames, use_gt_depths=use_gt,
        )
        slam = FusedSlam(fcfg, args.width, args.height,
                         capacity=2 ** 14, kf_capacity=16, seed=0)
        m = slam.run(ds, chunk=1, sync_every=0, eval_stride=4)
        est_centers = trajectory_positions(slam.trajectory)
        # per-frame error in the gauge of frame 0 (both trajectories start
        # at identity, so no alignment needed for the error profile)
        errs = np.linalg.norm(est_centers - gt_centers[:len(est_centers)],
                              axis=1)
        out["per_frame_err_m"] = [round(float(e), 5) for e in errs]
        out["ate"] = m.get("ate")
        out["ate_rmse"] = m.get("ate_rmse")
        out["psnr"] = m.get("psnr")
        out["health"] = m.get("health")
        out["kf_frames"] = m.get("kf_frames")
        out["mean_track_evals"] = m.get("mean_track_evals")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
