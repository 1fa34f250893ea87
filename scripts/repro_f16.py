#!/usr/bin/env python3
"""Reproduce + dissect the r5 gate failure at f15-f17 (runs/r5_gate_gn).

Both the pyramid-L-BFGS and pyramid-GN chip gates tracked the first 14
frames of the flagship scene at sub-5mm aligned ATE and then exploded at
f15-17 with a 180-degree view flip whose recorded track loss was NOMINAL
(telemetry kd_cos_z[17] = -0.9999, track_losses[17] = 0.027). This script
answers the question the fix depends on: is the flipped/diverged pose a
LOWER-OBJECTIVE point than the true pose (objective flaw), or a basin the
optimizer jumped into from a too-far prior (robustness flaw)?

Method: run the fused RGB-D loop on frames 0..14 (the healthy prefix) at
80x60 to build the same-aged map, then for f15/f16/f17:
  * evaluate the tracking objective (photometric active-nerf + alpha-
    normalized depth lock, exactly tracking/track.py's terms) at the
    MOTION PRIOR, the GT pose, and the chip run's diverged pose;
  * run the GN pyramid tracker from the prior and report where it lands.
Prints one JSON line per frame.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xf = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_cpu_max_isa=AVX2").strip()

import numpy as np


def main():

    import jax.numpy as jnp

    from gslam_tpu.core.compile_cache import enable_compile_cache

    enable_compile_cache()

    from gslam_tpu.io.npz import NpzDataset
    from gslam_tpu.mapping.backend_ops import MapConfig
    from gslam_tpu.ops.losses import (
        apply_exposure, masked_depth_l1, tracking_photometric,
    )
    from gslam_tpu.ops.rasterize import RenderConfig, render
    from gslam_tpu.runtime.fused import FusedConfig, FusedSlam
    from gslam_tpu.tracking.track import (
        TrackingConfig, constant_motion_prior, track_frame,
    )

    W, H = 80, 60
    ds = NpzDataset("runs/r4_scene/dataset_80.npz")
    K = jnp.asarray(ds.camera.K, jnp.float32)

    rcfg = RenderConfig(tile_capacity=128, tile_chunk=8)
    tcfg = TrackingConfig(use_gt_depths=True, render=rcfg,
                          method="gn", gn_iters=8, pyramid_levels=3)
    fcfg = FusedConfig(
        tracking=tcfg,
        mapping=MapConfig(render=rcfg, use_gt_depths=True),
        max_frames=15, use_gt_depths=True,
        init_iters_per_dispatch=40,
    )

    slam = FusedSlam(fcfg, W, H, capacity=8192, kf_capacity=16, seed=0)
    m = slam.run(NpzDataset("runs/r4_scene/dataset_80.npz", seq_len=15),
                 chunk=1, sync_every=0, eval_stride=0)
    print(json.dumps({"prefix_ate": m.get("ate"), "N": m.get("N"),
                      "kf": m.get("kf_frames"),
                      "health": m.get("health")}), flush=True)

    state = slam.final_state
    gmap = state.gmap
    est = [np.asarray(p) for p in slam.trajectory]
    exposure = jnp.zeros(2)

    gt_poses = [np.asarray(ds[i].gt_pose) for i in range(18)]
    # the diverged chip trajectory at 160x120 (same scene, same walk)
    div = np.load("runs/r5_gate_gn/trajectory.npy")

    def objective(pose, img, dep):
        out = render(**gmap.render_kwargs(), viewmats=jnp.asarray(pose)[None],
                     Ks=K[None], width=W, height=H, cfg=rcfg)
        rgb = apply_exposure(out.rgb[0], exposure)
        photo = tracking_photometric(rgb, img, out.beta[0])
        d_hat = out.depth[0] / jnp.maximum(out.alpha[0], 1e-3)
        dterm = masked_depth_l1(d_hat[None], dep[None],
                                alpha=out.alpha[0][None],
                                alpha_min=tcfg.depth_alpha_min)
        alpha_mean = float(jnp.mean(out.alpha[0]))
        return (float(photo), float(dterm),
                float(photo + tcfg.depth_loss_weight * dterm), alpha_mean)

    def center(p):
        return -p[:3, :3].T @ p[:3, 3]

    for i in (15, 16, 17):
        img = jnp.asarray(ds[i].image, jnp.float32)
        dep = jnp.asarray(ds[i].gt_depth, jnp.float32)
        a = jnp.asarray(est[i - 2] if i - 2 < len(est) else gt_poses[i - 2])
        b = jnp.asarray(est[i - 1] if i - 1 < len(est) else gt_poses[i - 1])
        prior = constant_motion_prior(a, b)

        row = {"frame": i}
        for name, pose in (("prior", np.asarray(prior)),
                           ("gt", gt_poses[i]), ("diverged", div[i])):
            ph, dt, tot, am = objective(jnp.asarray(pose), img, dep)
            row[name] = {"photo": round(ph, 5), "depth": round(dt, 5),
                         "total": round(tot, 5), "alpha_mean": round(am, 4),
                         "err_m": round(float(np.linalg.norm(
                             center(pose) - center(gt_poses[i]))), 4)}

        r = track_frame(gmap, prior, exposure, img, K, W, H, tcfg,
                        gt_depth=dep)
        landed = np.asarray(r.pose)
        ph, dt, tot, am = objective(jnp.asarray(landed), img, dep)
        row["tracked"] = {
            "photo": round(ph, 5), "depth": round(dt, 5),
            "total": round(tot, 5), "alpha_mean": round(am, 4),
            "err_m": round(float(np.linalg.norm(
                center(landed) - center(gt_poses[i]))), 4),
            "n_evals": int(r.n_evals), "rejected": bool(r.rejected)}
        print(json.dumps(row), flush=True)

        # chain the est trajectory forward with the tracked pose so f16's
        # prior compounds f15's error exactly as the real run does
        est.append(landed)


if __name__ == "__main__":
    main()
