#!/usr/bin/env python3
"""Quantify the tracking convergence basin vs per-frame motion size.

Tracks against the PERFECT map (the synthetic scene's true splats), so any
residual error is the tracker's own: photometric local minima, eval budget,
and the stale-bins effect (tiles are binned once at the prior pose;
tracking/track.py:89-97). For each perturbation size we report the final
translation error twice:

  * realistic: bins at the perturbed prior, default 1.5x radius margin
  * wide-bins: same, but 4x radius margin (emulates fresh bins everywhere)

A large realistic/wide gap at a given motion size means re-binning (or a
bigger margin) would widen the basin; a small gap means the photometric
landscape itself is the limit and the fix is gentler motion or multi-scale.

Usage: JAX_PLATFORMS=cpu python scripts/probe_basin.py [W H evals]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    evals = int(sys.argv[3]) if len(sys.argv) > 3 else 75

    import jax.numpy as jnp

    from gslam_tpu.core.compile_cache import enable_compile_cache
    from gslam_tpu.core.transforms import se3_exp
    from gslam_tpu.io.synthetic import SyntheticDataset
    from gslam_tpu.ops.rasterize import render
    from gslam_tpu.tracking.track import TrackingConfig, track_frame

    enable_compile_cache()

    ds = SyntheticDataset(seq_len=2, width=w, height=h, n_splats=4000, seed=7)
    gmap = ds.gt_map
    cam = ds.camera
    K = cam.K
    gt_pose = jnp.eye(4)

    out = render(**gmap.render_kwargs(), viewmats=gt_pose[None], Ks=K[None],
                 width=w, height=h)
    gt_img = out.rgb[0]

    cfg = TrackingConfig(lbfgs_max_eval=evals)
    cfg_wide = TrackingConfig(lbfgs_max_eval=evals, bin_radius_margin=4.0)
    rng = np.random.default_rng(0)

    print(f"# basin probe {w}x{h} evals={evals}")
    print(f"{'pert_cm':>8} {'realistic_mm':>13} {'wide_mm':>10}")
    for pert_cm in [0.5, 1.0, 2.0, 4.0, 6.0, 8.0]:
        errs_real, errs_wide = [], []
        for trial in range(3):
            # random direction translation + proportional rotation
            tdir = rng.normal(size=3)
            tdir /= np.linalg.norm(tdir)
            rot = rng.normal(size=3)
            rot /= np.linalg.norm(rot)
            ang = np.radians(0.4) * pert_cm  # 0.4 deg per cm, like the walk
            xi = jnp.asarray(
                np.concatenate([rot * ang, tdir * pert_cm * 0.01]),
                jnp.float32)
            prior = se3_exp(xi) @ gt_pose

            for cfg_i, errs in ((cfg, errs_real), (cfg_wide, errs_wide)):
                r = track_frame(gmap, prior, jnp.zeros(2), gt_img, K, w, h,
                                cfg_i)
                errs.append(float(jnp.linalg.norm(r.pose[:3, 3]
                                                  - gt_pose[:3, 3])))
        print(f"{pert_cm:8.1f} {1e3 * np.mean(errs_real):13.2f} "
              f"{1e3 * np.mean(errs_wide):10.2f}", flush=True)


if __name__ == "__main__":
    main()
