#!/usr/bin/env python3
"""Discriminate WHY tracking under-corrects (see probe_basin.py, which
found ~2/3 of any perturbation remains after 75 evals against a perfect
map).

Hypotheses tested, one column each, 2cm perturbation:
  A. rot/trans ambiguity: pure-translation perturbation (no rotation)
     should recover fully if the stall is along the coupled valley.
  B. eval budget: 300 evals instead of 75.
  C. depth anchoring: RGB-D tracking (depth L1 term) breaks the valley.
  D. rotation-only metric: report final ROTATION error too — if the
     optimizer trades translation against rotation, both stay off
     together.

Usage: JAX_PLATFORMS=cpu python scripts/probe_basin2.py [W H]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def rot_err_deg(P, Q):
    R = np.asarray(P)[:3, :3] @ np.asarray(Q)[:3, :3].T
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 240

    import jax.numpy as jnp

    from gslam_tpu.core.compile_cache import enable_compile_cache
    from gslam_tpu.core.transforms import se3_exp
    from gslam_tpu.io.synthetic import SyntheticDataset
    from gslam_tpu.ops.rasterize import render
    from gslam_tpu.tracking.track import TrackingConfig, track_frame

    enable_compile_cache()

    ds = SyntheticDataset(seq_len=2, width=w, height=h, n_splats=4000, seed=7)
    gmap = ds.gt_map
    K = ds.camera.K
    gt_pose = jnp.eye(4)

    out = render(**gmap.render_kwargs(), viewmats=gt_pose[None], Ks=K[None],
                 width=w, height=h)
    gt_img, gt_depth = out.rgb[0], out.depth[0]

    rng = np.random.default_rng(0)
    pert_cm = 2.0

    def perturb(with_rot):
        tdir = rng.normal(size=3)
        tdir /= np.linalg.norm(tdir)
        rotv = rng.normal(size=3)
        rotv /= np.linalg.norm(rotv)
        ang = np.radians(0.8) if with_rot else 0.0
        xi = jnp.asarray(
            np.concatenate([rotv * ang, tdir * pert_cm * 0.01]), jnp.float32)
        return se3_exp(xi) @ gt_pose

    cases = [
        ("baseline75", TrackingConfig(lbfgs_max_eval=75), True, False),
        ("pure-trans", TrackingConfig(lbfgs_max_eval=75), False, False),
        ("evals300", TrackingConfig(lbfgs_max_iter=200, lbfgs_max_eval=300),
         True, False),
        ("rgbd75", TrackingConfig(lbfgs_max_eval=75, use_gt_depths=True),
         True, True),
    ]
    print(f"# basin2 {w}x{h} pert={pert_cm}cm (3 trials each)")
    print(f"{'case':>12} {'trans_mm':>9} {'rot_deg':>8} {'evals':>6}")
    for name, cfg, with_rot, use_depth in cases:
        te, re_, ne = [], [], []
        for _ in range(3):
            prior = perturb(with_rot)
            r = track_frame(
                gmap, prior, jnp.zeros(2), gt_img, K, w, h, cfg,
                gt_depth=gt_depth if use_depth else None)
            te.append(float(jnp.linalg.norm(r.pose[:3, 3] - gt_pose[:3, 3])))
            re_.append(rot_err_deg(r.pose, gt_pose))
            ne.append(int(r.n_evals))
        print(f"{name:>12} {1e3 * np.mean(te):9.2f} {np.mean(re_):8.3f} "
              f"{np.mean(ne):6.0f}", flush=True)


if __name__ == "__main__":
    main()
