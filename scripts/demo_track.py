"""End-to-end library drive: build a splat map, render it, perturb the
camera, and recover the pose with the tracking frontend. Saves renders.

Usage: python scripts/demo_track.py [out_dir]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from gslam_tpu.mapping.gaussians import empty_map
from gslam_tpu.ops import render, RenderConfig
from gslam_tpu.tracking import TrackingConfig, track_frame
from gslam_tpu.core.transforms import se3_exp

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gslam_demo"
import os

os.makedirs(out_dir, exist_ok=True)

rng = np.random.default_rng(42)
N_LIVE, CAP = 400, 512
W, H = 96, 64
fx = fy = 80.0
K = jnp.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)

# populate a map: splats on a wavy surface ~3m away with distinct colors
z = rng.uniform(1.5, 4.5, N_LIVE).astype(np.float32)
u = rng.uniform(2, W - 2, N_LIVE).astype(np.float32)
v = rng.uniform(2, H - 2, N_LIVE).astype(np.float32)
x = (u - W / 2) * z / fx
y = (v - H / 2) * z / fy

gmap = empty_map(CAP)
gmap = gmap._replace(
    means=gmap.means.at[:N_LIVE].set(jnp.asarray(np.stack([x, y, z], -1))),
    quats=gmap.quats.at[:N_LIVE].set(
        jnp.asarray(rng.normal(size=(N_LIVE, 4)).astype(np.float32))
    ),
    log_scales=gmap.log_scales.at[:N_LIVE].set(
        jnp.log(jnp.asarray(rng.uniform(0.04, 0.1, (N_LIVE, 3)).astype(np.float32)))
    ),
    logit_opacities=gmap.logit_opacities.at[:N_LIVE].set(2.0),
    logit_colors=gmap.logit_colors.at[:N_LIVE].set(
        jnp.asarray(rng.normal(size=(N_LIVE, 3)).astype(np.float32) * 2)
    ),
    log_uncertainties=gmap.log_uncertainties.at[:N_LIVE].set(0.0),
    alive=gmap.alive.at[:N_LIVE].set(True),
)

cfg = RenderConfig(tile_capacity=256, tile_chunk=8)
gt_pose = jnp.eye(4)
out = render(**gmap.render_kwargs(), viewmats=gt_pose[None], Ks=K[None],
             width=W, height=H, cfg=cfg)
gt_img = out.rgb[0]
Image.fromarray(np.uint8(np.clip(np.asarray(gt_img), 0, 1) * 255)).save(
    f"{out_dir}/gt.png"
)
print("gt render: alpha mean %.3f, rgb range [%.3f, %.3f], n_pairs=%d"
      % (float(out.alpha.mean()), float(gt_img.min()), float(gt_img.max()),
         int(out.n_pairs[0])))

# perturb the pose: ~2cm translation + ~1 deg rotation
xi = jnp.array([0.02, -0.015, 0.01, 0.012, -0.008, 0.01])
bad_pose = se3_exp(xi) @ gt_pose
out_bad = render(**gmap.render_kwargs(), viewmats=bad_pose[None], Ks=K[None],
                 width=W, height=H, cfg=cfg)
Image.fromarray(np.uint8(np.clip(np.asarray(out_bad.rgb[0]), 0, 1) * 255)).save(
    f"{out_dir}/perturbed.png"
)
err_before = float(jnp.mean(jnp.abs(out_bad.rgb[0] - gt_img)))

tcfg = TrackingConfig(render=cfg)
t0 = time.time()
res = track_frame(gmap, bad_pose, jnp.zeros(2), gt_img, K, W, H, tcfg)
res.pose.block_until_ready()
t_compile = time.time() - t0
t0 = time.time()
res = track_frame(gmap, bad_pose, jnp.zeros(2), gt_img, K, W, H, tcfg)
res.pose.block_until_ready()
t_run = time.time() - t0
# second refinement round from the first result (rebased)
res = track_frame(gmap, res.pose, res.exposure, gt_img, K, W, H, tcfg)

out_tracked = render(**gmap.render_kwargs(), viewmats=res.pose[None], Ks=K[None],
                     width=W, height=H, cfg=cfg)
Image.fromarray(np.uint8(np.clip(np.asarray(out_tracked.rgb[0]), 0, 1) * 255)).save(
    f"{out_dir}/tracked.png"
)
err_after = float(jnp.mean(jnp.abs(out_tracked.rgb[0] - gt_img)))

pose_err_before = float(jnp.linalg.norm(bad_pose[:3, 3] - gt_pose[:3, 3]))
pose_err_after = float(jnp.linalg.norm(res.pose[:3, 3] - gt_pose[:3, 3]))
rot_err_after = float(jnp.linalg.norm(res.pose[:3, :3] - gt_pose[:3, :3]))

print(f"photo L1: before={err_before:.5f} after={err_after:.5f}")
print(f"translation err: before={pose_err_before * 100:.2f}cm "
      f"after={pose_err_after * 100:.3f}cm; rot fro err={rot_err_after:.5f}")
print(f"tracking loss={float(res.loss):.6f} evals={int(res.n_evals)} "
      f"compile={t_compile:.1f}s run={t_run * 1000:.0f}ms")

ok = pose_err_after < 0.005 and err_after < 0.1 * err_before
print("TRACKING", "RECOVERED" if ok else "DID NOT RECOVER")
sys.exit(0 if ok else 1)
