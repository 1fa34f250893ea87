"""Synthetic splat-scene dataset.

Renders ground-truth RGB(+depth) frames from a randomly generated Gaussian
scene along a smooth camera trajectory, using the framework's own renderer.
This gives a fully self-contained end-to-end SLAM benchmark with exact
ground-truth poses — no dataset download needed (the machine has no TUM
data). Deterministic given the seed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gslam_tpu.core.camera import Camera
from gslam_tpu.core.transforms import so3_exp
from gslam_tpu.io.frames import Frame
from gslam_tpu.mapping.gaussians import empty_map
from gslam_tpu.ops.rasterize import RenderConfig, render


def make_room_scene(rng, n_splats, extent=3.0):
    """Random colorful splats on the inside of a box ('room') around origin."""
    # sample points on 5 walls of a box (no wall behind the camera start)
    wall = rng.integers(0, 5, n_splats)
    u = rng.uniform(-1, 1, n_splats)
    v = rng.uniform(-1, 1, n_splats)
    pts = np.zeros((n_splats, 3), np.float32)
    e = extent
    pts[wall == 0] = np.stack([u, v, np.full_like(u, 1.0)], -1)[wall == 0] * e  # front
    pts[wall == 1] = np.stack([np.full_like(u, -1.0), u, v * 0.5 + 0.5], -1)[wall == 1] * e
    pts[wall == 2] = np.stack([np.full_like(u, 1.0), u, v * 0.5 + 0.5], -1)[wall == 2] * e
    pts[wall == 3] = np.stack([u, np.full_like(u, -1.0), v * 0.5 + 0.5], -1)[wall == 3] * e
    pts[wall == 4] = np.stack([u, np.full_like(u, 1.0), v * 0.5 + 0.5], -1)[wall == 4] * e
    # bumpy surfaces
    pts += rng.normal(scale=0.05 * e, size=pts.shape).astype(np.float32)
    return pts


class SyntheticDataset:
    def __init__(
        self,
        seq_len: int = 30,
        width: int = 160,
        height: int = 120,
        n_splats: int = 2000,
        seed: int = 0,
        motion_scale: float = 0.02,
        with_depth: bool = True,
        rotation_only: bool = False,
    ):
        rng = np.random.default_rng(seed)
        fx = fy = 0.9 * width
        K = np.array(
            [[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], np.float32
        )
        self.camera = Camera(K=jnp.asarray(K), height=height, width=width)
        self.length = seq_len

        pts = make_room_scene(rng, n_splats)
        cap = n_splats
        gmap = empty_map(cap)
        scale = rng.uniform(0.05, 0.14, (n_splats, 3)).astype(np.float32)
        gmap = gmap._replace(
            means=jnp.asarray(pts),
            quats=jnp.asarray(rng.normal(size=(n_splats, 4)).astype(np.float32)),
            log_scales=jnp.asarray(np.log(scale)),
            logit_opacities=jnp.full((cap,), 3.0),
            logit_colors=jnp.asarray(
                rng.normal(size=(n_splats, 3)).astype(np.float32) * 1.5
            ),
            log_uncertainties=jnp.zeros((cap,)),
            alive=jnp.ones((cap,), bool),
        )
        self.gt_map = gmap

        # smooth random-walk trajectory (world-to-camera poses)
        poses = [np.eye(4, dtype=np.float32)]
        vel = np.zeros(3, np.float32)
        rot_vel = np.zeros(3, np.float32)
        for _ in range(seq_len - 1):
            if rotation_only:
                # steady pan-in-place: exercises the view-angle (kf_cos)
                # keyframe trigger in isolation — zero translation means
                # neither the kf_m nor the kf_adapt trigger can fire, and
                # a DETERMINISTIC yaw rate (motion_scale rad/frame) makes
                # the accumulated view angle cross any threshold at a
                # predictable frame (a random walk mean-reverts and can
                # stay under the trigger for a whole short sequence)
                vel = np.zeros(3, np.float32)
                rot_vel = np.asarray(
                    [0.0, motion_scale, 0.0], np.float32)
            else:
                vel = 0.9 * vel + rng.normal(
                    scale=motion_scale, size=3) * [1, 1, 0.5]
                rot_vel = 0.9 * rot_vel + rng.normal(
                    scale=motion_scale * 0.3, size=3)
            delta = np.eye(4, dtype=np.float32)
            delta[:3, :3] = np.asarray(so3_exp(jnp.asarray(rot_vel, jnp.float32)))
            delta[:3, 3] = vel
            poses.append((delta @ poses[-1]).astype(np.float32))
        self.poses = np.stack(poses)  # world-to-camera

        cfg = RenderConfig(tile_capacity=512, tile_chunk=16, pairs_per_gaussian=16)
        # Render ground truth in camera batches: one batched call over the
        # whole sequence allocates a [seq_len, tiles, px, feat] blend buffer
        # (18.8 GB at 120 frames of 640x480) and OOMs HBM.
        batch = max(1, min(seq_len, (8 * 640 * 480) // (width * height)))
        imgs, deps = [], []
        for c0 in range(0, seq_len, batch):
            vm = jnp.asarray(self.poses[c0:c0 + batch])
            out = render(
                **gmap.render_kwargs(),
                viewmats=vm,
                Ks=jnp.tile(jnp.asarray(K)[None], (vm.shape[0], 1, 1)),
                width=width, height=height, cfg=cfg,
            )
            imgs.append(np.clip(np.asarray(out.rgb), 0.0, 1.0))
            if with_depth:
                deps.append(np.asarray(out.depth))
        self.images = np.concatenate(imgs, axis=0)
        self.depths = np.concatenate(deps, axis=0) if with_depth else None
        self.with_depth = with_depth

    def init(self):
        return

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        if idx >= self.length:
            raise IndexError(idx)
        return Frame(
            image=self.images[idx],
            timestamp=float(idx) / 30.0,
            camera=self.camera,
            index=idx,
            gt_pose=self.poses[idx],
            gt_depth=self.depths[idx] if self.with_depth else None,
        )

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
