#!/usr/bin/env python3
"""Offline checkpoint viewer.

Counterpart of the reference's view.py (viser/nerfview server over a saved
checkpoint): loads a splat map checkpoint and either serves an interactive
viser viewer (if viser is importable) or renders an orbit of views to
PNGs/video frames.

    python view.py runs/<name>/splats.npz --out /tmp/orbit
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def orbit_poses(center, radius: float, n: int, elevation: float = 0.3):
    """World-to-camera poses circling `center`, looking at it."""
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = center + radius * np.array(
            [np.sin(ang), -elevation, -np.cos(ang)], np.float32
        )
        fwd = center - eye
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0], np.float32)
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
        poses.append(np.linalg.inv(c2w))
    return np.stack(poses)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--out", default="orbit")
    ap.add_argument("--n-views", type=int, default=24)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--serve", action="store_true",
                    help="interactive viser server instead of orbit render")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from gslam_tpu.core.compile_cache import enable_compile_cache
    from gslam_tpu.runtime.checkpoint import load_map
    from gslam_tpu.ops.rasterize import RenderConfig, render
    from gslam_tpu.viz.viewer import serve_viewer

    enable_compile_cache()

    gmap, extra = load_map(args.checkpoint)
    alive = np.asarray(gmap.alive)
    print(f"loaded {alive.sum()} live splats / capacity {alive.size}")

    if args.serve:
        serve_viewer(gmap, width=args.width, height=args.height)
        return

    means = np.asarray(gmap.means)[alive]
    center = jnp.asarray(np.median(means, axis=0))
    radius = float(np.percentile(np.linalg.norm(means - np.asarray(center), axis=1), 60))

    W, H = args.width, args.height
    fx = 0.9 * W
    K = jnp.asarray(
        np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    )
    poses = orbit_poses(np.asarray(center), radius, args.n_views)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    cfg = RenderConfig(tile_capacity=512, tile_chunk=16)
    for i in range(args.n_views):
        out = render(
            **gmap.render_kwargs(),
            viewmats=jnp.asarray(poses[i : i + 1]), Ks=K[None],
            width=W, height=H, cfg=cfg,
        )
        img = np.uint8(np.clip(np.asarray(out.rgb[0]), 0, 1) * 255)
        Image.fromarray(img).save(out_dir / f"{i:04}.png")
    print(f"wrote {args.n_views} orbit views to {out_dir}")


if __name__ == "__main__":
    main()
