#!/usr/bin/env python3
"""Materialize a synthetic or raytraced SLAM sequence into an .npz cache.

Run under JAX_PLATFORMS=cpu so the TPU process that consumes the cache
never renders ground truth itself (see gslam_tpu/io/npz.py for why).

    JAX_PLATFORMS=cpu python scripts/make_npz_dataset.py OUT.npz \
        --scene raytrace --seq-len 160 --width 320 --height 240 \
        --motion 0.026 --seed 1
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--scene", choices=["synthetic", "raytrace"],
                    default="synthetic")
    ap.add_argument("--seq-len", type=int, default=160)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--n-splats", type=int, default=20000)
    ap.add_argument("--motion", type=float, default=0.018)
    ap.add_argument("--seed", type=int, default=0)
    # photometric nuisances (raytrace only): the real-sensor robustness
    # proxy — see gslam_tpu/io/raytrace.py
    ap.add_argument("--noise-std", type=float, default=0.0)
    ap.add_argument("--exposure-drift", type=float, default=0.0)
    ap.add_argument("--blur-px", type=float, default=0.0)
    args = ap.parse_args()

    import numpy as np

    from gslam_tpu.io.npz import save_dataset_npz

    kw = dict(seq_len=args.seq_len, width=args.width, height=args.height,
              motion_scale=args.motion, seed=args.seed)
    if args.scene == "synthetic":
        from gslam_tpu.io.synthetic import SyntheticDataset

        ds = SyntheticDataset(n_splats=args.n_splats, **kw)
    else:
        from gslam_tpu.io.raytrace import RaytracedDataset

        ds = RaytracedDataset(noise_std=args.noise_std,
                              exposure_drift=args.exposure_drift,
                              blur_px=args.blur_px, **kw)
    save_dataset_npz(ds, args.out)
    t = np.stack([np.asarray(f.gt_pose) for f in iter(ds)])
    ctrs = np.stack([-m[:3, :3].T @ m[:3, 3] for m in t])
    d = np.linalg.norm(np.diff(ctrs, axis=0), axis=1)
    print(f"saved {args.out}: {args.scene} {args.seq_len}f "
          f"{args.width}x{args.height} median step {100 * np.median(d):.2f}cm "
          f"max {100 * d.max():.2f}cm path {d.sum():.2f}m")


if __name__ == "__main__":
    main()
