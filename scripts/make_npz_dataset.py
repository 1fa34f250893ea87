#!/usr/bin/env python3
"""Materialize a synthetic SLAM sequence into an .npz dataset cache.

Run under JAX_PLATFORMS=cpu so the TPU process that consumes the cache
never renders ground truth itself (see gslam_tpu/io/npz.py for why).

    JAX_PLATFORMS=cpu python scripts/make_npz_dataset.py OUT.npz \
        [seq_len] [width] [height] [n_splats] [motion_scale] [seed]
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    out = sys.argv[1]
    seq_len = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    height = int(sys.argv[4]) if len(sys.argv) > 4 else 240
    n_splats = int(sys.argv[5]) if len(sys.argv) > 5 else 20000
    motion = float(sys.argv[6]) if len(sys.argv) > 6 else 0.018
    seed = int(sys.argv[7]) if len(sys.argv) > 7 else 0

    import numpy as np

    from gslam_tpu.io.npz import save_dataset_npz
    from gslam_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(seq_len=seq_len, width=width, height=height,
                          n_splats=n_splats, motion_scale=motion, seed=seed)
    save_dataset_npz(ds, out)
    t = np.stack([np.asarray(f.gt_pose) for f in iter(ds)])
    ctrs = np.stack([-m[:3, :3].T @ m[:3, 3] for m in t])
    d = np.linalg.norm(np.diff(ctrs, axis=0), axis=1)
    print(f"saved {out}: {seq_len}f {width}x{height} "
          f"median step {100 * np.median(d):.2f}cm path {d.sum():.2f}m")


if __name__ == "__main__":
    main()
