#!/usr/bin/env python3
"""Test the slam_scan chunked path on chip with per-chunk readbacks."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    # usage: debug_fused_scan.py [chunk] [n_frames] [mapping_loop] [backend]
    # variant matrix for the scan fault (docs/PERF.md): mapping_loop
    # 'fori' removes the while_loop nested under scan; backend 'jnp'
    # removes Pallas from the program.
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mapping_loop = sys.argv[3] if len(sys.argv) > 3 else "while"
    backend = sys.argv[4] if len(sys.argv) > 4 else "auto"
    # 5th arg: 'scan' (lax.scan chunk) or 'unroll' (trace-time unrolled
    # chunk, no scan nesting — the axon-safe candidate).
    chunk_backend = sys.argv[5] if len(sys.argv) > 5 else "scan"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.io.synthetic import SyntheticDataset
    from gslam_tpu.mapping.backend_ops import MapConfig
    from gslam_tpu.ops.rasterize import RenderConfig
    from gslam_tpu.tracking.track import TrackingConfig
    from gslam_tpu.runtime.fused import (
        FusedConfig, init_fused_state, slam_chunk_unrolled, slam_scan,
    )

    W, H = 320, 240
    rcfg = RenderConfig(backend=backend)
    cfg = FusedConfig(
        tracking=TrackingConfig(render=rcfg),
        mapping=MapConfig(render=rcfg, num_iters_init=50),
        max_frames=max(n_frames, 8), init_n_new=2000, kf_n_new=100,
        idle_iters=5, mapping_loop=mapping_loop,
    )
    ds = SyntheticDataset(seq_len=n_frames, width=W, height=H, n_splats=4000,
                          seed=1, motion_scale=0.02)
    state = init_fused_state(cfg, 16384, 16, H, W, 0)
    K = jnp.asarray(ds.camera.K, jnp.float32)
    print(f"device: {jax.devices()[0]} chunk={chunk} "
          f"loop={mapping_loop} backend={backend} "
          f"chunk_backend={chunk_backend}", flush=True)
    chunk_fn = slam_chunk_unrolled if chunk_backend == "unroll" else slam_scan

    frames = list(iter(ds))
    for c0 in range(0, n_frames, chunk):
        batch = frames[c0:c0 + chunk]
        imgs = jnp.asarray(
            np.stack([np.asarray(f.image, np.float32) for f in batch]))
        deps = jnp.zeros((len(batch), H, W), jnp.float32)
        t0 = time.time()
        state = chunk_fn(state, imgs, deps, K, W, H, cfg)
        fc = int(state.frame_count)  # per-chunk readback: bounded backlog
        print(f"chunk @{c0}: frame_count={fc} ({time.time()-t0:.1f}s)",
              flush=True)

    print("n_live:", int(state.gmap.n_live()),
          "kf:", int(state.kf_count), flush=True)
    tl = np.asarray(state.track_losses[:n_frames])
    print("mean track loss:", float(tl[1:].mean()), flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
