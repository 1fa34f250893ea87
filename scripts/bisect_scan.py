#!/usr/bin/env python3
"""Bisect the slam_scan TPU-worker fault (docs/PERF.md): run one chunked
scan dispatch under a named variant, in a fresh process per variant.

    python scripts/bisect_scan.py VARIANT [chunk] [n_frames]

Variants:
  base      — current production config (pallas blend, while_loop mapping)
  jnp       — XLA-only blend backend (no Pallas anywhere)
  fori      — static-trip-count mapping loop (cond-skipped body)
  fori_jnp  — both of the above
  notrack   — tracking disabled (prior only): isolates the L-BFGS while nest
  nomap     — zero mapping iterations: isolates the mapping while nest
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.io.synthetic import SyntheticDataset
    from gslam_tpu.mapping.backend_ops import MapConfig
    from gslam_tpu.ops.rasterize import RenderConfig
    from gslam_tpu.tracking.track import TrackingConfig
    from gslam_tpu.runtime.fused import (
        FusedConfig, init_fused_state, slam_scan,
    )

    backend = "jnp" if variant in ("jnp", "fori_jnp") else "auto"
    loop = "fori" if variant in ("fori", "fori_jnp") else "while"
    rcfg = RenderConfig(backend=backend)
    tcfg = TrackingConfig(render=rcfg)
    if variant == "notrack":
        tcfg = TrackingConfig(render=rcfg, warmup_steps=0, lbfgs_max_iter=0,
                              lbfgs_max_eval=1)
    idle = 0 if variant == "nomap" else 5
    init_iters = 1 if variant == "nomap" else 50
    cfg = FusedConfig(
        tracking=tcfg,
        mapping=MapConfig(render=rcfg, num_iters_init=init_iters),
        max_frames=max(n_frames, 8), init_n_new=2000, kf_n_new=100,
        idle_iters=idle, mapping_loop=loop,
    )
    ds = SyntheticDataset(seq_len=n_frames, width=320, height=240,
                          n_splats=4000, seed=1, motion_scale=0.02)
    state = init_fused_state(cfg, 16384, 16, 240, 320, 0)
    K = jnp.asarray(ds.camera.K, jnp.float32)
    print(f"device: {jax.devices()[0]} variant={variant} chunk={chunk}",
          flush=True)

    frames = list(iter(ds))
    for c0 in range(0, n_frames, chunk):
        batch = frames[c0:c0 + chunk]
        imgs = jnp.asarray(
            np.stack([np.asarray(f.image, np.float32) for f in batch]))
        deps = jnp.zeros((len(batch), 240, 320), jnp.float32)
        t0 = time.time()
        state = slam_scan(state, imgs, deps, K, 320, 240, cfg)
        fc = int(state.frame_count)  # readback forces execution of the chunk
        print(f"chunk @{c0}: frame_count={fc} ({time.time()-t0:.1f}s)",
              flush=True)

    print("n_live:", int(state.gmap.n_live()),
          "kf:", int(state.kf_count), flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
