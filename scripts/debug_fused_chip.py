#!/usr/bin/env python3
"""Isolate the fused-step TPU crash: run N slam_steps with an immediate
readback each, optionally with the jnp (non-Pallas) blend backend.

    python scripts/debug_fused_chip.py BACKEND [n] [capacity] [kf_cap]
                                       [init_iters] [idle_iters]

BACKEND: auto | jnp | notrack | noins
  auto/jnp  — blend backend choice (full step)
  notrack   — Pallas blend but tracking reduced to a single evaluation
              (isolates the L-BFGS while nest at scale)
  noins     — full tracking but minimal insertion sizes (isolates the
              scatter-insert + kNN path at scale)

Findings log (chip, 320x240, fresh process each):
  r3: 32768/16 init30 idle5  OK (7.6 s/step post-readback)
      65536/16 init30 idle5  CRASH at first readback (auto AND jnp)
      32768/16 init400 idle15 CRASH at first readback (per-dispatch
      time limit -> FusedConfig.init_iters_per_dispatch + slam_refine)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "auto"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    capacity = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    kf_cap = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    init_iters = int(sys.argv[5]) if len(sys.argv) > 5 else 30
    idle = int(sys.argv[6]) if len(sys.argv) > 6 else 5

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from gslam_tpu.io.synthetic import SyntheticDataset
    from gslam_tpu.mapping.backend_ops import MapConfig
    from gslam_tpu.ops.rasterize import RenderConfig
    from gslam_tpu.tracking.track import TrackingConfig
    from gslam_tpu.runtime.fused import (
        FusedConfig, init_fused_state, slam_step,
    )

    W, H = 320, 240
    rcfg = RenderConfig(backend="jnp" if backend == "jnp" else "auto")
    tcfg = TrackingConfig(render=rcfg)
    if backend == "notrack":
        tcfg = TrackingConfig(render=rcfg, warmup_steps=0, lbfgs_max_iter=1,
                              lbfgs_max_eval=2)
    init_n, kf_n = (50, 10) if backend == "noins" else (2000, 100)
    cfg = FusedConfig(
        tracking=tcfg,
        mapping=MapConfig(render=rcfg, num_iters_init=init_iters),
        max_frames=8, init_n_new=init_n, kf_n_new=kf_n, idle_iters=idle,
    )
    ds = SyntheticDataset(seq_len=n_steps, width=W, height=H, n_splats=4000,
                          seed=1, motion_scale=0.02)
    state = init_fused_state(cfg, capacity, kf_cap, H, W, 0)
    K = jnp.asarray(ds.camera.K, jnp.float32)
    zeros_d = jnp.zeros((H, W), jnp.float32)
    print(f"device: {jax.devices()[0]} backend={backend} cap={capacity} kf={kf_cap} init={init_iters} idle={idle}", flush=True)

    for i, frame in enumerate(iter(ds)):
        img = jnp.asarray(np.asarray(frame.image, np.float32))
        t0 = time.time()
        state = slam_step(state, img, zeros_d, K, W, H, cfg)
        # immediate readback: forces real execution of THIS step
        fc = int(state.frame_count)
        tl = float(state.track_losses[i])
        print(f"step {i}: frame_count={fc} track_loss={tl:.5f} "
              f"kf={bool(np.asarray(state.kf_flags[i]))} "
              f"({time.time()-t0:.1f}s)", flush=True)

    print("n_live:", int(state.gmap.n_live()), flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
