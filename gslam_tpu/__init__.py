"""gslam_tpu — TPU-native Gaussian-splatting SLAM.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA SLAM stack (abhigyan7/gslam): monocular (optionally RGB-D) SLAM via 3D
Gaussian splatting, with a tracking frontend (differentiable-rendering pose
optimization) and a mapping backend (keyframe map optimization with
insertion/pruning and a covisibility pose graph).

Design principles (TPU-first, not a port):
  * All per-splat state lives in fixed-capacity pytrees-of-arrays with a live
    mask; insertion/pruning are in-place scatter/mask updates, never reshapes,
    so jitted steps never retrace.
  * The rasterizer is tile-based: XLA lexicographic sort for tile binning,
    and alpha compositing expressed as log-space cumulative sums plus an MXU
    matmul over (pixels x splats) weight matrices — no atomics, no
    per-pixel serial loops.
  * Optimization loops (Adam warm-up + L-BFGS with strong-Wolfe line search)
    run fully inside jit via lax.while_loop / lax.scan.
  * Multi-device scaling uses jax.sharding.Mesh + NamedSharding (camera-axis
    data parallelism for mapping, tile-axis parallelism for rendering); XLA
    inserts the collectives.
"""

__version__ = "0.1.0"

import os as _os

# The axon TPU plugin force-selects itself regardless of the JAX_PLATFORMS
# env var; re-assert the user's explicit choice at import time so
# `JAX_PLATFORMS=cpu python main.py ...` actually runs on CPU (tests do the
# same in tests/conftest.py).
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms:
    import jax as _jax

    _jax.config.update("jax_platforms", _env_platforms)
