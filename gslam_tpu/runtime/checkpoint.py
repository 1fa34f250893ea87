"""Checkpoint save/load for the splat map and trajectory state.

The reference torch.save's the whole nn.Module every 30 frames with no
resume path (/root/reference/gslam/frontend.py:495-498, backend.py:897-899).
Here checkpoints are plain .npz pytrees (portable, no pickle code
execution) and include enough state to resume mapping: splat buffer, Adam
moments, keyframe poses, and frame trajectory.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from gslam_tpu.mapping.gaussians import GaussianMap


def save_map(path, gmap: GaussianMap, extra: dict | None = None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f"gmap/{k}": np.asarray(v) for k, v in gmap._asdict().items()}
    if extra:
        for k, v in extra.items():
            arrays[f"extra/{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path) -> tuple[GaussianMap, dict]:
    data = np.load(path, allow_pickle=False)
    fields = {
        k.split("/", 1)[1]: jnp.asarray(v)
        for k, v in data.items()
        if k.startswith("gmap/")
    }
    extra = {
        k.split("/", 1)[1]: v for k, v in data.items() if k.startswith("extra/")
    }
    return GaussianMap(**fields), extra
