"""Host-side frame record passed from sensors to the SLAM runtime.

Unlike the reference's Frame (a bag of CUDA tensors with a learnable pose
module attached, /root/reference/gslam/primitives.py:398-433), frames here
are plain numpy until the tracking step uploads them; estimated state
(pose, exposure) is filled in by the runtime as it flows through.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gslam_tpu.core.camera import Camera


@dataclasses.dataclass
class Frame:
    image: np.ndarray  # [H, W, 3] float32 in [0, 1]
    timestamp: float
    camera: Camera
    index: int
    gt_pose: np.ndarray | None = None  # [4, 4] world-to-camera? (see loaders)
    gt_depth: np.ndarray | None = None  # [H, W] float32 meters
    img_file: str | None = None
    # filled by the runtime:
    est_pose: np.ndarray | None = None  # [4, 4] world-to-camera
    exposure: np.ndarray | None = None  # [2]
    rejected: bool = False  # tracking guard fell back to the motion prior

    def strip(self) -> "Frame":
        """Drop image payloads, keep trajectory state (reference Frame.strip)."""
        return dataclasses.replace(self, image=None, gt_depth=None)
