"""Fixed-capacity device-resident keyframe store.

The reference keeps keyframes as a Python dict of Frame objects with
per-keyframe torch Parameters registered into a shared pose Adam
(/root/reference/gslam/backend.py:632-673). Here a keyframe is a row in a
pytree of fixed-shape arrays: images, (optional) ground-truth depth, the
learnable pose delta over a frozen base, exposure, and the latest estimated
depth map (used by the insertion occlusion filter, insertion.py:246-271).
Slot management is host-side; all tensors stay on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.transforms import PoseDelta, pose_matrix


class KeyframeStore(NamedTuple):
    images: jax.Array  # [K, H, W, 3]
    gt_depths: jax.Array  # [K, H, W] (zeros when not RGB-D)
    pose_base: jax.Array  # [K, 4, 4]
    d_rot6: jax.Array  # [K, 6] learnable
    d_t: jax.Array  # [K, 3] learnable
    exposures: jax.Array  # [K, 2] frozen (estimated by the frontend)
    est_depths: jax.Array  # [K, H, W] latest rendered depth per keyframe
    frame_idx: jax.Array  # [K] int32 source frame index (-1 = empty)
    mask: jax.Array  # [K] bool slot occupancy

    @property
    def capacity(self) -> int:
        return self.images.shape[0]

    def poses(self) -> jax.Array:
        """[K, 4, 4] current world-to-camera matrices."""
        return pose_matrix(PoseDelta(self.pose_base, self.d_rot6, self.d_t))


def empty_keyframes(capacity: int, height: int, width: int) -> KeyframeStore:
    return KeyframeStore(
        images=jnp.zeros((capacity, height, width, 3), jnp.float32),
        gt_depths=jnp.zeros((capacity, height, width), jnp.float32),
        pose_base=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
        d_rot6=jnp.zeros((capacity, 6), jnp.float32),
        d_t=jnp.zeros((capacity, 3), jnp.float32),
        exposures=jnp.zeros((capacity, 2), jnp.float32),
        est_depths=jnp.zeros((capacity, height, width), jnp.float32),
        frame_idx=jnp.full((capacity,), -1, jnp.int32),
        mask=jnp.zeros((capacity,), bool),
    )


def add_keyframe(
    store: KeyframeStore,
    slot: int,
    image: jax.Array,
    pose: jax.Array,
    exposure: jax.Array,
    frame_index: int,
    gt_depth: jax.Array | None = None,
    est_depth: jax.Array | None = None,
) -> KeyframeStore:
    """Write a keyframe into `slot` (host-chosen), resetting its pose delta."""
    s = store._replace(
        images=store.images.at[slot].set(image),
        pose_base=store.pose_base.at[slot].set(pose),
        d_rot6=store.d_rot6.at[slot].set(0.0),
        d_t=store.d_t.at[slot].set(0.0),
        exposures=store.exposures.at[slot].set(exposure),
        frame_idx=store.frame_idx.at[slot].set(frame_index),
        mask=store.mask.at[slot].set(True),
    )
    if gt_depth is not None:
        s = s._replace(gt_depths=s.gt_depths.at[slot].set(gt_depth))
    if est_depth is not None:
        s = s._replace(est_depths=s.est_depths.at[slot].set(est_depth))
    return s
