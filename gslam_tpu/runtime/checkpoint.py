"""Checkpoint save/load: splat map snapshots and full resumable state.

The reference torch.save's the whole nn.Module every 30 frames with no
resume path (/root/reference/gslam/frontend.py:495-498, backend.py:897-899).
Here there are two levels, both plain .npz pytrees (portable, no pickle
code execution):

  * `save_map` / `load_map`     — the splat buffer only (what view.py
    consumes, the reference's `splats.ckpt` equivalent).
  * `save_checkpoint` / `restore_system` — everything a mid-run resume
    needs: splat buffer, Adam moments, the keyframe store (incl. images),
    pose-optimizer state, pose graph, and both actors' frame trajectories.
    `python main.py --resume ckpt.npz` continues where the run stopped.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from gslam_tpu.mapping.gaussians import GaussianMap


def save_map(path, gmap: GaussianMap, extra: dict | None = None):
    """Splat-buffer-only snapshot (+ optional named extra arrays)."""
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


# ---------------- full resumable checkpoints ----------------


def _frames_to_arrays(frames, prefix):
    """Pack stripped Frame trajectory state into arrays."""
    n = len(frames)
    eye = np.eye(4, dtype=np.float32)
    out = {
        f"{prefix}/index": np.asarray([f.index for f in frames], np.int64),
        f"{prefix}/timestamp": np.asarray(
            [f.timestamp if f.timestamp is not None else 0.0 for f in frames],
            np.float64,
        ),
        f"{prefix}/est_pose": np.stack(
            [np.asarray(f.est_pose, np.float32) if f.est_pose is not None
             else eye for f in frames]
        ) if n else np.zeros((0, 4, 4), np.float32),
        f"{prefix}/has_est": np.asarray(
            [f.est_pose is not None for f in frames], bool
        ),
        f"{prefix}/gt_pose": np.stack(
            [np.asarray(f.gt_pose, np.float32) if f.gt_pose is not None
             else eye for f in frames]
        ) if n else np.zeros((0, 4, 4), np.float32),
        f"{prefix}/has_gt": np.asarray(
            [f.gt_pose is not None for f in frames], bool
        ),
        f"{prefix}/exposure": np.stack(
            [np.asarray(f.exposure, np.float32) if f.exposure is not None
             else np.zeros(2, np.float32) for f in frames]
        ) if n else np.zeros((0, 2), np.float32),
    }
    return out


def _frames_from_arrays(data, prefix, camera):
    from gslam_tpu.io.frames import Frame

    n = len(data[f"{prefix}/index"])
    frames = []
    for i in range(n):
        frames.append(Frame(
            image=None,
            timestamp=float(data[f"{prefix}/timestamp"][i]),
            camera=camera,
            index=int(data[f"{prefix}/index"][i]),
            gt_pose=(data[f"{prefix}/gt_pose"][i]
                     if data[f"{prefix}/has_gt"][i] else None),
            est_pose=(data[f"{prefix}/est_pose"][i]
                      if data[f"{prefix}/has_est"][i] else None),
            exposure=data[f"{prefix}/exposure"][i],
        ))
    return frames


def save_checkpoint(path, system):
    """Serialize a SlamSystem mid-run: map + optimizer + keyframes + poses +
    trajectories. Everything needed so `restore_system` can continue."""
    be, fe = system.backend, system.frontend
    arrays = {}
    arrays.update(
        {f"gmap/{k}": np.asarray(v) for k, v in be.gmap._asdict().items()}
    )
    for f, v in be.opt_state.mu.items():
        arrays[f"adam_mu/{f}"] = np.asarray(v)
    for f, v in be.opt_state.nu.items():
        arrays[f"adam_nu/{f}"] = np.asarray(v)
    arrays["adam/count"] = np.asarray(be.opt_state.count)
    arrays.update(
        {f"kf/{k}": np.asarray(v) for k, v in be.kf._asdict().items()}
    )
    arrays.update({
        "pose_opt/mu": np.asarray(be.pose_opt.mu),
        "pose_opt/nu": np.asarray(be.pose_opt.nu),
        "pose_opt/count": np.asarray(be.pose_opt.count),
        "rng/key": np.asarray(be.key),
        "K": np.asarray(be.K),
    })
    arrays.update(_frames_to_arrays(be.frames, "be_frames"))
    arrays.update(_frames_to_arrays(fe.frames, "fe_frames"))
    arrays["fe/track_times"] = np.asarray(fe.track_times, np.float64)
    arrays["fe/losses"] = np.asarray(fe.losses, np.float64)

    meta = {
        "kf_order": be.kf_order,
        "kf_frame_idx": {str(k): v for k, v in be.kf_frame_idx.items()},
        "pose_graph": {str(k): sorted(v) for k, v in be.pose_graph.items()},
        "total_step": be.total_step,
        "pause_map_optim": be.pause_map_optim,
        "n_keyframes_added": system.n_keyframes_added,
        "width": system.width,
        "height": system.height,
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def restore_system(path, system):
    """Restore a SlamSystem saved by `save_checkpoint`; returns the next
    frame index to process (all earlier dataset frames are already done)."""
    from gslam_tpu.mapping.backend_ops import PoseAdamState
    from gslam_tpu.mapping.optimizer import MaskedAdamState

    data = np.load(path, allow_pickle=False)
    be, fe = system.backend, system.frontend
    meta = json.loads(bytes(data["meta_json"]).decode())

    gmap_fields = {
        k.split("/", 1)[1]: jnp.asarray(v)
        for k, v in data.items() if k.startswith("gmap/")
    }
    be.gmap = GaussianMap(**gmap_fields)
    # The checkpointed buffer may have grown beyond the configured capacity;
    # keep the actor's bookkeeping consistent or _maybe_grow computes a
    # new_cap smaller than the restored buffer and grow_map raises.
    be.capacity = be.gmap.capacity
    mu = {k.split("/", 1)[1]: jnp.asarray(v)
          for k, v in data.items() if k.startswith("adam_mu/")}
    nu = {k.split("/", 1)[1]: jnp.asarray(v)
          for k, v in data.items() if k.startswith("adam_nu/")}
    be.opt_state = MaskedAdamState(
        mu=mu, nu=nu, count=jnp.asarray(data["adam/count"])
    )
    kf_fields = {
        k.split("/", 1)[1]: jnp.asarray(v)
        for k, v in data.items() if k.startswith("kf/")
    }
    be.kf = type(be.kf)(**kf_fields)
    be.kf_capacity = be.kf.capacity
    be.pose_opt = PoseAdamState(
        mu=jnp.asarray(data["pose_opt/mu"]),
        nu=jnp.asarray(data["pose_opt/nu"]),
        count=jnp.asarray(data["pose_opt/count"]),
    )
    be.key = jnp.asarray(data["rng/key"])  # PRNGKey is a uint32 pair
    be.K = jnp.asarray(data["K"])
    be.kf_order = [int(s) for s in meta["kf_order"]]
    be.kf_frame_idx = {int(k): int(v) for k, v in meta["kf_frame_idx"].items()}
    be.frame_slot = {v: k for k, v in be.kf_frame_idx.items()}
    be.pose_graph = {
        int(k): set(v) for k, v in meta["pose_graph"].items()
    }
    be.total_step = int(meta["total_step"])
    be.pause_map_optim = bool(meta["pause_map_optim"])
    system.n_keyframes_added = int(meta["n_keyframes_added"])

    # camera only needed for Frame records; reuse a keyframe camera-free stub
    from gslam_tpu.core.camera import Camera

    cam = Camera(K=np.asarray(data["K"]),
                 width=int(meta["width"]), height=int(meta["height"]))
    be.frames = _frames_from_arrays(data, "be_frames", cam)
    fe.frames = _frames_from_arrays(data, "fe_frames", cam)
    fe.track_times = [float(t) for t in data["fe/track_times"]]
    fe.losses = [float(x) for x in data["fe/losses"]]

    # regenerate the frontend's synced snapshot from the restored map
    be._refresh_sync_payload()
    fe.apply_sync(be.sync_payload())
    next_index = (max(f.index for f in fe.frames) + 1) if fe.frames else 0
    system.start_index = next_index
    return next_index


# ---------------- fused-runtime checkpoints ----------------


def save_fused_checkpoint(path, state, frames_meta):
    """Snapshot the fused runtime: every FusedState leaf (device pytree,
    flattened in deterministic NamedTuple order) plus the host-side frame
    metadata (index, timestamp, gt pose). The npz is self-describing
    enough for `load_fused_checkpoint` to rebuild the state on any
    backend; resume via `FusedSlam.run(..., resume_from=path)`.

    Reference parity: the reference torch.save's the module with no
    resume path (/root/reference/gslam/backend.py:897-899); this is the
    fused-runtime counterpart of `save_checkpoint` above."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # leaves are keyed by their pytree PATH (e.g. "leaf/.gmap.means"), not
    # position: adding a FusedState field must turn a stale checkpoint
    # into a "field missing" message naming the field, not a positional
    # shape mismatch blamed on the wrong leaf (ADVICE r4)
    path_leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {
        "leaf/" + jax.tree_util.keystr(kp): np.asarray(v)
        for kp, v in path_leaves
    }
    arrays["meta/format"] = np.asarray(2, np.int64)
    n = len(frames_meta)
    arrays["meta/indices"] = np.asarray(
        [m[0] for m in frames_meta], np.int64)
    arrays["meta/timestamps"] = np.asarray(
        [m[1] if m[1] is not None else 0.0 for m in frames_meta], np.float64)
    gt = np.full((n, 4, 4), np.nan, np.float32)
    for i, m in enumerate(frames_meta):
        if m[2] is not None:
            gt[i] = np.asarray(m[2], np.float32)
    arrays["meta/gt_poses"] = gt
    arrays["meta/shape"] = np.asarray(
        [state.gmap.capacity, state.kf.capacity,
         state.kf.images.shape[1], state.kf.images.shape[2],
         state.traj.shape[0]], np.int64)
    np.savez_compressed(path, **arrays)


def load_fused_checkpoint(path, cfg, seed: int = 0):
    """Rebuild (FusedState, frames_meta) from `save_fused_checkpoint`
    output. `cfg` must describe the same run (max_frames, PGO setting,
    ...): the state template it produces must match the snapshot leaf for
    leaf, and any mismatch raises with the offending leaf index."""
    from gslam_tpu.runtime.fused import init_fused_state

    data = np.load(Path(path), allow_pickle=False)
    cap, kf_cap, height, width, max_frames = (
        int(x) for x in data["meta/shape"])
    if max_frames != cfg.max_frames:
        raise ValueError(
            f"checkpoint was taken with max_frames={max_frames} but the "
            f"config says {cfg.max_frames}; trajectory buffers would not "
            "line up — pass --max-frames to match")
    if "meta/format" not in data:
        raise ValueError(
            "checkpoint predates the r5 state-format change (leaves were "
            "keyed by position, which silently misloads across FusedState "
            "field additions) — re-create it with this version")
    fmt = int(data["meta/format"])
    if fmt != 2:
        raise ValueError(f"unknown fused checkpoint format {fmt}")
    template = init_fused_state(cfg, cap, kf_cap, height, width, seed)
    path_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    saved = {k for k in data.files if k.startswith("leaf/")}
    want = {"leaf/" + jax.tree_util.keystr(kp) for kp, _ in path_leaves}
    if saved != want:
        missing = sorted(want - saved)
        extra = sorted(saved - want)
        raise ValueError(
            "checkpoint/state field mismatch — saved with a different "
            f"config or code version (missing: {missing[:5]}, "
            f"unexpected: {extra[:5]})")
    leaves = []
    for kp, tmpl in path_leaves:
        key = "leaf/" + jax.tree_util.keystr(kp)
        v = data[key]
        if tuple(v.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"{key}: checkpoint shape {v.shape} != template "
                f"{np.shape(tmpl)} — config mismatch")
        leaves.append(jnp.asarray(v, dtype=tmpl.dtype))
    state = jax.tree_util.tree_unflatten(treedef, leaves)

    gt = data["meta/gt_poses"]
    frames_meta = [
        (int(data["meta/indices"][i]), float(data["meta/timestamps"][i]),
         None if np.isnan(gt[i]).any() else gt[i])
        for i in range(len(data["meta/indices"]))
    ]
    return state, frames_meta
