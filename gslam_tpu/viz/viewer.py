"""Interactive viewer (viser-gated).

Counterpart of the reference's viser/nerfview viewer
(/root/reference/gslam/viewer.py, view.py): per-client render threads with
pause/resume and a render-target selector (rgb | n_touched | depth). viser
isn't in this image, so construction raises a clear error unless the SDK is
importable; the offline orbit renderer in view.py is the always-available
path.
"""

from __future__ import annotations

import numpy as np


class ViewerState:
    def __init__(self):
        self.paused = False
        self.target_type = "rgb"  # rgb | n_touched | depth


def serve_viewer(gmap, width=640, height=480, port=8080, map_config=None):
    try:
        import viser
    except ImportError as e:  # pragma: no cover - viser not in image
        raise RuntimeError(
            "viser is not installed in this environment; use "
            "`python view.py <ckpt> --out dir` for offline orbit renders"
        ) from e

    import jax.numpy as jnp
    from gslam_tpu.mapping.backend_ops import MapConfig, render_view_stats
    from gslam_tpu.viz.visualization import false_colormap

    cfg = map_config or MapConfig()
    state = ViewerState()
    server = viser.ViserServer(port=port, verbose=False)

    with server.gui.add_folder("gslam_tpu"):
        pause_btn = server.gui.add_button("pause/resume")
        target = server.gui.add_dropdown(
            "target", options=("rgb", "n_touched", "depth"), initial_value="rgb"
        )

    @pause_btn.on_click
    def _(_):
        state.paused = not state.paused

    @target.on_update
    def _(_):
        state.target_type = target.value

    @server.on_client_connect
    def _(client: "viser.ClientHandle"):
        import threading
        import time

        def loop():
            while True:
                if state.paused:
                    time.sleep(0.1)
                    continue
                cam = client.camera
                c2w = np.eye(4, dtype=np.float32)
                import scipy.spatial.transform as sst

                c2w[:3, :3] = sst.Rotation.from_quat(np.roll(cam.wxyz, -1)).as_matrix()
                c2w[:3, 3] = cam.position
                w2c = np.linalg.inv(c2w)
                fy = height / (2.0 * np.tan(cam.fov / 2.0))
                K = jnp.asarray(np.array(
                    [[fy, 0, width / 2], [0, fy, height / 2], [0, 0, 1]],
                    np.float32,
                ))
                vs = render_view_stats(
                    gmap, jnp.asarray(w2c), K, width, height, cfg
                )
                if state.target_type == "rgb":
                    img = np.uint8(np.clip(np.asarray(vs.rgb), 0, 1) * 255)
                elif state.target_type == "depth":
                    img = false_colormap(np.asarray(vs.depth))
                else:
                    # Per-pixel n_touched visualization: re-render with each
                    # splat's color set to its normalized touch count, so the
                    # blended image shows which regions are dominated by
                    # widely-visible splats. (The reference's own n_touched
                    # target at backend.py:184-187 tiles a per-splat vector
                    # and never forms a valid image; this is the intent.)
                    from gslam_tpu.ops.rasterize import render as _render

                    nt = jnp.asarray(vs.n_touched).astype(jnp.float32)
                    norm = jnp.clip(nt / jnp.maximum(nt.max(), 1.0), 1e-4, 1 - 1e-4)
                    fake_colors = jnp.log(norm / (1.0 - norm))  # logit
                    out = _render(
                        **{
                            **gmap.render_kwargs(),
                            "logit_colors": jnp.tile(
                                fake_colors[:, None], (1, 3)
                            ),
                        },
                        viewmats=jnp.asarray(w2c)[None], Ks=K[None],
                        width=width, height=height, cfg=cfg.render,
                    )
                    img = false_colormap(np.asarray(out.rgb[0, :, :, 0]))
                client.scene.set_background_image(img, format="jpeg")
                time.sleep(0.05)

        threading.Thread(target=loop, daemon=True).start()

    print(f"viser viewer on port {port}; ctrl-c to stop")
    import time

    while True:
        time.sleep(1.0)
