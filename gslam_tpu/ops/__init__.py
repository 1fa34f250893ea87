from gslam_tpu.ops.projection import project_gaussians, ProjectionOutput  # noqa: F401
from gslam_tpu.ops.rasterize import (  # noqa: F401
    render,
    RenderConfig,
    RenderOutput,
)
