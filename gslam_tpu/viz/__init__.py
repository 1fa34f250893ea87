from gslam_tpu.viz.visualization import (  # noqa: F401
    TelemetrySink, RerunSink, NullSink, false_colormap, make_sink,
)
