from gslam_tpu.tracking.track import TrackingConfig, track_frame, constant_motion_prior  # noqa: F401
