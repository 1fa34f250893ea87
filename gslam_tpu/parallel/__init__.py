from gslam_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, camera_dp_shardings, dp_mapping_train_step,
)
