from gslam_tpu.core.transforms import (  # noqa: F401
    rotation_6d_to_matrix,
    matrix_to_quaternion,
    quaternion_to_matrix,
    se3_exp,
    so3_exp,
    so3_log,
    PoseDelta,
    pose_matrix,
    identity_pose_delta,
)
from gslam_tpu.core.camera import Camera, backproject, pixel_grid  # noqa: F401
