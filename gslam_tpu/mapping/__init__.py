from gslam_tpu.mapping.gaussians import GaussianMap  # noqa: F401
from gslam_tpu.mapping.optimizer import MaskedAdamState, init_adam, adam_step  # noqa: F401
