from gslam_tpu.eval.trajectory import (  # noqa: F401
    kabsch_umeyama, ate_mean, ate_rmse, align_trajectory,
)
from gslam_tpu.eval.metrics import psnr, eval_metrics  # noqa: F401
