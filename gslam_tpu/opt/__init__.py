from gslam_tpu.opt.lbfgs import lbfgs, LbfgsResult  # noqa: F401
