from gslam_tpu.runtime.messages import FrontendMessage, BackendMessage  # noqa: F401
from gslam_tpu.runtime.system import SlamSystem, SlamConfig  # noqa: F401
