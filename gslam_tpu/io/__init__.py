from gslam_tpu.io.frames import Frame  # noqa: F401
from gslam_tpu.io.synthetic import SyntheticDataset  # noqa: F401
from gslam_tpu.io.tum import TumRGBDataset  # noqa: F401
from gslam_tpu.io.replica import ReplicaDataset  # noqa: F401
from gslam_tpu.io.stream import SensorStream  # noqa: F401


def build_dataset(name: str, scene, seq_len: int = -1, **kw):
    """Dataset factory mirroring the reference CLI choices
    (/root/reference/main.py:28-36) plus 'synthetic'."""
    if name == "tum":
        return TumRGBDataset(scene, seq_len)
    if name == "replica":
        return ReplicaDataset(scene, seq_len)
    if name == "synthetic":
        return SyntheticDataset(seq_len=seq_len if seq_len > 0 else 30, **kw)
    if name == "raytrace":
        from gslam_tpu.io.raytrace import RaytracedDataset

        return RaytracedDataset(seq_len=seq_len if seq_len > 0 else 30, **kw)
    if name == "npz":
        from gslam_tpu.io.npz import NpzDataset

        return NpzDataset(scene, seq_len)
    if name == "video":
        from gslam_tpu.io.video import VideoDataset

        return VideoDataset(scene, **kw)
    if name == "oak":
        from gslam_tpu.io.oakd import OakdSensor

        return OakdSensor(**kw)
    raise ValueError(f"unknown dataset '{name}'")
