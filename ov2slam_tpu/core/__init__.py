from ov2slam_tpu.core import lie  # noqa: F401
from ov2slam_tpu.core import camera  # noqa: F401
