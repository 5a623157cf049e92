"""Task layer: pose-conditional model logic, losses and metrics."""

from nope_tpu.tasks.metrics import GeodesicError  # noqa: F401
from nope_tpu.tasks.pose_conditional import (  # noqa: F401
    PoseConditionalTask,
    TaskConfig,
)
from nope_tpu.tasks.refinement import (  # noqa: F401
    make_pose_refiner,
    refine_pose,
)
