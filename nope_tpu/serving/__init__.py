"""Serving: object registration + query pose estimation."""

from nope_tpu.serving.engine import PoseEstimator  # noqa: F401
