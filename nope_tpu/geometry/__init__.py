"""Pose & geometry core: rotations, SO(3) grids, transforms, cropping."""

from nope_tpu.geometry import cropping, rotations, so3_grid, transforms  # noqa: F401
