"""Evaluation harnesses: geodesic accuracy and BOP VSD recall."""

from nope_tpu.evaluation.geodesic import (  # noqa: F401
    evaluate_geodesic,
    evaluate_geodesic_full,
)
