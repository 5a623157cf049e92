"""Evaluation harnesses: geodesic accuracy and BOP VSD recall."""
