"""Offline data generation (BlenderProc rendering pipeline)."""
