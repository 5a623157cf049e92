"""Command-line entry points: train, test_shapenet."""
