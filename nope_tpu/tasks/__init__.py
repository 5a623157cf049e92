"""Task layer: pose-conditional model logic, losses and metrics."""
