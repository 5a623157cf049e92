"""Training: optimizer schedule, jitted train step, checkpointing, port."""
