"""Training subsystem: states, steps, checkpointing, metrics, loops."""
