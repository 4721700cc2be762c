"""Training: optax optimizers/schedules, pjit train step, Orbax checkpoints."""
