"""Engine (L5): training/eval loops, optimizers, checkpointing, logging."""
