"""Data pipeline (L2): datasets, pair lists, augmentation, padding."""
