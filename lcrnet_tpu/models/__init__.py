"""Neural modules (L3) and the LCRNet model family (L4), in flax.linen."""
