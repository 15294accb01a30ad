"""map_batches stages of the CDC replay pipeline (all zero-copy Arrow)."""
