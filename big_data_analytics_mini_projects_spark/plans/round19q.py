"""Round-11 fresh batch (under construction)."""
