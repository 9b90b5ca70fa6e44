"""Sources: file readers and the deterministic synthetic corpus generator."""
