"""Structured Streaming wrappers for the parse→route→aggregate pipeline."""
