"""Logical plans: the end-to-end parse→enrich→route→aggregate pipeline and
checkpoint/resume."""
