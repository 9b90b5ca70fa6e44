"""Scalar / vectorized functions: cleaning, text analysis, hashing."""
