"""Vectorized (pandas/Arrow) scalar function kernels — the Python side of
the pipeline's single mapInPandas exchange, testable without Spark."""
