"""Structured Streaming flavor of the pipeline."""
