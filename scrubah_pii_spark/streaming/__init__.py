"""Structured Streaming variant of the pipeline."""
