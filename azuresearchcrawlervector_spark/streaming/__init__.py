"""Structured Streaming variant of the page-processing stage."""
