"""Structured Streaming surface: streaming model scoring."""
