"""Structured Streaming surface: streaming model scoring."""

from .scoring import rolling_metric_stream, score_stream

__all__ = ["score_stream", "rolling_metric_stream"]
