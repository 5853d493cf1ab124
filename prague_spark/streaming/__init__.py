"""Structured Streaming surface: stateless scoring, watermarked rolling
metrics, and custom stateful operators (applyInPandasWithState)."""

from .scoring import rolling_metric_stream, score_stream
from .stateful import running_stats_stream

__all__ = ["score_stream", "rolling_metric_stream", "running_stats_stream"]
