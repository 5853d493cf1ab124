"""Structured Streaming surface: stateless scoring, watermarked rolling
metrics, custom stateful operators (applyInPandasWithState), and
bounded-state streaming deduplication."""

from .dedup import (
    exact_dedup_stream,
    minhash_signature_expr,
    minhash_signatures_stream,
)
from .scoring import (
    predict_grouped_stream, rolling_metric_stream, score_stream,
)
from .stateful import running_stats_stream

__all__ = [
    "score_stream",
    "predict_grouped_stream",
    "rolling_metric_stream",
    "running_stats_stream",
    "exact_dedup_stream",
    "minhash_signature_expr",
    "minhash_signatures_stream",
]
