"""Streaming model scoring: apply a fitted SlopeModel to a stream.

The prediction operators in ``prague_spark.ops.predict`` are pure
projections (literal-coefficient expressions), so they apply unchanged to
streaming DataFrames — stateless, watermark-free, scales with source
parallelism. A windowed-aggregation scorer is included for monitoring
(e.g. rolling MSE over event-time windows with late-data watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..model import SlopeModel
from ..ops.predict import predict


def score_stream(
    stream_df: DataFrame,
    model: SlopeModel,
    type: str = "response",
    out: str = "pred",
) -> DataFrame:
    """Attach model predictions to a streaming DataFrame (stateless map)."""
    return predict(stream_df, model, type=type, out=out)


def predict_grouped_stream(
    stream_df: DataFrame,
    coefs: DataFrame,
    features,
    group_cols,
    **kwargs,
) -> DataFrame:
    """Per-SEGMENT model scoring on a stream: the
    :func:`prague_spark.ops.grouped.predict_grouped` broadcast
    coefficient-map join applies unchanged — the coefficient frame is a
    model-sized BATCH frame (fit offline by ``fit_grouped``), so the
    plan is a stateless stream-static broadcast join + codegen dot
    product per micro-batch; no watermark, no state store, scales with
    source parallelism. All families including the multinomial softmax
    (type='link'/'response'/'class') pass through."""
    from ..ops.grouped import predict_grouped

    if coefs.isStreaming:
        raise ValueError(
            "predict_grouped_stream: coefs must be a batch DataFrame "
            "(fit offline with fit_grouped); only the scored side streams"
        )
    return predict_grouped(stream_df, coefs, features, group_cols, **kwargs)


def rolling_metric_stream(
    stream_df: DataFrame,
    model: SlopeModel,
    label: str,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Rolling mean-squared-error per event-time window with a watermark
    for late data — the Structured Streaming idiom for model monitoring."""
    pred = predict(stream_df, model, type="response", out="_pred")
    err = F.col("_pred") - F.col(label).cast("double")
    return (
        pred.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.avg(err * err).alias("mse"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), "mse", "n")
    )


def quality_gate_stream(
    qf,
    id_col: str,
    text_col: str,
    sink,
    **score_kwargs,
):
    """Streaming twin of :func:`prague_spark.pipeline.quality_model
    .score_quality`: gate a document STREAM through a trained quality
    filter. The batch scorer's plan needs a groupBy(row) over the
    hashed-feature triplets (stateful on a raw stream), but the score is
    strictly PER-DOCUMENT — featurization, the optional l2 norm, and the
    sigmoid all close over one row — so micro-batch boundaries cannot
    change any document's score. The twin therefore runs the BATCH
    operator inside ``foreachBatch`` (the ``calendar_rollup_sink``
    convention): per-batch results are bit-identical to scoring the same
    rows in one batch job, which the parity test pins.

    Returns ``fn(batch_df, batch_id)`` for
    ``stream.writeStream.foreachBatch(fn)``; each invocation scores the
    micro-batch with the filter's own featurization config and passes
    the scored frame to ``sink(scored_df, batch_id)``. Train-corpus-
    dependent weightings were already rejected at TRAIN time, so a
    filter that exists can always score a stream."""
    from ..pipeline.quality_model import score_quality

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sink(score_quality(batch_df, qf, id_col, text_col, **score_kwargs),
             batch_id)

    return fn
