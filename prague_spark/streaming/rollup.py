"""Streaming twin of :func:`prague_spark.ops.rollup.time_rollup`.

A streaming rollup must keep per-bucket state evictable, and Spark only
guarantees watermark eviction when the grouping key is a ``window()`` /
``session_window()`` of the watermarked column — not an arbitrary
``date_trunc``. So the streaming twin runs ONE tumbling-window
aggregation per grain (each independently evictable) instead of the
batch operator's single-shuffle grain explode. Fixed-duration grains
only (second..day): epoch-aligned tumbling windows coincide exactly
with ``date_trunc`` for those, which the parity test pins; calendar
grains (week, month, ...) have no fixed duration and stay batch-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: fixed-duration grains a tumbling window can express (epoch-aligned,
#: so window.start == date_trunc(grain) — the batch-parity contract)
STREAM_GRAIN_DURATION = {
    "second": "1 second",
    "minute": "1 minute",
    "hour": "1 hour",
    "day": "1 day",
}


def time_rollup_stream(
    sdf: DataFrame,
    ts_col: str,
    grains: list[str] | tuple[str, ...] = ("hour", "day"),
    keys: list[str] | tuple[str, ...] = (),
    aggs: list[Column] | None = None,
    watermark: str = "1 hour",
) -> dict[str, DataFrame]:
    """Per-grain streaming rollup over a ``readStream`` frame: returns
    ``{grain: streaming DataFrame}`` with columns (grain, bucket,
    \\*keys, \\*agg aliases) matching the batch operator's output for
    that grain. Each frame carries its own watermark + tumbling-window
    aggregation, so each grain's state evicts at watermark horizon —
    O(active buckets x key cardinality), never O(stream)."""
    if aggs is None:
        aggs = [F.count("*").cast("bigint").alias("n")]
    out: dict[str, DataFrame] = {}
    for g in grains:
        if g not in STREAM_GRAIN_DURATION:
            raise ValueError(
                f"grain {g!r} has no fixed duration; streaming rollup "
                f"supports {sorted(STREAM_GRAIN_DURATION)} (calendar "
                "grains are batch-only)"
            )
        out[g] = (
            sdf.withWatermark(ts_col, watermark)
            .groupBy(
                F.window(ts_col, STREAM_GRAIN_DURATION[g]).alias("_w"),
                *[F.col(k) for k in keys],
            )
            .agg(*aggs)
            .select(
                F.lit(g).alias("grain"),
                F.col("_w.start").alias("bucket"),
                *[F.col(k) for k in keys],
                *[F.col(a) for a in _agg_names(aggs)],
            )
        )
    return out


def _agg_names(aggs: list[Column]) -> list[str]:
    # alias names of ready-made agg columns (jc.toString like "count(1) AS n")
    names = []
    for a in aggs:
        s = a._jc.toString()
        names.append(s.rsplit(" AS ", 1)[-1].strip("`") if " AS " in s else s)
    return names
