"""Hypertable-style time rollup — one pass, many grains.

The continuous-aggregate pattern from time-series stores: maintain the
same aggregate at several calendar resolutions (hour, day, week, ...)
so dashboards read the coarse grain and drill into the fine one. The
naive Spark translation is one groupBy per grain = one shuffle per
grain and as many scans of the fact table. This operator replicates
each row once per grain with a single ``explode`` over (grain,
date_trunc(grain, ts)) structs — exactly the row expansion GROUPING
SETS performs internally — so EVERY grain aggregates in ONE shuffle of
one scan. At 100 TB that is the difference between len(grains) passes
over the fact table and one; partial (map-side) aggregation still
applies per grain because the grain tag is part of the grouping key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: grains date_trunc understands, coarse to fine (validation only)
VALID_GRAINS = (
    "year", "quarter", "month", "week", "day", "hour", "minute", "second",
)


def time_rollup(
    df: DataFrame,
    ts_col: str,
    grains: list[str] | tuple[str, ...] = ("hour", "day"),
    keys: list[str] | tuple[str, ...] = (),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate ``df`` at every calendar grain in ``grains`` in one
    shuffle: output one row per (grain, bucket, \\*keys) with the given
    aggregate expressions (default ``count(*) AS n``).

    ``aggs`` are ready-made aliased aggregate Columns, e.g.
    ``[F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value")]``.

    Output columns: ``grain`` (string), ``bucket`` (truncated
    timestamp), then ``keys``, then one column per agg alias.
    """
    grains = list(grains)
    if not grains:
        raise ValueError("grains must be non-empty")
    for g in grains:
        if g not in VALID_GRAINS:
            raise ValueError(f"unknown grain {g!r}; pick from {VALID_GRAINS}")
    if aggs is None:
        aggs = [F.count("*").cast("bigint").alias("n")]

    g_struct = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(g).alias("grain"),
                    F.date_trunc(g, F.col(ts_col)).alias("bucket"),
                )
                for g in grains
            ]
        )
    ).alias("_g")
    expanded = df.select("*", g_struct)
    return (
        expanded.groupBy(
            F.col("_g.grain").alias("grain"),
            F.col("_g.bucket").alias("bucket"),
            *[F.col(k) for k in keys],
        )
        .agg(*aggs)
    )
