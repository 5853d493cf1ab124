"""One-pass table profiling — per-column completeness / cardinality /
distribution stats in a SINGLE scan (the DESCRIBE-on-steroids every
analytics engine ships; the first query anyone runs on a new 100 TB
table).

All metrics ride ONE ``df.agg(...)``: count, null count,
approx_count_distinct (HLL, fixed-size sketch), min/max, and for
numeric columns mean + approx quantiles (fixed-size GK sketch). Every
aggregate is map-side combinable, so the cost is one scan regardless of
table size — never one job per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    rsd: float = 0.05,
) -> DataFrame:
    """Long-format profile: one row per (column, metric) with a DOUBLE
    ``value`` and a STRING ``text_value`` (min/max of non-numeric
    columns land in ``text_value``; numeric metrics fill both).

    Metrics: ``count`` (non-null), ``nulls``, ``approx_distinct``
    (relative error ``rsd``), ``min``/``max``, and for numeric columns
    ``mean`` plus ``q<p>`` per requested quantile. ONE aggregation —
    profile cost is a single scan however many columns ride along."""
    if cols is None:
        cols = df.columns
    if not cols:
        raise ValueError("no columns to profile")
    total = F.count(F.lit(1))
    aggs, layout = [total.alias("_total")], []
    for c in cols:
        dt = df.schema[c].dataType
        numeric = isinstance(dt, _NUMERIC)
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_{c}_count"))
        aggs.append(
            F.approx_count_distinct(col, rsd).alias(f"_{c}_distinct")
        )
        aggs.append(F.min(col).alias(f"_{c}_min"))
        aggs.append(F.max(col).alias(f"_{c}_max"))
        metrics = ["count", "nulls", "approx_distinct", "min", "max"]
        if numeric:
            aggs.append(F.avg(col).alias(f"_{c}_mean"))
            aggs.append(
                F.percentile_approx(
                    col, list(quantiles), 10_000
                ).alias(f"_{c}_q")
            )
            metrics += ["mean"] + [f"q{p}" for p in quantiles]
        layout.append((c, numeric, metrics))
    row = df.agg(*aggs).collect()[0]

    out = []
    for c, numeric, metrics in layout:
        for m in metrics:
            if m == "count":
                v, tv = float(row[f"_{c}_count"]), None
            elif m == "nulls":
                v, tv = float(row["_total"] - row[f"_{c}_count"]), None
            elif m == "approx_distinct":
                v, tv = float(row[f"_{c}_distinct"]), None
            elif m in ("min", "max"):
                raw = row[f"_{c}_{m}"]
                v = float(raw) if numeric and raw is not None else None
                tv = None if raw is None else str(raw)
            elif m == "mean":
                raw = row[f"_{c}_mean"]
                v = None if raw is None else float(raw)
                tv = None if v is None else str(v)
            else:  # q<p>
                qs = row[f"_{c}_q"]
                idx = [f"q{p}" for p in quantiles].index(m)
                v = None if qs is None else float(qs[idx])
                tv = None if v is None else str(v)
            out.append((c, m, v, tv))
    return df.sparkSession.createDataFrame(
        out, "column string, metric string, value double, text_value string"
    )
