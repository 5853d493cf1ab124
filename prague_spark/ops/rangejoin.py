"""Range (interval) join — point-in-interval matching Spark has no
shuffled operator for (beyond-reference extension; the temporal-analytics
companion to :mod:`prague_spark.ops.asof`).

Scale design: the naive formulation is a theta join
(``r.start <= l.ts AND l.ts <= r.end``), which Spark can only execute as
BroadcastNestedLoopJoin or a cartesian — quadratic and undistributable
the moment the interval side outgrows a broadcast. This implementation
never emits a range condition to the planner: both sides are mapped onto
fixed-width time BUCKETS — each point falls in exactly ONE bucket, each
interval EXPLODES over the buckets it covers — and the join becomes a
plain hash equi-join on (by-keys, bucket) followed by the exact
point-in-interval filter. Cost is one explode (fan-out = interval span /
bucket width, guarded) + one shuffled equi-join; each qualifying (point,
interval) pair is produced exactly once (the point's single bucket), so
no distinct pass is needed. At 100 TB this is the standard interval-join
decomposition every streaming/temporal engine uses: linear, skew-safe
(bucket keys spread hot intervals), AQE-splittable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _is_ts(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, (T.TimestampType, T.TimestampNTZType))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    start: str,
    end: str,
    by: list[str] | str | None = None,
    bucket: float | None = None,
    suffix: str = "_r",
    max_fanout: int = 100_000,
) -> DataFrame:
    """Inner-join every left row to each right interval that contains it:
    ``right.start <= left.on <= right.end`` (both ends inclusive), with
    optional equality ``by`` keys required to match as well.

    ``on``/``start``/``end`` are either all timestamps or all numeric.
    ``bucket`` is the bucket width — SECONDS for timestamp columns, plain
    units for numeric ones. When omitted it is estimated as the median
    interval length (one extra aggregation over ``right``): that bounds
    the median interval's explode fan-out to ~2 buckets while keeping
    points-per-bucket low. Intervals spanning more than ``max_fanout``
    buckets fail fast with a clear error (JVM-side ``raise_error``)
    instead of silently materializing a huge explode — lower the guard
    or raise ``bucket`` deliberately for pathological spans.

    Right payload columns (everything except ``by``/``start``/``end``)
    come back suffixed; ``start``/``end`` themselves are returned as
    ``f"{start}{suffix}"`` / ``f"{end}{suffix}"``.
    """
    if isinstance(by, str):
        by = [by]
    by = list(by or [])

    ts = _is_ts(left, on)
    if ts != _is_ts(right, start) or ts != _is_ts(right, end):
        raise ValueError("on/start/end must be all timestamps or all numeric")

    def key(c: Column) -> Column:
        # .cast("timestamp"): parquet event times arrive as TIMESTAMP_NTZ,
        # which unix_micros does not accept directly
        return F.unix_micros(c.cast("timestamp")) if ts else c.cast("double")

    if bucket is None:
        row = right.agg(
            F.percentile_approx(key(F.col(end)) - key(F.col(start)), 0.5).alias("m")
        ).collect()[0]
        med = float(row["m"] or 0.0)
        bucket_n = max(med, 1.0)
    else:
        bucket_n = float(bucket) * (1_000_000.0 if ts else 1.0)
        if bucket_n <= 0:
            raise ValueError(f"bucket must be positive, got {bucket!r}")

    payload = [c for c in right.columns if c not in set(by) | {start, end}]
    r_named = right.select(
        *[F.col(c) for c in by],
        F.col(start).alias(f"{start}{suffix}"),
        F.col(end).alias(f"{end}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    ks = key(F.col(f"{start}{suffix}"))
    ke = key(F.col(f"{end}{suffix}"))
    b0 = F.floor(ks / bucket_n)
    b1 = F.floor(ke / bucket_n)
    span_guard = F.when(
        b1 - b0 > max_fanout,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans more than {max_fanout} "
                    f"buckets of width {bucket_n} - raise `bucket` or "
                    "`max_fanout` explicitly for intervals this long "
                    "(span buckets: "
                ),
                (b1 - b0).cast("string"),
                F.lit(")"),
            ),
            # cast OUTSIDE raise_error: the branch must be long-typed, but
            # casting the message string would trip CAST_INVALID_INPUT
            # (ANSI) or null the message (non-ANSI) before raise_error
            # ever sees it
        ).cast("long"),
    ).otherwise(b1)
    r_bkt = r_named.withColumn("_bkt", F.explode(F.sequence(b0, span_guard)))
    l_bkt = left.withColumn("_bkt", F.floor(key(F.col(on)) / bucket_n))

    cond = [l_bkt["_bkt"] == r_bkt["_bkt"]] + [
        l_bkt[c].eqNullSafe(r_bkt[c]) for c in by
    ]
    out = l_bkt.join(r_bkt, cond, "inner").filter(
        (key(F.col(f"{start}{suffix}")) <= key(l_bkt[on]))
        & (key(l_bkt[on]) <= key(F.col(f"{end}{suffix}")))
    )
    return out.select(
        *[l_bkt[c] for c in left.columns],
        F.col(f"{start}{suffix}"),
        F.col(f"{end}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in payload],
    )
