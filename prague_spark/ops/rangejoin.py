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

Long-tail spans (two-level tiering): a single bucket width cannot serve
a mixed-span interval set — sized for the median, a p99.9 interval 10^4x
the median explodes into ~10^4 rows. When any interval spans more than
``coarse_span_buckets`` fine buckets, intervals are routed into TWO
width tiers: fine (median-sized buckets, short intervals) and coarse
(width = max_span / coarse_span_buckets, long intervals), and each
point probes both tiers (2 rows per point). Every join is still a pure
equi-join on (tier, bucket, by-keys); an interval lives in exactly one
tier so pairs are still produced exactly once; and the explode fan-out
is bounded by ~coarse_span_buckets + 1 PER INTERVAL for any span
distribution — no hand-tuning of ``bucket``/``max_fanout`` for
pathological tails. Homogeneous-span inputs never activate the second
tier and keep the exact single-tier plan.
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
    coarse_span_buckets: int | None | str = "auto",
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

    ``coarse_span_buckets``: activates the two-level tier (see module
    docstring) when any interval spans more than this many fine buckets
    — long-tail intervals move to a coarse tier sized max_span /
    coarse_span_buckets, so per-interval fan-out stays bounded by
    ~coarse_span_buckets + 1 with no tuning. The point side's shuffle
    rows double ONLY when the tier activates. Default ``"auto"`` = 64,
    applied only when ``bucket`` is None (the max-span check piggybacks
    on the median-estimate aggregation — zero extra jobs; an EXPLICIT
    bucket is taken as the caller's tuning and left alone). Pass an int
    to force the tier check with an explicit bucket too (costs one
    max-span scalar aggregation over ``right``), or ``None`` to disable
    (single-tier always, the fan-out guard alone protects).

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

    if coarse_span_buckets == "auto":
        k_coarse = 64 if bucket is None else None
    else:
        k_coarse = coarse_span_buckets
    span_expr = key(F.col(end)) - key(F.col(start))
    max_span = None
    if bucket is None:
        aggs = [F.percentile_approx(span_expr, 0.5).alias("m")]
        if k_coarse is not None:
            aggs.append(F.max(span_expr).alias("mx"))
        row = right.agg(*aggs).collect()[0]
        med = float(row["m"] or 0.0)
        bucket_n = max(med, 1.0)
        if k_coarse is not None:
            max_span = float(row["mx"] or 0.0)
    else:
        bucket_n = float(bucket) * (1_000_000.0 if ts else 1.0)
        if bucket_n <= 0:
            raise ValueError(f"bucket must be positive, got {bucket!r}")
        if k_coarse is not None:
            row = right.agg(F.max(span_expr).alias("mx")).collect()[0]
            max_span = float(row["mx"] or 0.0)
    two_level = (
        k_coarse is not None
        and max_span is not None
        and max_span > k_coarse * bucket_n
    )

    payload = [c for c in right.columns if c not in set(by) | {start, end}]
    r_named = right.select(
        *[F.col(c) for c in by],
        F.col(start).alias(f"{start}{suffix}"),
        F.col(end).alias(f"{end}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    ks = key(F.col(f"{start}{suffix}"))
    ke = key(F.col(f"{end}{suffix}"))
    if two_level:
        # coarse width: the longest interval explodes into at most
        # coarse_span_buckets+1 buckets; short intervals stay fine-tier
        coarse_n = max_span / float(k_coarse)
        tier = F.when(ke - ks <= k_coarse * bucket_n, F.lit(0)).otherwise(
            F.lit(1)
        )
        width = F.when(tier == 0, F.lit(bucket_n)).otherwise(F.lit(coarse_n))
    else:
        tier = F.lit(0)
        width = F.lit(bucket_n)
    b0 = F.floor(ks / width)
    b1 = F.floor(ke / width)
    span_guard = F.when(
        b1 - b0 > max_fanout,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range_join: interval spans more than {max_fanout} "
                    "buckets - raise `bucket` or "
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
    r_bkt = r_named.withColumn("_tier", tier).withColumn(
        "_bkt", F.explode(F.sequence(b0, span_guard))
    )
    if two_level:
        # each point probes BOTH tiers: one row per (point, tier), each
        # an exact equi-join key — an interval lives in exactly one tier
        # so every qualifying pair is still produced exactly once
        l_fine = left.withColumn("_tier", F.lit(0)).withColumn(
            "_bkt", F.floor(key(F.col(on)) / bucket_n)
        )
        l_coarse = left.withColumn("_tier", F.lit(1)).withColumn(
            "_bkt", F.floor(key(F.col(on)) / coarse_n)
        )
        l_bkt = l_fine.unionByName(l_coarse)
    else:
        l_bkt = left.withColumn("_tier", F.lit(0)).withColumn(
            "_bkt", F.floor(key(F.col(on)) / bucket_n)
        )

    cond = [
        l_bkt["_tier"] == r_bkt["_tier"],
        l_bkt["_bkt"] == r_bkt["_bkt"],
    ] + [l_bkt[c].eqNullSafe(r_bkt[c]) for c in by]
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
