"""Funnel analysis — per-key ordered-step conversion depth over an
events table (the classic product-analytics query: how far along
view -> click -> purchase did each user get?).

Semantics: GREEDY earliest-match subsequence scan per key — step 1
matches the key's earliest step-1 event, each later step the earliest
STRICTLY-later event of its type, optionally all within ``within``
seconds of the matched step-1 time. Greedy-earliest is the streaming
definition (each event either advances the funnel or doesn't, no
lookback) and what the SQL min-after-t formulation computes, so the
oracle can recompute it with one CTE per step.

Scale: ONE shuffle (groupBy key), each key's events folded by a single
``F.aggregate`` higher-order expression over its time-sorted event
array — whole-stage codegen, no UDF, state is a 3-field struct. Key
cardinality bounds the output; per-key event lists are the same
payload a sessionization carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: float | None = None,
) -> DataFrame:
    """Per-key funnel depth: (key, depth, t1_us) where ``depth`` is the
    number of ``steps`` completed in order (greedy earliest match,
    strictly increasing timestamps) and ``t1_us`` the matched step-1
    time (epoch micros; null at depth 0). ``within``: seconds from the
    matched step-1 event that every later step must fall inside."""
    if not steps:
        raise ValueError("steps must be non-empty")
    evs = (
        events.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
                F.col(type_col).alias("y"),
            ).alias("e"),
        )
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("e")).alias("es"))
    )
    n_steps = len(steps)
    w_us = None if within is None else int(float(within) * 1_000_000)
    step_arr = F.array(*[F.lit(s) for s in steps])
    zero = F.struct(
        F.lit(0).alias("d"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("last"),
    )

    def step_fn(acc, e):
        wanted = F.element_at(step_arr, acc["d"] + 1)
        in_window = (
            F.lit(True)
            if w_us is None
            else (e["t"] <= acc["t1"] + F.lit(w_us))
        )
        start = (acc["d"] == 0) & (e["y"] == wanted)
        advance = (
            (acc["d"] > 0)
            & (acc["d"] < n_steps)
            & (e["y"] == wanted)
            & (e["t"] > acc["last"])
            & in_window
        )
        return (
            F.when(
                start,
                F.struct(
                    F.lit(1).alias("d"),
                    e["t"].alias("t1"),
                    e["t"].alias("last"),
                ),
            )
            .when(
                advance,
                F.struct(
                    (acc["d"] + 1).alias("d"),
                    acc["t1"].alias("t1"),
                    e["t"].alias("last"),
                ),
            )
            .otherwise(acc)
        )

    folded = evs.withColumn("_f", F.aggregate("es", zero, step_fn))
    return folded.select(
        F.col("key").alias(key_col),
        F.col("_f.d").cast("int").alias("depth"),
        F.col("_f.t1").alias("t1_us"),
    )
