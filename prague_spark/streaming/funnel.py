"""Streaming twin of :func:`prague_spark.ops.funnel.funnel` — per-key
conversion depth maintained ACROSS micro-batches via
``applyInPandasWithState`` (the batch operator's greedy earliest-match
scan is already streaming-shaped: each event either advances the funnel
or is ignored, no lookback, so the state is the same 3-field tuple the
batch fold carries).

Semantic note: within a micro-batch events are folded in timestamp
order, but an event arriving in a LATER batch with a timestamp before
the last matched step cannot retroactively advance the funnel — the
stream computes the greedy scan over the batch-ordered merge. When
ingestion is time-ordered (the normal event-log case) this equals the
batch result exactly; the parity test feeds time-split files one per
trigger to pin that. State per key: 3 numbers — O(#keys) forever.

Key-universe delta vs batch: non-step events are filtered BEFORE the
state shuffle (they can never advance the fold, and the state store
shouldn't pay for them), so a key emits its first row only once it has
seen >= 1 step-typed event. The batch funnel emits (key, 0, null) for
every key with ANY event; downstream consumers of the stream read
"no row for key" as depth 0.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("d", IntegerType()),
        StructField("t1", LongType()),
        StructField("last", LongType()),
    ]
)


def funnel_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: float | None = None,
) -> DataFrame:
    """Per-key (key, depth, t1_us) emitted each micro-batch with the
    funnel progress so far — same output columns as the batch
    :func:`~prague_spark.ops.funnel.funnel`. ``depth`` is monotone
    nondecreasing across emissions, so the latest row per key is the
    current truth (and ``max(depth)`` is safe in any sink)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n_steps = len(steps)
    w_us = None if within is None else int(float(within) * 1_000_000)
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("depth", IntegerType()),
            StructField("t1_us", LongType()),
        ]
    )

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            d, t1, last = state.get
        else:
            d, t1, last = 0, None, None
        # Buffer the whole micro-batch group before sorting: the iterator
        # yields one pandas chunk per Arrow batch (~10k rows,
        # spark.sql.execution.arrow.maxRecordsPerBatch), and sorting
        # per-chunk would fold events out of timestamp order across
        # chunk boundaries for large groups.
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            for t, y in sorted(zip(batch["_t"], batch["_y"])):
                t = int(t)
                if d == 0 and y == steps[0]:
                    d, t1, last = 1, t, t
                elif (
                    0 < d < n_steps
                    and y == steps[d]
                    and t > last
                    and (w_us is None or t <= t1 + w_us)
                ):
                    d, last = d + 1, t
        state.update((int(d), t1, last))
        yield pd.DataFrame(
            [(int(key[0]), int(d), t1)], columns=["key", "depth", "t1_us"]
        )

    return (
        # step-set pre-filter (stateless, streaming-safe): non-step events
        # can never advance the fold, so dropping them before the state
        # shuffle is semantically free — same guard as the batch funnel
        df.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
            F.col(type_col).alias("_y"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            fn, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
