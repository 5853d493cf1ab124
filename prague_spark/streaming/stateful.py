"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond the built-in windowed/session aggregations, a training-data
pipeline needs custom per-key state that survives across micro-batches
(running corpus statistics, drift monitors). This module implements a
running per-key aggregate (count / mean / M2 via Welford, exact across
batches) as the canonical ``applyInPandasWithState`` operator: state is a
single small tuple per key, update cost is O(batch), and output is one
row per key per batch — the shape that scales to any stream volume.

The same function works in batch tests by feeding files one per
micro-batch (``maxFilesPerTrigger=1``), which is how the test proves the
state actually carries across batches.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _welford_update(n, mean, m2, values) -> tuple[int, float, float]:
    for v in values:
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    return n, mean, m2


def running_stats_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, mean, variance) maintained exactly across
    micro-batches. Emits one row per key per batch with the totals so far.

    Output: (key, n, mean, var). State per key: 3 numbers (Welford), so
    state size is O(#keys) regardless of stream length."""
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("n", LongType()),
            StructField("mean", DoubleType()),
            StructField("var", DoubleType()),
        ]
    )

    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64").to_numpy()
            n, mean, m2 = _welford_update(n, mean, m2, vals)
        state.update((int(n), float(mean), float(m2)))
        var = m2 / (n - 1) if n > 1 else 0.0
        yield pd.DataFrame(
            [(int(key[0]), int(n), float(mean), float(var))],
            columns=["key", "n", "mean", "var"],
        )

    return (
        df.select(df[key_col].alias("key"), df[value_col].alias(value_col))
        .groupBy("key")
        .applyInPandasWithState(
            fn, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
