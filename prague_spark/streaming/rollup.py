"""Streaming twin of :func:`prague_spark.ops.rollup.time_rollup`.

A streaming rollup must keep per-bucket state evictable, and Spark only
guarantees watermark eviction when the grouping key is a ``window()`` /
``session_window()`` of the watermarked column — not an arbitrary
``date_trunc``. So the streaming twin runs ONE tumbling-window
aggregation per grain (each independently evictable) instead of the
batch operator's single-shuffle grain explode. Fixed-duration grains
only (second..day): epoch-aligned tumbling windows coincide exactly
with ``date_trunc`` for those, which the parity test pins; calendar
grains (week, month, ...) have no fixed duration — stream them with the
:func:`calendar_rollup_sink` foreachBatch incremental merge instead.
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
                f"supports {sorted(STREAM_GRAIN_DURATION)} (stream "
                "calendar grains via calendar_rollup_sink instead)"
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


def calendar_rollup_sink(
    ts_col: str,
    state_dir: str,
    grains: list[str] | tuple[str, ...] = ("week", "month"),
    keys: list[str] | tuple[str, ...] = (),
    sum_cols: list[str] | tuple[str, ...] = (),
):
    """CALENDAR grains (week, month, quarter, year) for streams — the gap
    :func:`time_rollup_stream` documents: calendar grains have no fixed
    duration, so no tumbling window (and hence no watermark-evictable
    state) can express them. The recipe instead is a ``foreachBatch``
    incremental merge: each micro-batch runs the BATCH
    :func:`~prague_spark.ops.rollup.time_rollup` over just its rows and
    upserts the per-(grain, bucket, keys) partials into a parquet state
    table. Counts and sums merge associatively, so the merged table
    always equals the batch rollup of everything ingested so far (the
    parity test pins week+month exactly); derive averages downstream as
    sum/n.

    Returns a ``fn(batch_df, batch_id)`` for
    ``df.writeStream.foreachBatch(fn)``. Replay-safe AND crash-atomic:
    each merge writes a NEW versioned directory ``v_<batch_id>`` (the
    live state is never touched) and then atomically flips the
    ``CURRENT`` pointer file to it (``os.replace`` of a temp file — one
    rename). The pointer names both the live directory and the last
    merged batch_id, so an already-merged redelivered batch is skipped;
    a crash BEFORE the flip leaves the previous state live (the
    redelivered batch re-merges from it — exactly-once outcome), a
    crash AFTER the flip is the skip case. Orphaned version directories
    from pre-flip crashes are garbage-collected on later batches.

    ``state_dir`` must live on a filesystem the DRIVER sees across
    restarts (foreachBatch runs driver-side; local disk is fine for a
    single long-lived driver, use shared/cloud-backed storage when the
    query can be resumed from another host).

    Scale note: the state is rollup-sized — O(active buckets x key
    cardinality), NOT O(stream) — and the upsert round-trips it through
    the driver (collect + rewrite), which is the plain-parquet analogue
    of a metadata-table MERGE. That is the right shape for dashboard
    rollups (thousands of buckets); for very high key cardinality put
    the same per-batch ``time_rollup`` increment behind a real upsert
    sink instead.
    """
    import os

    from ..ops.rollup import time_rollup

    grains = list(grains)
    aggs_inc = [F.count("*").cast("long").alias("n")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]

    def _merge_aggs():
        return [F.sum("n").cast("long").alias("n")] + [
            F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols
        ]

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur_dir, last = _read_current(state_dir)
        if batch_id <= last:
            return  # redelivered batch: already merged, skip
        inc = time_rollup(batch_df, ts_col, grains, keys, aggs=aggs_inc)
        if cur_dir is not None:
            cur = spark.read.parquet(cur_dir)
            merged = (
                cur.unionByName(inc)
                .groupBy("grain", "bucket", *keys)
                .agg(*_merge_aggs())
            )
        else:
            merged = inc
        # 1. write the merge to a NEW version directory — the live state
        #    is never overwritten, so a crash mid-write corrupts nothing
        new_dir = os.path.join(state_dir, f"v_{batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(new_dir)
        # 2. atomically flip the pointer (temp file + one rename)
        os.makedirs(state_dir, exist_ok=True)
        tmp = os.path.join(state_dir, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"v_{batch_id}")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(state_dir, "CURRENT"))
        # 3. best-effort GC of orphaned versions — KEEPING the
        #    just-superseded generation: a reader that resolved the old
        #    CURRENT before this flip still holds a lazy plan over it,
        #    and deleting it under that plan fails the reader's next
        #    action. One extra rollup-sized directory buys one full
        #    batch interval of read grace.
        import shutil

        keep = {f"v_{batch_id}"}
        if cur_dir is not None:
            keep.add(os.path.basename(cur_dir))
        for d in os.listdir(state_dir):
            if d.startswith("v_") and d not in keep:
                shutil.rmtree(os.path.join(state_dir, d),
                              ignore_errors=True)

    return fn


def _read_current(state_dir: str) -> tuple[str | None, int]:
    """(live version directory, last merged batch_id) from the CURRENT
    pointer; (None, -1) for a fresh state dir."""
    import os

    ptr = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(ptr):
        return None, -1
    with open(ptr) as f:
        name = f.read().strip()
    if not name:
        return None, -1
    return os.path.join(state_dir, name), int(name.split("_", 1)[1])


def read_rollup_state(spark, state_dir: str) -> DataFrame:
    """Load the merged state a :func:`calendar_rollup_sink` maintains."""
    cur, _ = _read_current(state_dir)
    if cur is None:
        raise FileNotFoundError(
            f"no CURRENT rollup state under {state_dir!r} (no batch has "
            "committed yet)"
        )
    return spark.read.parquet(cur)
