"""Structured Streaming tests: the batch operators applied under
readStream with watermarks, drained to a memory sink. Verifies the
streaming claims in prague_spark.streaming are real, not schema-only."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    # events.ts is TIMESTAMP(NANOS); rewrite a micros copy so readStream
    # needs no legacy flag.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    d = tempfile.mkdtemp(prefix="prague_stream_")
    df.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_windowed_agg_stream_matches_batch(spark, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    expected = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in batch_df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(events_stream_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert got == expected


def test_score_stream_stateless(spark, lineitem, events_stream_dir):
    import prague_spark as ps
    from prague_spark.streaming import score_stream

    model = ps.fit(
        lineitem, ["l_quantity", "l_discount"], "l_extendedprice",
        "gaussian", n_sigma=3,
    )
    d = tempfile.mkdtemp(prefix="prague_stream_li_")
    lineitem.select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice") \
        .coalesce(2).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    scored = score_stream(stream, model, type="response", out="pred")
    assert scored.isStreaming
    q = (
        scored.writeStream.format("memory")
        .queryName("scored")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql(
        "SELECT count(*) AS n, count(pred) AS np FROM scored"
    ).first()
    assert row["n"] == lineitem.count() and row["np"] == row["n"]
