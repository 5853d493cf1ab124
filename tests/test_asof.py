"""asof_join: semantics vs hand-computed and DuckDB's native ASOF JOIN,
plus the one-shuffle plan contract."""

import duckdb
import pytest
from pyspark.sql import functions as F

from prague_spark.ops.asof import asof_join


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, 10, "t-a"), (1, 25, "t-b"), (1, 30, "t-c"),
            (2, 5, "t-d"),
            (3, 50, "t-e"),
        ],
        "sym long, ts long, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, 8, 100.0), (1, 25, 101.0), (1, 40, 102.0),
            (2, 9, 200.0),
            (4, 1, 400.0),
        ],
        "sym long, ts long, px double",
    )
    return trades, quotes


def test_asof_backward_semantics(quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r["sym"], r["ts"]): (r["ts_r"], r["px_r"])
        for r in asof_join(trades, quotes, "ts", "sym").collect()
    }
    assert out == {
        (1, 10): (8, 100.0),
        (1, 25): (25, 101.0),   # tie matches (at-or-before)
        (1, 30): (25, 101.0),
        (2, 5): (None, None),   # quote is later than the trade
        (3, 50): (None, None),  # no quotes for sym 3
    }


def test_asof_forward_and_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    fwd = {
        (r["sym"], r["ts"]): (r["ts_r"], r["px_r"])
        for r in asof_join(trades, quotes, "ts", "sym", direction="forward").collect()
    }
    assert fwd[(1, 10)] == (25, 101.0)
    assert fwd[(1, 30)] == (40, 102.0)
    assert fwd[(2, 5)] == (9, 200.0)
    assert fwd[(3, 50)] == (None, None)
    tol = {
        (r["sym"], r["ts"]): (r["ts_r"], r["px_r"])
        for r in asof_join(trades, quotes, "ts", "sym", tolerance=3).collect()
    }
    assert tol[(1, 10)] == (8, 100.0)      # distance 2 <= 3
    assert tol[(1, 30)] == (None, None)    # distance 5 > 3


def test_asof_null_payload_stays_with_its_row(spark):
    """A right row whose payload value is NULL must still win as the
    match (all attached columns come from the same right row — the
    struct-carry contract), not let an older non-null value bleed
    through."""
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 2, 5.0), (1, 8, None)], "k long, ts long, v double"
    )
    row = asof_join(left, right, "ts", "k").collect()[0]
    assert row["ts_r"] == 8 and row["v_r"] is None


def test_asof_matches_duckdb_asof_join(spark, sf_dir):
    """Events fixture: every 'view' attaches its user's most recent
    'click' at-or-before it; DuckDB's native ASOF JOIN is the oracle."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    views = ev.filter(F.col("event_type") == "view").drop("event_type")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_id"),
            F.max("value").alias("click_value"),
        )
    )
    got = {
        r["event_id"]: (r["click_id_r"], r["click_value_r"])
        for r in asof_join(
            views, clicks.select("user_id", "ts", "click_id", "click_value"),
            "ts", "user_id",
        ).collect()
    }
    exp_df = duckdb.query(f"""
        WITH ev AS (SELECT * FROM read_parquet('{sf_dir}/events.parquet')),
        views AS (SELECT event_id, user_id, ts, value FROM ev
                  WHERE event_type = 'view'),
        clicks AS (SELECT user_id, ts, max(event_id) AS click_id,
                          max(value) AS click_value
                   FROM ev WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT v.event_id, c.click_id, c.click_value
        FROM views v ASOF LEFT JOIN clicks c
          ON v.user_id = c.user_id AND v.ts >= c.ts
    """).df()
    exp = {
        int(r.event_id): (
            None if r.click_id != r.click_id else int(r.click_id),
            None if r.click_value != r.click_value else r.click_value,
        )
        for r in exp_df.itertuples()
    }
    got_n = {k: (None if a is None else int(a), b) for k, (a, b) in got.items()}
    assert got_n == exp


def test_asof_plan_is_single_exchange(quotes_trades):
    trades, quotes = quotes_trades
    plan = asof_join(trades, quotes, "ts", "sym")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
