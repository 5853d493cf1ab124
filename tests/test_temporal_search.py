"""Round-6 additions: range join, multi-grain time rollup, BM25 search,
Gopher quality flags. Each op is pinned against a driver-side
brute-force recomputation of the same semantics."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row, functions as F

from prague_spark.ops.rangejoin import range_join
from prague_spark.ops.rollup import time_rollup
from prague_spark.pipeline.search import (
    bm25_idf, bm25_search, build_postings, corpus_stats,
)
from prague_spark.pipeline.text import gopher_quality_flags


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 3, 1, h, m, s)


# ---------------------------------------------------------------- range join

def _brute_range(points, intervals):
    out = set()
    for pid, key, t in points:
        for iid, ikey, s, e in intervals:
            if key == ikey and s <= t <= e:
                out.add((pid, iid))
    return out


def test_range_join_matches_bruteforce_numeric(spark):
    points = [(i, i % 3, float(i * 7 % 50)) for i in range(60)]
    intervals = [
        (j, j % 3, float(j * 5 % 40), float(j * 5 % 40) + (j % 11))
        for j in range(25)
    ]
    pdf = spark.createDataFrame(points, "pid int, k int, x double")
    idf = spark.createDataFrame(intervals, "iid int, k int, lo double, hi double")
    got = {
        (r["pid"], r["iid_r"])
        for r in range_join(
            pdf, idf, "x", "lo", "hi", by="k", bucket=4.0
        ).collect()
    }
    assert got == _brute_range(points, intervals)


def test_range_join_timestamps_and_default_bucket(spark):
    points = [(i, 0, _ts(8 + i % 10, (i * 13) % 60)) for i in range(40)]
    intervals = [
        (j, 0, _ts(8 + j, 0), _ts(8 + j, 45)) for j in range(8)
    ]
    pdf = spark.createDataFrame(points, "pid int, k int, t timestamp")
    idf = spark.createDataFrame(intervals, "iid int, k int, s timestamp, e timestamp")
    got = {
        (r["pid"], r["iid_r"])
        for r in range_join(pdf, idf, "t", "s", "e", by="k").collect()
    }
    assert got == _brute_range(
        [(p, k, t) for p, k, t in points],
        [(j, k, s, e) for j, k, s, e in intervals],
    )
    # no duplicate (point, interval) pairs from the bucket explode
    n = range_join(pdf, idf, "t", "s", "e", by="k").count()
    assert n == len(got)


def test_range_join_fanout_guard(spark):
    pdf = spark.createDataFrame([(1, 0.5)], "pid int, x double")
    idf = spark.createDataFrame([(1, 0.0, 1e9)], "iid int, lo double, hi double")
    with pytest.raises(Exception, match="spans more than"):
        range_join(pdf, idf, "x", "lo", "hi", bucket=1.0, max_fanout=10).collect()


# ------------------------------------------------------------------- rollup

def test_time_rollup_two_grains_one_pass(spark):
    rows = [
        (i, _ts(i % 5, (i * 17) % 60), "t" + str(i % 2), float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp, typ string, v double")
    out = time_rollup(
        df, "ts", grains=("hour", "day"), keys=("typ",),
        aggs=[F.count("*").cast("bigint").alias("n"),
              F.round(F.sum("v"), 4).alias("sum_v")],
    ).collect()
    # brute force per grain
    for grain, trunc in (
        ("hour", lambda t: t.replace(minute=0, second=0)),
        ("day", lambda t: t.replace(hour=0, minute=0, second=0)),
    ):
        exp: dict = {}
        for _, t, ty, v in rows:
            k = (trunc(t), ty)
            n0, s0 = exp.get(k, (0, 0.0))
            exp[k] = (n0 + 1, s0 + v)
        got = {
            (r["bucket"], r["typ"]): (r["n"], r["sum_v"])
            for r in out
            if r["grain"] == grain
        }
        assert set(got) == set(exp)
        for k in exp:
            assert got[k][0] == exp[k][0]
            assert got[k][1] == pytest.approx(round(exp[k][1], 4))
    # exactly one shuffle: a single Exchange in the physical plan
    plan = time_rollup(
        df, "ts", grains=("hour", "day"), keys=("typ",)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_time_rollup_validates_grain(spark):
    df = spark.createDataFrame([(1, _ts(1))], "id int, ts timestamp")
    with pytest.raises(ValueError, match="unknown grain"):
        time_rollup(df, "ts", grains=("fortnight",))


# --------------------------------------------------------------------- bm25

CORPUS = [
    (0, "spark shuffle join spark spark"),
    (1, "hash join broadcast join"),
    (2, "window sort merge sort"),
    (3, "spark window aggregate"),
    (4, "the quick brown fox"),
]


def _brute_bm25(corpus, qtext, k1=1.2, b=0.75):
    docs = {d: t.lower().split() for d, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = set(qtext.lower().split())
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for tt in docs.values() if t in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


def test_bm25_matches_bruteforce(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    post = build_postings(docs, "doc_id", "text")
    n, avgdl = corpus_stats(post)
    assert n == 5
    assert avgdl == pytest.approx(sum(len(t.split()) for _, t in CORPUS) / 5)
    out = bm25_search(post, [(7, "spark join"), (8, "sort")], k=10)
    got = {
        (r["query_id"], r["doc_id"]): r["score"] for r in out.collect()
    }
    for qid, qtext in ((7, "spark join"), (8, "sort")):
        exp = _brute_bm25(CORPUS, qtext)
        mine = {d: s for (q, d), s in got.items() if q == qid}
        assert set(mine) == set(exp)
        for d in exp:
            assert mine[d] == pytest.approx(exp[d], rel=1e-9)


def test_bm25_topk_rank_deterministic(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    post = build_postings(docs, "doc_id", "text")
    out = bm25_search(post, [(1, "join spark")], k=2).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]
    exp = _brute_bm25(CORPUS, "join spark")
    best = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        d for d, _ in best
    ]


def test_bm25_idf_reference():
    assert bm25_idf(5, 2) == pytest.approx(math.log(1 + 3.5 / 2.5))


# ------------------------------------------------------------- gopher rules

def test_gopher_flags(spark):
    good = (
        "the quick brown fox and that lazy dog have come down to the "
        "river with nine of our finest friends hoping to watch small "
        "boats drift past old stone bridges before evening rain arrives"
    )
    rows = [
        (0, good),                           # passes everything
        (1, "short text"),                   # fails min_words
        (2, ("spam spam " * 40).strip()),    # fails rep + stopwords
        (3, ("!!! ??? " * 40).strip()),      # fails alpha ratio
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(df, "text", min_words=20).collect()
    }
    assert out[0]["gq_keep"]
    assert not out[1]["gq_words_ok"] and not out[1]["gq_keep"]
    assert not out[2]["gq_rep_ok"] and not out[2]["gq_stop_ok"]
    assert not out[3]["gq_alpha_ok"]
    # flags recompute from first principles on doc 0
    toks = good.lower().split()
    assert out[0]["gq_words_ok"] == (20 <= len(toks) <= 100_000)
    mean_wl = sum(len(w) for w in toks) / len(toks)
    assert out[0]["gq_word_len_ok"] == (3.0 <= mean_wl <= 10.0)


def test_postings_index_roundtrip_and_pushdown(spark, tmp_path):
    """write_postings/read_postings round-trip; bm25 over the persisted
    index matches the in-memory result, and the literal term filter is
    pushed into the parquet scan (row-group pruning at scale)."""
    from prague_spark.pipeline.search import read_postings, write_postings

    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    post = build_postings(docs, "doc_id", "text")
    path = str(tmp_path / "postings")
    write_postings(post, path, n_files=4)
    loaded = read_postings(spark, path)
    assert loaded.count() == post.count()

    mem = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_search(post, [(1, "spark join")], k=10).collect()
    }
    disk_df = bm25_search(loaded, [(1, "spark join")], k=10)
    disk = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in disk_df.collect()
    }
    assert set(disk) == set(mem)
    for k in mem:
        assert disk[k][1] == mem[k][1]
        assert disk[k][0] == pytest.approx(mem[k][0], rel=1e-12)
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "In(term" in plan
