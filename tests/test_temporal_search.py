"""Round-6 session-2 operators: range join, multi-grain time rollup,
BM25 search (+ persisted postings, RRF hybrid fusion), Gopher quality
flags, edit-distance verification, bigram-LM scoring, image aHash,
sliding-window chunking, deterministic splits, funnel analysis, the
plan-audit API, and the one-pass table profiler. Every operator is
pinned against a driver-side brute-force recomputation of the same
semantics; randomized seed sweeps cover the trickiest two (range join,
funnel)."""

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
    # tiering disabled: the raw explode would be 1e9 rows -> guard trips
    with pytest.raises(Exception, match="spans more than"):
        range_join(
            pdf, idf, "x", "lo", "hi", bucket=1.0, max_fanout=10,
            coarse_span_buckets=None,
        ).collect()
    # two-level tiering absorbs the same interval untuned (the coarse
    # explode is exactly coarse_span_buckets=64 rows, far inside the
    # default max_fanout guard); explicit bucket needs an explicit K
    got = {
        (r["pid"], r["iid_r"])
        for r in range_join(
            pdf, idf, "x", "lo", "hi", bucket=1.0, coarse_span_buckets=64
        ).collect()
    }
    assert got == {(1, 1)}


def test_range_join_mixed_span_untuned(spark):
    """The round-6 watch item: median ~1s intervals with a 1-week tail.
    Fully untuned call (no bucket, default guards) — the two-level tier
    must absorb the 6*10^5x span spread with bounded fan-out and exact
    results."""
    week = 604_800.0
    points = [(i, float(i * 997 % int(2 * week))) for i in range(160)]
    intervals = [
        (j, float(j * 991 % int(2 * week)), 0.0) for j in range(120)
    ]
    intervals = [
        (j, lo, lo + (week if j % 40 == 0 else 1.0 + (j % 3)))
        for j, lo, _ in intervals
    ]
    pdf = spark.createDataFrame(points, "pid int, x double")
    idf = spark.createDataFrame(intervals, "iid int, lo double, hi double")
    out = range_join(pdf, idf, "x", "lo", "hi")
    got = [(r["pid"], r["iid_r"]) for r in out.collect()]
    exp = {
        (p, j)
        for p, x in points
        for j, lo, hi in intervals
        if lo <= x <= hi
    }
    assert len(got) == len(set(got)), "duplicate pairs from the tier union"
    assert set(got) == exp


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


def test_query_tokens_matches_tokens_expr(spark):
    """Pin the driver/JVM tokenizer contract: query_tokens (Python) must
    equal tokens_expr (JVM) on a punctuation / unicode / whitespace
    torture set, so the two can never silently drift (a drifted term
    would just miss the postings with no error)."""
    from prague_spark.pipeline.search import query_tokens
    from prague_spark.pipeline.text import tokens_expr

    torture = [
        "Hello WORLD",
        "tab\tsep\tted",
        "newline\nsplit\r\nwindows",
        "multi   space   runs",
        "\x0bvertical\x0ctab\x0bforms",
        " leading and trailing ",
        "",
        "   ",
        "nbsp\u00a0is-not-jvm-whitespace",
        "ideographic\u3000space",
        "line\u2028sep\u2029para",
        "punct, marks! (kept?) as-is; yes:",
        "MiXeD CaSe ÄÖÜ Straße",
        "ß and SS and ẞ",
        "emoji 😀 stays",
        "漢字 かな mixed 123",
        "aİdotted-capital-I",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(torture)], "i int, t string"
    )
    jvm = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens_expr(F.col("t")).alias("toks")).collect()
    }
    for i, t in enumerate(torture):
        assert query_tokens(t) == jvm[i], (
            f"tokenizer drift on {t!r}: py={query_tokens(t)} jvm={jvm[i]}"
        )


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


# -------------------------------------------------- edit-distance verify

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_verify_matches_dp(spark):
    from prague_spark.pipeline.dedup import edit_distance_verify

    docs = [(0, "the quick brown fox"), (1, "the quick brown fax"),
            (2, "a completely different sentence"), (3, "")]
    pairs = [(0, 1), (0, 2), (0, 3), (3, 3)]
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    pdf = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
        for r in edit_distance_verify(pdf, ddf, "doc_id", "text").collect()
    }
    texts = dict(docs)
    for a, b in pairs:
        d = _lev(texts[a], texts[b])
        m = max(len(texts[a]), len(texts[b]))
        sim = 1.0 - d / m if m else 1.0
        assert out[(a, b)][0] == d
        assert out[(a, b)][1] == pytest.approx(sim)


def test_edit_distance_verify_truncates(spark):
    from prague_spark.pipeline.dedup import edit_distance_verify

    ddf = spark.createDataFrame(
        [(0, "ab" * 50), (1, "ab" * 49 + "xx")], "doc_id bigint, text string"
    )
    pdf = spark.createDataFrame([(0, 1)], "id_a bigint, id_b bigint")
    r = edit_distance_verify(pdf, ddf, "doc_id", "text", max_len=10).collect()[0]
    assert r["edit_dist"] == 0  # identical within the 10-char prefix


# ------------------------------------------------------ bigram LM scoring

LM_CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran on the mat"),
    (2, "dogs bark at the moon"),
    (3, "solo"),
]


def _brute_lm(corpus, score_docs, alpha=0.4):
    uni: dict = {}
    big: dict = {}
    for _, t in corpus:
        ws = t.lower().split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total = sum(uni.values())
    out = {}
    for did, t in score_docs:
        ws = t.lower().split()
        if len(ws) < 2:
            out[did] = None
            continue
        lps = []
        for a, b in zip(ws, ws[1:]):
            if (a, b) in big and a in uni:
                lps.append(math.log(big[(a, b)] / uni[a]))
            else:
                lps.append(math.log(alpha * uni.get(b, 1) / total))
        out[did] = sum(lps) / len(lps)
    return out


def test_lm_logprob_matches_bruteforce(spark):
    from prague_spark.pipeline.text import bigram_lm_index, lm_logprob

    docs = spark.createDataFrame(LM_CORPUS, "doc_id bigint, text string")
    uni, big, total = bigram_lm_index(docs, "text")
    assert total == sum(len(t.split()) for _, t in LM_CORPUS)
    score_docs = LM_CORPUS + [(9, "the cat bark unseen words here")]
    sdf = spark.createDataFrame(score_docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["lm_logprob"]
        for r in lm_logprob(sdf, "doc_id", "text", uni, big, total).collect()
    }
    exp = _brute_lm(LM_CORPUS, score_docs)
    assert set(got) == set(exp)
    for d, v in exp.items():
        if v is None:
            assert got[d] is None
        else:
            assert got[d] == pytest.approx(v, rel=1e-12)


def test_lm_index_min_count(spark):
    from prague_spark.pipeline.text import bigram_lm_index

    docs = spark.createDataFrame(LM_CORPUS, "doc_id bigint, text string")
    _, big, _ = bigram_lm_index(docs, "text", min_count=2)
    kept = {(r["w1"], r["w2"]): r["c12"] for r in big.collect()}
    # only bigrams seen twice survive: 'the cat', 'on the', 'the mat'
    assert kept == {("the", "cat"): 2, ("on", "the"): 2, ("the", "mat"): 2}


# -------------------------------------------------------------- image aHash

def test_image_ahash_matches_byte_math(spark):
    from prague_spark.pipeline.multimodal import fake_image_decoder, image_ahash

    payloads = [
        (0, b"abcdefghijklmnopqrstuvwxyz012345"),
        (1, b"abcdefghijklmnopqrstuvwxyz012346"),
        (2, bytes(range(32, 64))),
    ]
    df = spark.createDataFrame(payloads, "doc_id bigint, payload binary")
    got = {
        r["doc_id"]: (r["ahash"], r["grid"])
        for r in image_ahash(
            df, "doc_id", "payload", decoder=fake_image_decoder, grid=4
        ).collect()
    }
    for did, p in payloads:
        tiled = (p * 2)[:48]  # 32-byte payload tiled to 48
        sk = [sum(tiled[3 * k: 3 * k + 3]) for k in range(16)]
        total = sum(sk)
        exp = 0
        for k, s in enumerate(sk):
            if 16 * s > total:
                exp |= 1 << (15 - k)
        assert got[did] == (exp, 4)
    # one byte changed -> perceptually near: hamming distance <= 1
    # (equality allowed: robustness to tiny edits IS the point of aHash)
    assert bin(got[0][0] ^ got[1][0]).count("1") <= 1
    # a structurally different payload lands far away
    assert bin(got[0][0] ^ got[2][0]).count("1") >= 4


def test_image_ahash_grid_guard(spark):
    from prague_spark.pipeline.multimodal import image_ahash

    df = spark.createDataFrame([(0, b"x" * 32)], "doc_id bigint, payload binary")
    with pytest.raises(ValueError, match="BIGINT"):
        image_ahash(df, "doc_id", "payload", grid=8)


# -------------------------------------------------------- chunking / splits

def test_chunk_text_matches_bruteforce(spark):
    from prague_spark.pipeline.text import chunk_text

    docs = [
        (0, " ".join(f"w{i}" for i in range(10))),
        (1, "only three words"),
        (2, ""),
        (3, "one"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk"], r["chunk_len"])
        for r in chunk_text(df, "doc_id", "text", size=4, overlap=1).collect()
    }
    exp = {}
    for did, t in docs:
        toks = t.lower().split()
        stride = 3
        start, cid = 0, 0
        while start < len(toks):
            w = toks[start:start + 4]
            exp[(did, cid)] = (" ".join(w), len(w))
            start += stride
            cid += 1
    assert got == exp


def test_chunk_text_validates(spark):
    from prague_spark.pipeline.text import chunk_text

    df = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(df, "doc_id", "text", size=4, overlap=4)


def test_split_assign_deterministic_and_stable(spark):
    import hashlib

    from prague_spark.pipeline.sample import split_assign

    ids = list(range(2000))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in split_assign(df, "doc_id", w).collect()
    }
    # recompute from first principles (sorted-label cumulative intervals)
    for i in ids:
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        exp = "test" if u < 0.1 else ("train" if u < 0.9 else "val")
        assert got[i] == exp
    # proportions roughly honored
    n_train = sum(1 for v in got.values() if v == "train")
    assert 0.75 < n_train / len(ids) < 0.85
    # stability: a subset's assignments are unchanged
    sub = spark.createDataFrame([(i,) for i in ids[:100]], "doc_id bigint")
    for r in split_assign(sub, "doc_id", w).collect():
        assert got[r["doc_id"]] == r["split"]
    # a salt re-splits
    salted = {
        r["doc_id"]: r["split"]
        for r in split_assign(df, "doc_id", w, salt="v2").collect()
    }
    assert salted != got


# --------------------------------------------------------------- plan audit

def test_plan_audit_counts_known_shapes(spark):
    from prague_spark.plan_audit import assert_scale_shape, audit

    rows = [(i, _ts(i % 5), "t" + str(i % 2), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id int, ts timestamp, typ string, v double")
    # rollup: exactly one shuffle, no python stages, no nested loops
    a = assert_scale_shape(
        time_rollup(df, "ts", grains=("hour", "day"), keys=("typ",)),
        max_shuffles=1, max_py_stages=0,
    )
    assert a.shuffles == 1 and a.nested_loops == 0 and a.cartesians == 0
    # a deliberate theta join trips the nested-loop guard
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    bad = df.alias("a").join(
        df.alias("b"), F.col("a.v") < F.col("b.v")
    )
    with pytest.raises(AssertionError, match="NestedLoop|Cartesian"):
        assert_scale_shape(bad)
    # range_join over the same semantics stays inside the budget
    ints = df.select("typ", (F.col("v") - 1).alias("lo"),
                     (F.col("v") + 1).alias("hi"))
    ok = range_join(df, ints, "v", "lo", "hi", by="typ", bucket=1.0)
    assert_scale_shape(ok, forbid_nested_loop=True, forbid_cartesian=True)
    assert audit(ok).nested_loops == 0


def test_plan_audit_shuffle_budget_violation(spark):
    from prague_spark.plan_audit import assert_scale_shape

    df = spark.createDataFrame([(1, "a")], "id int, k string")
    two = df.groupBy("k").count().groupBy("count").count()
    with pytest.raises(AssertionError, match="shuffles"):
        assert_scale_shape(two, max_shuffles=1)


# ---------------------------------------------------------------- rrf fusion

def test_rrf_fuse_matches_bruteforce(spark):
    from prague_spark.pipeline.search import rrf_fuse

    a = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)]
    b = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)]
    adf = spark.createDataFrame(a, "query_id bigint, doc_id bigint, rank int")
    bdf = spark.createDataFrame(b, "query_id bigint, doc_id bigint, rank int")
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score"], r["rank"])
        for r in rrf_fuse([adf, bdf], k=60).collect()
    }
    exp: dict = {}
    for lst in (a, b):
        for q, d, rk in lst:
            exp[(q, d)] = exp.get((q, d), 0.0) + 1.0 / (60 + rk)
    assert set(got) == set(exp)
    for key, s in exp.items():
        assert got[key][0] == pytest.approx(s, rel=1e-12)
    # doc 11 (rank 2 + rank 1) beats doc 10 (rank 1 only) for query 1
    assert got[(1, 11)][1] == 1
    assert got[(1, 10)][1] == 2


def test_rrf_fuse_hybrid_composition(spark, sf_dir):
    """End-to-end hybrid retrieval: BM25 over documents fused with
    cosine top-k over embeddings (ids aligned by construction in the
    testdata: vec_id == doc_id space)."""
    from prague_spark.pipeline.search import (
        bm25_search, build_postings, corpus_stats_from_docs, rrf_fuse,
    )
    from prague_spark.pipeline.similarity import cosine_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "vec", F.transform("embedding", lambda x: x.cast("double"))
    )
    n, avgdl = corpus_stats_from_docs(docs, "text")
    post = build_postings(docs, "doc_id", "text")
    lex = bm25_search(post, [(0, "table scan merge")], k=10,
                      n_docs=n, avgdl=avgdl)
    qv = emb.limit(1).select("vec_id", "vec").collect()[0]
    sem = cosine_topk(
        emb, "vec_id", "vec", [(0, [float(x) for x in qv["vec"]])], k=10
    ).withColumnRenamed("vec_id", "doc_id")
    fused = rrf_fuse([lex, sem.select("query_id", "doc_id", "rank")], topk=5)
    rows = fused.collect()
    assert len(rows) == 5
    assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]


# -------------------------------------------------------------------- funnel

def _brute_funnel(rows, steps, within=None):
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, t, y in rows:
        by_key[k].append((t, y))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        d, t1, last = 0, None, None
        for t, y in evs:
            if d == 0 and y == steps[0]:
                d, t1, last = 1, t, t
            elif 0 < d < len(steps) and y == steps[d] and t > last and (
                within is None or (t - t1).total_seconds() <= within
            ):
                d, last = d + 1, t
        out[k] = (d, t1)
    return out


def test_funnel_matches_bruteforce(spark):
    from prague_spark.ops.funnel import funnel

    types = ["view", "click", "buy", "other"]
    rows = [
        (i % 7, _ts(8 + (i * 3) % 12, (i * 17) % 60), types[(i * 5) % 4])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "u bigint, ts timestamp, et string")
    for within in (None, 3600.0):
        got = {
            r["u"]: (r["depth"], r["t1_us"])
            for r in funnel(
                df, "u", "ts", "et", ["view", "click", "buy"], within=within
            ).collect()
        }
        exp = _brute_funnel(rows, ["view", "click", "buy"], within)
        assert set(got) == set(exp)
        for k, (d, t1) in exp.items():
            assert got[k][0] == d, (k, within, got[k], (d, t1))
            if t1 is None:
                assert got[k][1] is None
            else:
                assert got[k][1] == int(t1.timestamp() * 1_000_000)


def test_funnel_one_shuffle_no_udf(spark):
    from prague_spark.ops.funnel import funnel
    from prague_spark.plan_audit import audit

    df = spark.createDataFrame(
        [(0, _ts(9), "view")], "u bigint, ts timestamp, et string"
    )
    a = audit(funnel(df, "u", "ts", "et", ["view", "click"]))
    assert a.shuffles == 1 and a.py_stages == 0


def test_funnel_only_noise_key_keeps_depth0_row(spark):
    """The map-side step-set drop must not lose keys whose events are
    all non-step types — they report depth 0, matching the oracle's
    all-keys universe."""
    from prague_spark.ops.funnel import funnel

    df = spark.createDataFrame(
        [(1, _ts(9), "other"), (1, _ts(10), "noise"), (2, _ts(9), "view")],
        "u bigint, ts timestamp, et string",
    )
    got = {
        r["u"]: (r["depth"], r["t1_us"])
        for r in funnel(df, "u", "ts", "et", ["view", "click"]).collect()
    }
    assert got[1] == (0, None)
    assert got[2][0] == 1


def test_funnel_hot_key_cap(spark, caplog):
    """Skew guard: a degenerate key (bot) above max_events_per_key is
    dropped with a warning; every other key's result is unchanged vs
    the uncapped run."""
    import logging

    from prague_spark.ops.funnel import funnel

    normal = [
        (u, _ts(8 + s, u), ["view", "click", "buy"][s])
        for u in range(1, 20)
        for s in range(3)
    ]
    # one hot key: 50k step-typed events (well past the cap)
    hot = [(999, _ts(8, i % 60, i % 60), "view") for i in range(50_000)]
    df = spark.createDataFrame(
        normal + hot, "u bigint, ts timestamp, et string"
    ).repartition(8)

    uncapped = {
        r["u"]: (r["depth"], r["t1_us"])
        for r in funnel(df, "u", "ts", "et", ["view", "click", "buy"]).collect()
    }
    with caplog.at_level(logging.WARNING, logger="prague_spark.funnel"):
        capped = {
            r["u"]: (r["depth"], r["t1_us"])
            for r in funnel(
                df, "u", "ts", "et", ["view", "click", "buy"],
                max_events_per_key=1000,
            ).collect()
        }
    assert 999 in uncapped and 999 not in capped
    assert capped == {k: v for k, v in uncapped.items() if k != 999}
    assert any("dropping 1 keys" in r.message for r in caplog.records)


# ------------------------------------------------------------------ profile

def test_profile_table_one_pass(spark):
    from prague_spark.ops.profile import profile_table

    rows = [(i, float(i) if i % 5 else None, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, v double, s string")
    prof = profile_table(df, quantiles=(0.5,))
    got = {
        (r["column"], r["metric"]): (r["value"], r["text_value"])
        for r in prof.collect()
    }
    assert got[("id", "count")][0] == 100.0
    assert got[("id", "nulls")][0] == 0.0
    assert got[("v", "count")][0] == 80.0
    assert got[("v", "nulls")][0] == 20.0
    assert got[("v", "min")][0] == 1.0
    assert got[("v", "max")][0] == 99.0
    vals = [float(i) for i in range(100) if i % 5]
    assert got[("v", "mean")][0] == pytest.approx(sum(vals) / len(vals))
    assert abs(got[("v", "q0.5")][0] - sorted(vals)[len(vals) // 2]) <= 3
    # approx distinct within rsd of truth (3 distinct strings: exact-ish)
    assert got[("s", "approx_distinct")][0] == pytest.approx(3, abs=1)
    assert got[("s", "min")] == (None, "s0")
    assert got[("s", "max")] == (None, "s2")
    # non-numeric columns carry no mean/quantiles
    assert ("s", "mean") not in got


# ------------------------------------------------- randomized parity sweeps

@pytest.mark.parametrize("seed", [11, 29, 83])
def test_range_join_randomized_parity(spark, seed):
    """Random points/intervals (incl. empty, inverted, and zero-width
    intervals, duplicate timestamps, missing keys) vs the O(n*m) brute
    force, across bucket widths spanning 3 orders of magnitude."""
    import random

    rng = random.Random(seed)
    points = [
        (i, rng.randrange(4), round(rng.uniform(0, 1000), 3))
        for i in range(300)
    ]
    intervals = []
    for j in range(80):
        lo = round(rng.uniform(0, 1000), 3)
        w = rng.choice([0.0, 0.5, 5.0, 50.0, 400.0])
        intervals.append((j, rng.randrange(5), lo, round(lo + w, 3)))
    # a few inverted (empty) intervals
    intervals += [(100 + j, 0, 500.0, 400.0) for j in range(3)]
    pdf = spark.createDataFrame(points, "pid int, k int, x double")
    idf = spark.createDataFrame(intervals, "iid int, k int, lo double, hi double")
    exp = _brute_range(points, intervals)
    for bucket in (0.7, 37.0, 900.0):
        got = {
            (r["pid"], r["iid_r"])
            for r in range_join(
                pdf, idf, "x", "lo", "hi", by="k", bucket=bucket
            ).collect()
        }
        assert got == exp, f"bucket={bucket}"


@pytest.mark.parametrize("seed", [7, 41, 97])
def test_funnel_randomized_parity(spark, seed):
    """Random event streams (duplicate timestamps, repeated steps,
    interleaved noise, users missing steps entirely) vs the greedy
    brute force, with and without a window."""
    import random

    from prague_spark.ops.funnel import funnel

    rng = random.Random(seed)
    types = ["a", "b", "c", "x", "y"]
    rows = [
        (
            rng.randrange(12),
            _ts(rng.randrange(24), rng.randrange(60), rng.randrange(2) * 30),
            rng.choice(types),
        )
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "u bigint, ts timestamp, et string")
    for within in (None, 7200.0):
        got = {
            r["u"]: r["depth"]
            for r in funnel(df, "u", "ts", "et", ["a", "b", "c"],
                            within=within).collect()
        }
        exp = {k: d for k, (d, _) in
               _brute_funnel(rows, ["a", "b", "c"], within).items()}
        assert got == exp, f"within={within}"


# ------------------------------------------------------------- edge cases

def test_range_join_without_keys(spark):
    pdf = spark.createDataFrame(
        [(0, 1.0), (1, 5.0), (2, 9.0)], "pid int, x double"
    )
    idf = spark.createDataFrame(
        [(0, 0.0, 4.0), (1, 4.5, 10.0)], "iid int, lo double, hi double"
    )
    got = {
        (r["pid"], r["iid_r"])
        for r in range_join(pdf, idf, "x", "lo", "hi", bucket=2.0).collect()
    }
    assert got == {(0, 0), (1, 1), (2, 1)}


def test_time_rollup_without_keys(spark):
    df = spark.createDataFrame(
        [(1, _ts(9, 5)), (2, _ts(9, 40)), (3, _ts(10, 1))],
        "id int, ts timestamp",
    )
    got = {
        (r["grain"], r["bucket"]): r["n"]
        for r in time_rollup(df, "ts", grains=("hour",)).collect()
    }
    assert got == {("hour", _ts(9)): 2, ("hour", _ts(10)): 1}


def test_bm25_error_paths(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    post = build_postings(docs, "doc_id", "text")
    with pytest.raises(ValueError, match="no query terms"):
        bm25_search(post, [(1, "   ")])
    empty = post.filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_search(empty, [(1, "spark")])
    from prague_spark.pipeline.search import rrf_fuse

    with pytest.raises(ValueError, match="no result frames"):
        rrf_fuse([])
