"""Lexical (keyword) search over a document corpus: inverted-index
postings + BM25 ranking — the retrieval companion to the embedding-side
:mod:`prague_spark.pipeline.similarity` (beyond-reference extension; the
standard tool for corpus exploration, dedup triage, and eval-set mining
in training-data pipelines).

Scale design: the postings list is ONE explode + groupBy of the corpus
(a shuffle on (doc, term), partial-aggregated map-side). A search never
rescans the corpus text: query terms are a broadcast-sized frame joined
INTO the postings (the equi-join prunes every posting not matching a
query term at the scan — with postings persisted as a parquet/bucketed
table this is a pushed-down semi-join), document frequencies are
computed over that pruned slice only, and the per-(query, doc) score
aggregation plus one small top-k window finish the job. Everything is
JVM expressions inside whole-stage codegen — no Python in the loop.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_expr

#: Java regex \s is ASCII-only ([ \t\n\x0B\f\r]) — mirroring it exactly
#: is what keeps driver-tokenized query terms equal to tokens_expr's
#: JVM-side corpus terms. Python's re \s (or str.split()) is
#: Unicode-aware and would split e.g.   where the JVM does not.
_JVM_WS = re.compile("[ \t\n\x0b\f\r]+")


def query_tokens(text) -> list[str]:
    """Driver-side mirror of :func:`prague_spark.pipeline.text.tokens_expr`
    (lowercase, split on JVM ``\\s+``, drop empties) — query strings must
    tokenize EXACTLY like the indexed corpus or terms silently miss the
    postings. The contract is pinned by a torture-set parity test
    (tests/test_temporal_search.py) that fails if either side drifts."""
    return [t for t in _JVM_WS.split(str(text).lower()) if t]


def build_postings(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Inverted-index postings: one row per (doc_id, term) with the term
    frequency ``tf`` and the document's token length ``doc_len`` (carried
    denormalized so scoring never joins back to the corpus).

    One tokenizing projection + ONE shuffle (groupBy doc, term). Persist
    the result (parquet, optionally bucketed by term) to amortize over
    many searches."""
    toks = tokens_expr(F.col(text_col))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("bigint").alias("doc_len"),
            F.explode(toks).alias("term"),
        )
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def corpus_stats(postings: DataFrame) -> tuple[int, float]:
    """(N docs, average doc length) from a postings frame — one agg over
    the per-doc distinct (doc_id, doc_len) pairs. Docs with ZERO tokens
    have no postings and are invisible here; prefer
    :func:`corpus_stats_from_docs` when the raw corpus is at hand (one
    shuffle-free projection agg instead of a postings-wide distinct)."""
    row = (
        postings.select("doc_id", "doc_len")
        .distinct()
        .agg(
            F.count("*").alias("n"),
            F.avg("doc_len").alias("avgdl"),
        )
        .collect()[0]
    )
    return int(row["n"]), float(row["avgdl"] or 0.0)


def corpus_stats_from_docs(
    df: DataFrame, text_col: str
) -> tuple[int, float]:
    """(N docs, average doc length) straight off the corpus: one
    zero-shuffle projection + agg (counts empty documents too, the
    conventional BM25 N). Use with ``bm25_search(..., n_docs=, avgdl=)``
    to skip the postings-wide distinct."""
    row = df.agg(
        F.count("*").alias("n"),
        F.avg(F.size(tokens_expr(F.col(text_col)))).alias("avgdl"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def bm25_search(
    postings: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """BM25 top-``k`` documents for each query string.

    ``queries``: (query_id, query text) pairs — driver-side and small by
    nature (they become one broadcast frame). ``n_docs``/``avgdl``
    override the corpus constants (pass them when the postings frame is
    a pre-filtered slice of a bigger index); otherwise one aggregation
    over ``postings`` derives them.

    Scoring is the Lucene BM25 form: ``idf = ln(1 + (N - df + .5)/(df + .5))``,
    ``tf' = tf*(k1+1) / (tf + k1*(1 - b + b*doc_len/avgdl))``, score =
    sum over matched query terms of ``idf * tf'``. Ties break on doc_id
    ascending so results are deterministic.

    Plan: broadcast query terms -> equi-join postings (prunes to query
    terms at the scan) -> df per term over the pruned slice -> one
    groupBy (query_id, doc) -> one top-k window per query_id.
    """
    spark = postings.sparkSession
    if n_docs is None or avgdl is None:
        n_docs, avgdl = corpus_stats(postings)
    if n_docs == 0:
        raise ValueError("bm25_search: empty corpus (n_docs == 0)")

    # driver-side tokenization mirrors tokens_expr (lowercase, split on
    # whitespace, drop empties) so query terms hit index terms exactly
    qterm_rows = [
        (int(qid), t) for qid, qtext in queries for t in query_tokens(qtext)
    ]
    if not qterm_rows:
        raise ValueError("bm25_search: no query terms")
    qterms = spark.createDataFrame(
        sorted(set(qterm_rows)), "query_id bigint, term string"
    )

    # literal isin BEFORE the join: semantically identical (the join would
    # drop the rows anyway) but this predicate pushes into the parquet
    # scan, so a term-sorted persisted index (write_postings) prunes row
    # groups by term min/max before a single byte shuffles
    all_terms = sorted({t for _, t in qterm_rows})
    matched = postings.filter(F.col("term").isin(all_terms)).join(
        F.broadcast(qterms), "term"
    )
    # document frequency per term, computed on the pruned slice (df of a
    # term not in any query is never needed); broadcast back — bounded by
    # the number of distinct query terms
    dfreq = (
        matched.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(float(avgdl)))
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .withColumn("_contrib", idf * tf_norm)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_idf(n_docs: int, df: int) -> float:
    """Driver-side reference of the idf formula (tests/oracles)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def rrf_fuse(
    results: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked result lists — the standard
    hybrid-retrieval combiner (lexical :func:`bm25_search` + embedding
    ``similarity.cosine_topk``, or any mix): each list contributes
    ``1 / (k + rank)`` per (query_id, id); missing from a list = no
    contribution. Returns (query_id, id, rrf_score, rank), ties broken
    on id ascending.

    Every input needs (query_id, ``id_col``, rank). Plan: a union of the
    (already tiny — top-k-sized) result frames, one groupBy, one window:
    fusion cost is independent of corpus size by construction."""
    if not results:
        raise ValueError("rrf_fuse: no result frames")
    parts = [
        r.select(
            "query_id",
            F.col(id_col).alias("_id"),
            (1.0 / (F.lit(float(k)) + F.col("rank"))).alias("_c"),
        )
        for r in results
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "_id").agg(F.sum("_c").alias("rrf_score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("_id").asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out.select(
        "query_id", F.col("_id").alias(id_col), "rrf_score", "rank"
    )


def write_postings(postings: DataFrame, path: str, n_files: int = 64) -> None:
    """Persist a postings index term-clustered: range-repartition +
    sort-within-partitions on ``term`` so every parquet row group covers
    a narrow term range. A later :func:`bm25_search` pushes its literal
    term filter into the scan and prunes row groups by the term min/max
    stats — at 100 TB a search touches only the files containing its
    query terms, not the corpus-sized index."""
    (
        postings.repartitionByRange(n_files, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_postings(spark, path: str) -> DataFrame:
    """Load a persisted postings index (see :func:`write_postings`)."""
    return spark.read.parquet(path)
