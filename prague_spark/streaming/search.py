"""Streaming lexical search: a stream of query strings scored against a
STATIC postings index — the online-retrieval twin of
``pipeline.search.bm25_search``, mirroring the stream-static design of
``streaming.similarity`` (every step a pure projection or an equi-join
against a static frame, so Structured Streaming runs it STATELESSLY in
append mode with zero state store).

The per-(query, doc) score is a sum over matched terms — an aggregation
a stateless stream cannot fold — so the stream emits per-(query, doc,
term) CONTRIBUTION rows; all of a query's contributions co-arrive in
its micro-batch, so the sink finishes with a tiny per-batch groupBy +
top-k window (the same foreachBatch convention as
``ivf_candidates_stream``). Batch/stream parity is pinned in
``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.text import tokens_expr


def term_idf(postings: DataFrame, n_docs: int) -> DataFrame:
    """Static (term, df, idf) index off a postings frame — ONE groupBy
    (postings are unique per (doc, term), so count(*) is the document
    frequency). Lucene idf: ln(1 + (N - df + .5)/(df + .5)). Persist it:
    every micro-batch joins against it."""
    dfc = F.col("df")
    return (
        postings.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0) + (F.lit(float(n_docs)) - dfc + 0.5) / (dfc + 0.5)
            ),
        )
    )


def bm25_contributions_stream(
    queries: DataFrame,
    qid_col: str,
    qtext_col: str,
    postings: DataFrame,
    idf: DataFrame,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Append-mode (query_id, doc_id, contrib) rows for a STREAM of
    query strings: tokenize + distinct-term explode (pure projection),
    stream-static equi-join the postings on term (only matching postings
    ship), join the static idf index, emit each term's BM25 contribution.
    Distinct query terms match ``bm25_search``'s distinct-term scoring.

    Exact top-k per query in the sink (contributions co-arrive):

        def sink(batch_df, _):
            s = batch_df.groupBy("query_id", "doc_id").agg(
                F.sum("contrib").alias("score"))
            w = Window.partitionBy("query_id").orderBy(
                F.col("score").desc(), F.col("doc_id"))
            s.withColumn("rank", F.row_number().over(w)) \\
                .filter(F.col("rank") <= k)...
    """
    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens_expr(F.col(qtext_col)))
        ).alias("term"),
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(float(avgdl)))
    )
    return (
        qterms.join(postings, "term")
        .join(idf.select("term", "idf"), "term")
        .select(
            "query_id",
            "doc_id",
            (F.col("idf") * tf_norm).alias("contrib"),
        )
    )
