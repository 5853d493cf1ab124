"""Feature-hashing text vectorizer — the bridge from the document
pipeline into the engine's sparse GLM surface (beyond-reference
extension; the hashing-trick vectorizer every large-scale text
classifier starts from).

Output is the SAME long-format (row_id, col_id, value) triplet contract
:func:`prague_spark.ops.sparse.fit_sparse` consumes, so
``hashing_vectorizer(docs) |> fit_sparse(..., family="binomial")`` is a
complete distributed text-classification pipeline with NO vocabulary
build, no driver-side state, and a fixed feature space independent of
corpus size — the property that makes the hashing trick the 100 TB
vectorizer (a dictionary vectorizer needs a corpus-wide vocab pass and
an unbounded broadcast).

Scale: one tokenize + explode projection and ONE shuffle (groupBy
(doc, bucket) — hash collisions sum into the bucket inside the same
aggregation, the standard hashing-trick semantics). The optional idf
weighting adds one bounded aggregation (n_features rows) broadcast
back. Hashes are md5-based (exact in any engine — the DuckDB oracle
recomputes them bit-for-bit), not JVM-private.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_expr


def term_hash_expr(term, n_features: int):
    """Cross-engine stable bucket for a term: first 8 md5 hex chars as a
    32-bit int, mod n_features. DuckDB mirror:
    ('0x' || substr(md5(t), 1, 8))::BIGINT % n."""
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("bigint")
        % n_features
    ).cast("int")


def hashing_vectorizer(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 2**18,
    weighting: str = "tf",
    l2_norm: bool = False,
) -> DataFrame:
    """Hash each document's tokens into ``n_features`` buckets; return
    sparse triplets (row_id, col_id, value) ready for ``fit_sparse`` /
    ``sparse_xtv``.

    ``weighting``: 'tf' (bucket term count), 'binary' (1.0 if the bucket
    is hit), 'logtf' (1 + ln tf), or 'tfidf' (tf x ln((1+N)/(1+df)) + 1
    — the smoothed idf, df counted per BUCKET over the corpus, one extra
    bounded aggregation). ``l2_norm=True`` scales every document's
    vector to unit L2 norm (one window over row_id).
    """
    if weighting not in ("tf", "binary", "logtf", "tfidf"):
        raise ValueError(f"unknown weighting {weighting!r}")
    toks = tokens_expr(F.col(text_col))
    trip = (
        df.select(
            F.col(id_col).cast("bigint").alias("row_id"),
            F.explode(toks).alias("_term"),
        )
        .withColumn("col_id", term_hash_expr(F.col("_term"), n_features))
        .groupBy("row_id", "col_id")
        .agg(F.count("*").cast("double").alias("value"))
    )
    if weighting == "binary":
        trip = trip.withColumn("value", F.lit(1.0))
    elif weighting == "logtf":
        trip = trip.withColumn("value", F.lit(1.0) + F.log("value"))
    elif weighting == "tfidf":
        n_docs = df.select(F.col(id_col)).distinct().count()
        dfreq = trip.groupBy("col_id").agg(
            F.count("*").cast("double").alias("_df")
        )
        idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("_df"))) + 1.0
        trip = (
            trip.join(F.broadcast(dfreq), "col_id")
            .withColumn("value", F.col("value") * idf)
            .drop("_df")
        )
    if l2_norm:
        from pyspark.sql import Window

        w = Window.partitionBy("row_id")
        nrm = F.sqrt(F.sum(F.col("value") * F.col("value")).over(w))
        trip = trip.withColumn("value", F.col("value") / nrm)
    return trip.select("row_id", "col_id", "value")
