"""Hashing-trick vectorizer: cross-engine-stable buckets, weighting
variants, and the end-to-end documents -> triplets -> sparse GLM
classifier composition."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from prague_spark.pipeline.vectorize import hashing_vectorizer


def _bucket(term: str, n: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n


def _brute(corpus, n):
    out: dict = {}
    for did, text in corpus:
        for t in text.lower().split():
            k = (did, _bucket(t, n))
            out[k] = out.get(k, 0.0) + 1.0
    return out


CORPUS = [
    (0, "spark shuffle join spark spark"),
    (1, "hash join broadcast join"),
    (2, "window sort merge sort"),
]


def test_hashing_vectorizer_tf_matches_md5_bruteforce(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    got = {
        (r["row_id"], r["col_id"]): r["value"]
        for r in hashing_vectorizer(docs, "doc_id", "text", 64).collect()
    }
    assert got == _brute(CORPUS, 64)


def test_hashing_vectorizer_weightings(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    tf = _brute(CORPUS, 64)
    binary = {
        (r["row_id"], r["col_id"]): r["value"]
        for r in hashing_vectorizer(
            docs, "doc_id", "text", 64, weighting="binary"
        ).collect()
    }
    assert binary == {k: 1.0 for k in tf}
    logtf = {
        (r["row_id"], r["col_id"]): r["value"]
        for r in hashing_vectorizer(
            docs, "doc_id", "text", 64, weighting="logtf"
        ).collect()
    }
    for k, v in tf.items():
        assert logtf[k] == pytest.approx(1.0 + math.log(v))
    # tfidf: recompute smoothed idf per bucket
    dfreq: dict = {}
    for (_, c) in tf:
        dfreq[c] = dfreq.get(c, 0) + 1
    tfidf = {
        (r["row_id"], r["col_id"]): r["value"]
        for r in hashing_vectorizer(
            docs, "doc_id", "text", 64, weighting="tfidf"
        ).collect()
    }
    for (d, c), v in tf.items():
        exp = v * (math.log((1 + 3) / (1 + dfreq[c])) + 1.0)
        assert tfidf[(d, c)] == pytest.approx(exp)


def test_hashing_vectorizer_l2_norm(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    rows = hashing_vectorizer(
        docs, "doc_id", "text", 64, l2_norm=True
    ).collect()
    norms: dict = {}
    for r in rows:
        norms[r["row_id"]] = norms.get(r["row_id"], 0.0) + r["value"] ** 2
    for d, n2 in norms.items():
        assert n2 == pytest.approx(1.0)


def test_text_classifier_end_to_end(spark, sf_dir):
    """documents -> hashing_vectorizer -> fit_sparse(binomial) ->
    score_sparse: the full distributed text-classification composition
    on real testdata. Separability of the synthetic labels is not the
    point — the contract (triplets flow into the sparse GLM, the path
    is finite, scoring runs) is."""
    from prague_spark.ops.sparse import fit_sparse, score_sparse

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    trip = hashing_vectorizer(docs, "doc_id", "text", n_features=128)
    ydf = docs.select(
        F.col("doc_id").alias("row_id"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    m = fit_sparse(
        trip, ydf, "y", "binomial", n_cols=128,
        n_sigma=3, lambda_min_ratio=0.3,
    )
    assert m.n_path >= 1
    assert all(math.isfinite(x) for x in m.betas.ravel())
    mse = score_sparse(trip, ydf, m, "y", "mse")
    assert 0.0 <= mse <= 1.0
