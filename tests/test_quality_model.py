"""Trainable document-quality filter (pipeline.quality_model): the
hashing-vectorizer -> sparse binomial SLOPE -> O(nnz) scoring
composition. Planted marker tokens make the problem separable, so the
filter must recover them on HELD-OUT documents; the scoring plan must
stay JVM-side with no densification."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prague_spark.pipeline.quality_model import (
    score_quality, train_quality_filter,
)
from prague_spark.plan_audit import audit


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # planted signal: 'good' docs carry two marker tokens, 'bad' docs two
    # others, on top of the real word-bag text (label by doc_id parity
    # so the split is deterministic and balanced)
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "good").otherwise("bad").alias("ql"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" lucid cogent lucid")),
        ).otherwise(
            F.concat(F.col("text"), F.lit(" spammy junky spammy")),
        ).alias("text"),
    ).cache()


def test_quality_filter_learns_and_scores_heldout(spark, labeled):
    train = labeled.filter(F.col("doc_id") % 10 < 7)
    test = labeled.filter(F.col("doc_id") % 10 >= 7)
    qf = train_quality_filter(
        train, "doc_id", "text", "ql",
        n_features=2**12, n_sigma=6, lambda_min_ratio=0.05,
    )
    assert qf.positive_class == "good"  # last sorted label
    scored = score_quality(
        test, qf, "doc_id", "text", keep_threshold=0.5,
    ).cache()
    rows = scored.select("ql", "q_prob", "q_prob_keep").collect()
    assert all(r["q_prob"] is not None for r in rows)
    # the planted markers separate the classes on held-out docs
    good = [r["q_prob"] for r in rows if r["ql"] == "good"]
    bad = [r["q_prob"] for r in rows if r["ql"] == "bad"]
    assert min(good) > max(bad)
    assert all(r["q_prob_keep"] == (r["ql"] == "good") for r in rows)
    # ranking quality as the engine's own AUC
    from prague_spark.ops.score import auc

    y2 = F.when(F.col("ql") == "good", 1.0).otherwise(0.0)
    assert auc(scored.select(F.col("q_prob").alias("p"), y2.alias("y2")),
               "p", F.col("y2")) == pytest.approx(1.0)
    scored.unpersist()

    # scoring plan: JVM-side, no Python stage, no densified row explode
    a = audit(score_quality(test, qf, "doc_id", "text"))
    assert a.py_stages == 0
    assert a.nested_loops == 0 and a.cartesians == 0

    # an empty document scores the intercept-only base rate, not NULL
    empty = spark.createDataFrame(
        [(999_999, "")], "doc_id long, text string"
    )
    r = score_quality(empty, qf, "doc_id", "text").select("q_prob").first()
    assert r["q_prob"] is not None and 0.0 <= r["q_prob"] <= 1.0


def test_quality_filter_cv_picks_path_point(spark, labeled):
    """cv_folds tunes the penalty level: the filter carries the
    CV-chosen path_idx (direction-aware auc optimum), scoring replays
    it by default, and the CV's own base fit is reused as the model —
    held-out separation must still hold at the chosen point."""
    train = labeled.filter(F.col("doc_id") % 10 < 7)
    test = labeled.filter(F.col("doc_id") % 10 >= 7)
    qf = train_quality_filter(
        train, "doc_id", "text", "ql",
        n_features=2**12, n_sigma=4, lambda_min_ratio=0.1,
        cv_folds=3,
    )
    assert qf.path_idx is not None
    assert 0 <= qf.path_idx < qf.model.n_path
    scored = score_quality(test, qf, "doc_id", "text")
    rows = scored.select("ql", "q_prob").collect()
    good = [r["q_prob"] for r in rows if r["ql"] == "good"]
    bad = [r["q_prob"] for r in rows if r["ql"] == "bad"]
    assert min(good) > max(bad)
    # default scoring replays the filter's point: identical to asking
    # for it explicitly, different from a forced path_idx=0 (the
    # intercept-heavy start of the path) unless CV chose 0
    explicit = {
        r["doc_id"]: r["q_prob"]
        for r in score_quality(
            test, qf, "doc_id", "text", path_idx=qf.path_idx
        ).collect()
    }
    default = {r["doc_id"]: r["q_prob"] for r in scored.collect()}
    assert default == explicit


def test_quality_filter_tfidf_rejected(labeled):
    # rejected at TRAIN time — before the corpus-scale fit is paid for
    with pytest.raises(ValueError, match="tfidf"):
        train_quality_filter(
            labeled, "doc_id", "text", "ql",
            n_features=2**10, weighting="tfidf", n_sigma=3,
            lambda_min_ratio=0.2,
        )
    # ... and at SCORE time for a hand-built filter object
    from prague_spark.pipeline.quality_model import QualityFilter

    qf = QualityFilter(model=None, n_features=2**10, weighting="tfidf",
                       l2_norm=False, positive_class="good")
    with pytest.raises(ValueError, match="tfidf"):
        score_quality(labeled, qf, "doc_id", "text")


def test_quality_filter_save_load_roundtrip(spark, labeled, tmp_path):
    """The filter artifact round-trips: load in a fresh-session-shaped
    test and score with IDENTICAL probabilities (the restored betas and
    config are the same doubles, so the gate replays bit-exactly).
    Validation fails loud on mismatched artifacts."""
    import json

    from prague_spark.pipeline.quality_model import (
        load_quality_filter, save_quality_filter,
    )

    train = labeled.filter(F.col("doc_id") % 10 < 7)
    test = labeled.filter(F.col("doc_id") % 10 >= 7).limit(60)
    qf = train_quality_filter(
        train, "doc_id", "text", "ql",
        n_features=2**12, n_sigma=4, lambda_min_ratio=0.1,
    )
    path = str(tmp_path / "qfilter")
    save_quality_filter(spark, qf, path)
    qf2 = load_quality_filter(spark, path)
    assert (qf2.n_features, qf2.weighting, qf2.l2_norm,
            qf2.positive_class, qf2.path_idx) == (
        qf.n_features, qf.weighting, qf.l2_norm,
        qf.positive_class, qf.path_idx,
    )
    want = {
        r["doc_id"]: r["q_prob"]
        for r in score_quality(test, qf, "doc_id", "text").collect()
    }
    got = {
        r["doc_id"]: r["q_prob"]
        for r in score_quality(test, qf2, "doc_id", "text").collect()
    }
    assert got == want  # exact equality: identical literals

    # sparse disk form: far fewer coef rows than the dense grid
    n_rows = spark.read.parquet(f"{path}/model/coefs").count()
    assert n_rows < (2**12 + 1) * qf.model.n_path / 4

    # mismatched artifacts fail loud before anything is scored
    cfg = json.loads(
        spark.read.parquet(f"{path}/config").first()["config"]
    )
    bad = dict(cfg)
    bad["n_features"] = 2**10
    spark.createDataFrame([(json.dumps(bad),)], "config string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/config")
    with pytest.raises(ValueError, match="n_features"):
        load_quality_filter(spark, path)
    bad = dict(cfg)
    bad["positive_class"] = "mediocre"
    spark.createDataFrame([(json.dumps(bad),)], "config string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/config")
    with pytest.raises(ValueError, match="positive_class"):
        load_quality_filter(spark, path)
    bad = dict(cfg)
    bad["path_idx"] = 99
    spark.createDataFrame([(json.dumps(bad),)], "config string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/config")
    with pytest.raises(ValueError, match="path_idx=99"):
        load_quality_filter(spark, path)
