"""Trainable document-quality filter: the fasttext-style classifier a
corpus-curation pipeline gates on (label a few thousand docs good/bad,
train a linear model over hashed token features, score the whole
corpus), composed entirely from already-oracled engine pieces:

- featurization: :func:`prague_spark.pipeline.vectorize.hashing_vectorizer`
  — raw text to sparse (row_id, col_id, value) triplets in ONE shuffle,
  no vocabulary build, so featurizing 100 TB is a single pass;
- training: :func:`prague_spark.ops.sparse.fit_sparse` binomial SLOPE
  path on the triplets — never densified, wide feature spaces (2^18+)
  ride the strong-rule screening + in-core subset route;
- scoring: :func:`prague_spark.ops.sparse.predict_sparse` — one
  broadcast join of the (sparse!) coefficients + one groupBy(row): the
  whole-corpus gate is O(nnz).

Greenfield beyond the reference surface (SURVEY.md §7.9); the GLM
underneath is the reference's model (``R/owl.R``), which is what makes
the filter trainable with a convex, reproducible objective instead of a
black box.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .vectorize import hashing_vectorizer

__all__ = [
    "QualityFilter", "train_quality_filter", "score_quality",
    "save_quality_filter", "load_quality_filter",
]


@dataclass
class QualityFilter:
    """A fitted quality gate: the sparse GLM plus the featurization
    config scoring must replay exactly (same hash space, same
    weighting). ``positive_class`` is the label scored as "good"
    (= the model's SECOND sorted class, matching preprocess_response).
    ``path_idx``: the CV-chosen path point (set by ``cv_folds``; None
    scores the deepest point, the pre-round-9 behavior)."""

    model: object  # SlopeModel from fit_sparse
    n_features: int
    weighting: str
    l2_norm: bool
    positive_class: str
    path_idx: int | None = None


def train_quality_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    n_features: int = 2**15,
    weighting: str = "logtf",
    l2_norm: bool = False,
    cv_folds: int | None = None,
    cv_measure: str = "auc",
    **fit_kwargs,
) -> QualityFilter:
    """Fit the quality classifier on labeled documents. ``label_col``
    must hold exactly two values (e.g. 'good'/'bad'); the LAST sorted
    label becomes the positive class, so ``score_quality``'s probability
    is P(that label). ``fit_kwargs`` pass through to ``fit_sparse``
    (n_sigma, lambda_min_ratio, q, ...).

    ``cv_folds``: tune the penalty level instead of scoring the deepest
    path point — k-fold CV on the SAME sparse triplets
    (:func:`prague_spark.ops.sparse.cv_fit_sparse`, direction-aware
    ``optimum='best'``, default measure auc), reusing the CV's own
    full-data base fit as the filter's model (no second fit). The
    chosen point travels on the filter (``path_idx``), so scoring
    replays it."""
    if weighting == "tfidf":
        # reject BEFORE the (potentially corpus-scale) fit is paid for:
        # idf statistics are train-corpus-dependent, so the filter could
        # never score another corpus — see score_quality's guard
        raise ValueError(
            "train_quality_filter: tfidf weighting is train-corpus-"
            "dependent and cannot transfer to scoring; use "
            "'tf'/'logtf'/'binary'"
        )
    trip = hashing_vectorizer(
        docs, id_col, text_col, n_features=n_features,
        weighting=weighting, l2_norm=l2_norm,
    )
    ydf = docs.select(
        F.col(id_col).cast("bigint").alias("row_id"),
        F.col(label_col).cast("string").alias("_y"),
    )
    fit_kwargs.setdefault("n_sigma", 20)
    fit_kwargs.setdefault("lambda_min_ratio", 0.05)
    path_idx = None
    if cv_folds:
        from ..ops.sparse import cv_fit_sparse

        res = cv_fit_sparse(
            trip, ydf, "_y", "binomial", n_cols=n_features,
            n_folds=int(cv_folds), measures=[cv_measure], optimum="best",
            **fit_kwargs,
        )
        model = res.model  # the CV's full-data base fit — no second fit
        path_idx = int(res.optima[0]["sigma_idx"])
    else:
        from ..ops.sparse import fit_sparse

        model = fit_sparse(
            trip, ydf, "_y", "binomial", n_cols=n_features, **fit_kwargs,
        )
    return QualityFilter(
        model=model,
        n_features=n_features,
        weighting=weighting,
        l2_norm=l2_norm,
        positive_class=str(model.class_names[1]),
        path_idx=path_idx,
    )


def save_quality_filter(spark, qf: QualityFilter, path: str) -> None:
    """Persist a trained quality gate: the sparse GLM through the
    oracle-gated model sink (``SlopeModel.save`` — zero coefficients are
    skipped on disk, so a 2^15-feature filter saves O(nonzero) rows)
    plus a one-row JSON config table (featurization + CV-chosen path
    point). A filter is only replayable with its EXACT featurization
    config, so the two always travel together — the ``save_grouped``
    pattern for the curation layer's model artifact."""
    import json

    if not isinstance(qf, QualityFilter):
        raise ValueError(
            f"save_quality_filter: expected a QualityFilter, got "
            f"{type(qf).__name__}"
        )
    qf.model.save(spark, f"{path}/model")
    cfg = dict(
        n_features=int(qf.n_features),
        weighting=str(qf.weighting),
        l2_norm=bool(qf.l2_norm),
        positive_class=str(qf.positive_class),
        path_idx=None if qf.path_idx is None else int(qf.path_idx),
    )
    spark.createDataFrame(
        [(json.dumps(cfg),)], "config string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/config")


def load_quality_filter(spark, path: str) -> QualityFilter:
    """Restore a :func:`save_quality_filter` artifact, validating the
    pieces agree BEFORE any corpus is scored: the model must be the
    binomial GLM the scorer expects, the config's positive class must be
    the model's second sorted class (``score_quality`` scores P(that
    label)), the feature space must match the model's width, and the
    CV-chosen path point must exist on the restored path — a mismatch in
    any of these would otherwise surface as silently-shifted scores."""
    import json

    from ..model import SlopeModel

    model = SlopeModel.load(spark, f"{path}/model")
    cfg = json.loads(
        spark.read.parquet(f"{path}/config").first()["config"]
    )
    if model.family != "binomial":
        raise ValueError(
            f"load_quality_filter: {path!r} holds a {model.family!r} "
            "model — the quality gate is a binomial classifier"
        )
    if len(model.feature_names) != int(cfg["n_features"]):
        raise ValueError(
            f"load_quality_filter: config says n_features="
            f"{cfg['n_features']} but the model has "
            f"{len(model.feature_names)} features — mismatched artifacts?"
        )
    if str(model.class_names[1]) != cfg["positive_class"]:
        raise ValueError(
            f"load_quality_filter: config positive_class="
            f"{cfg['positive_class']!r} is not the model's second sorted "
            f"class {model.class_names[1]!r} — mismatched artifacts?"
        )
    pidx = cfg.get("path_idx")
    if pidx is not None and not (0 <= int(pidx) < model.n_path):
        raise ValueError(
            f"load_quality_filter: CV-chosen path_idx={pidx} is outside "
            f"the restored path (n_path={model.n_path})"
        )
    return QualityFilter(
        model=model,
        n_features=int(cfg["n_features"]),
        weighting=str(cfg["weighting"]),
        l2_norm=bool(cfg["l2_norm"]),
        positive_class=str(cfg["positive_class"]),
        path_idx=None if pidx is None else int(pidx),
    )


def score_quality(
    docs: DataFrame,
    qf: QualityFilter,
    id_col: str,
    text_col: str,
    *,
    path_idx: int | None = None,
    out: str = "q_prob",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Attach P(positive class) to every document (and, with
    ``keep_threshold``, a boolean ``{out}_keep`` gate). Re-featurizes
    with the filter's OWN config — a mismatched hash space would score
    garbage silently, so the config travels with the model. ``path_idx``
    defaults to the filter's CV-chosen point (``qf.path_idx``, set by
    ``train_quality_filter(cv_folds=...)``), else the deepest. The plan
    is one vectorizer shuffle + one broadcast-coefficient join + one
    groupBy(row): O(nnz), no densification, corpus-scale safe.

    Documents with no tokens hitting a nonzero coefficient score the
    intercept-only probability (the model's base rate), not NULL."""
    from ..ops.sparse import predict_sparse

    if qf.weighting == "tfidf":
        # idf statistics are corpus-dependent; scoring a different corpus
        # with training-corpus idf needs a carried df table — not
        # supported, and silently recomputing idf on the scored corpus
        # would shift every feature. Fail loud.
        raise ValueError(
            "score_quality: tfidf weighting is train-corpus-dependent; "
            "train the filter with 'tf'/'logtf'/'binary' weighting"
        )
    trip = hashing_vectorizer(
        docs, id_col, text_col, n_features=qf.n_features,
        weighting=qf.weighting, l2_norm=qf.l2_norm,
    )
    rows = docs.select(F.col(id_col).cast("bigint").alias("row_id"))
    if path_idx is None:
        path_idx = qf.path_idx  # the CV-chosen point travels on the filter
    pred = predict_sparse(
        trip, qf.model, rows=rows, path_idx=path_idx,
        type="response", out=out,
    )
    scored = docs.join(
        pred.withColumnRenamed("row_id", "_qm_row"),
        F.col(id_col).cast("bigint") == F.col("_qm_row"),
        "left",
    ).drop("_qm_row")
    if keep_threshold is not None:
        scored = scored.withColumn(
            f"{out}_keep", F.col(out) >= F.lit(float(keep_threshold))
        )
    return scored
