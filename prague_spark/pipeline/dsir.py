"""DSIR-style data selection: importance resampling toward a target
distribution over hashed n-gram features (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling").

Greenfield beyond the reference surface (SURVEY.md §7.9). The recipe a
pretraining pipeline runs to pull target-domain-like documents out of a
raw web corpus:

1. featurize every document as a bag of hashed (uni+bi)gram buckets —
   the same md5 bucket rule as ``vectorize.hashing_vectorizer``, so
   features are engine-portable and need no vocabulary build;
2. estimate two bucket distributions from INTEGER counts (target
   corpus, raw corpus) — one groupBy each, then a driver-side
   ``n_buckets``-sized log-ratio table (model-sized, like a coefficient
   vector);
3. score every raw document with the log importance weight
   ``log w(x) = sum over grams of log p_target(b) - log p_raw(b)``;
4. select via deterministic Gumbel top-k — sampling WITHOUT replacement
   proportional to ``w(x)``, replayable because the Gumbel noise comes
   from md5 of the document id, not an RNG.

Scale design: the featurization is a zero-shuffle projection; the two
count aggregations shuffle slim (bucket, count) rows; scoring is a pure
codegen fold over a broadcast literal table (``method='literal'``, the
default up to ~2^16 buckets) or one explode + broadcast equi-join +
groupBy(id) (``method='join'``, for bucket spaces too wide to inline);
selection is a TakeOrdered top-k (per-partition heads + driver merge),
never a global sort.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .text import ngrams_expr, tokens_expr
from .vectorize import term_hash_expr

__all__ = [
    "dsir_grams_expr",
    "dsir_bucket_expr",
    "dsir_ngram_counts",
    "dsir_log_ratio",
    "dsir_logweights",
    "dsir_gumbel_select",
    "dsir_threshold_select",
]


def dsir_grams_expr(text_col):
    """Unigram + bigram feature grams of the lowercased whitespace
    tokenization (the DSIR paper's hashed-ngram feature set). Uses the
    shared ``text.ngrams_expr`` sliding window, guarded to documents
    with >= 2 tokens — the clipped partial gram ``ngrams_expr`` emits
    for shorter documents would double-count a 1-token document's only
    token (and give a token-less document a phantom '' feature), so
    sub-bigram documents contribute unigrams only and an empty document
    has NO features and scores exactly 0. DuckDB mirror:
    list_concat(toks, CASE WHEN len(toks) >= 2 THEN
    list_transform(range(1, len(toks)), i ->
    array_to_string(toks[i:i+1], ' ')) ELSE [] END). NULL text is an
    EMPTY gram set (not NULL), so both scoring methods agree that such
    a document weighs exactly 0.

    The token array is let-bound before the unigram+bigram assembly
    (the ngrams_expr convention): inlined, its three references would
    each re-tokenize the raw text."""

    def _feats(tk):
        return F.concat(
            tk,
            F.when(F.size(tk) >= 2, ngrams_expr(tk, 2))
            .otherwise(F.array().cast("array<string>")),
        )

    toks = F.coalesce(
        tokens_expr(F.col(text_col)), F.array().cast("array<string>")
    )
    return F.get(F.transform(F.array(toks), _feats), 0)


def dsir_bucket_expr(gram, n_buckets: int):
    """gram -> bucket in [0, n_buckets): the ONE engine-portable bucket
    rule (``vectorize.term_hash_expr`` — first 8 md5 hex chars mod B),
    shared with the hashing vectorizer so the two feature spaces and
    their SQL mirrors can never drift."""
    return term_hash_expr(gram, n_buckets)


def dsir_ngram_counts(
    df: DataFrame, text_col: str, *, n_buckets: int = 2**14
) -> DataFrame:
    """Corpus bucket counts: one explode + ONE groupBy on the bucket id.
    Returns (bucket, cnt) with only occupied buckets present."""
    grams = dsir_grams_expr(text_col)
    return (
        df.select(F.explode(grams).alias("_g"))
        .select(dsir_bucket_expr(F.col("_g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    n_buckets: int,
    smoothing: float = 1.0,
) -> list[float]:
    """Driver-side log importance-ratio table (``n_buckets`` floats —
    model-sized, the legitimate collect): ``log p_target(b) -
    log p_raw(b)`` with add-``smoothing`` regularization so unseen
    buckets are defined. The two inputs are :func:`dsir_ngram_counts`
    frames."""
    def _vec(cdf: DataFrame) -> tuple[list[int], int]:
        v = [0] * n_buckets
        for r in cdf.collect():
            b = int(r["bucket"])
            if b >= n_buckets:
                # a mismatched table is not an error Spark would raise:
                # too-large n_buckets pads phantom smoothing-only slots
                # and MISALIGNS scoring's hash space with the counts —
                # every weight silently garbage. Fail loud instead.
                raise ValueError(
                    f"dsir_log_ratio: bucket {b} >= n_buckets="
                    f"{n_buckets}; the count frames were built with a "
                    "different n_buckets — pass the same value to "
                    "dsir_ngram_counts, dsir_log_ratio and "
                    "dsir_logweights"
                )
            v[b] = int(r["cnt"])
        return v, sum(v)

    t, t_tot = _vec(target_counts)
    r, r_tot = _vec(raw_counts)
    td = float(t_tot) + smoothing * n_buckets
    rd = float(r_tot) + smoothing * n_buckets
    return [
        math.log((t[b] + smoothing) / td) - math.log((r[b] + smoothing) / rd)
        for b in range(n_buckets)
    ]


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    log_ratio: list[float],
    *,
    out: str = "dsir_logw",
    method: str = "literal",
) -> DataFrame:
    """Attach the log importance weight: the sum of the table entry for
    every feature gram (occurrences counted, as in the paper's product
    of per-gram ratios).

    ``method='literal'`` (default): the table rides the plan as ONE
    array literal and the sum is a codegen left fold — zero shuffle,
    zero Python, the whole-corpus scoring pass is a projection. The
    fold order is the gram order, so a DuckDB oracle reproduces it
    bit-exactly via ``list_dot_product(vals, ones)``. Right up to
    ~2^16 buckets (the literal is 8B/bucket in the task binary).

    ``method='join'``: explode grams -> broadcast equi-join against the
    (bucket, ratio) table -> groupBy(id) sum — one data shuffle on the
    id, for bucket spaces too wide to inline. Summation order is then
    partition-dependent (equal up to float reassociation)."""
    n_buckets = len(log_ratio)
    if method == "literal":
        # the table literal is built as split(<csv literal>)::array<double>
        # — ONE string literal, constant-folded by Catalyst into the
        # array before execution. The naive forms (F.array of 16k
        # F.lit's, or F.lit(list)) cost ~8 s of DRIVER time at 2^14
        # buckets: one py4j round trip per element plus a
        # 16k-child CreateArray the analyzer walks per rule. repr()
        # round-trips doubles exactly, so the folded values are
        # bit-identical (pinned by the DuckDB cross-check).
        vals_csv = []
        for x in log_ratio:
            x = float(x)
            if not math.isfinite(x):
                raise ValueError(
                    "dsir_logweights: log_ratio entries must be finite"
                )
            vals_csv.append(repr(x))
        table = F.split(F.lit(",".join(vals_csv)), ",").cast("array<double>")
        vals = F.transform(
            dsir_grams_expr(text_col),
            lambda g: F.element_at(table, dsir_bucket_expr(g, n_buckets).cast("int") + 1),
        )
        return df.withColumn(
            out, F.aggregate(vals, F.lit(0.0), lambda acc, v: acc + v)
        )
    if method != "join":
        raise ValueError(f"dsir_logweights: unknown method {method!r}")
    spark = df.sparkSession
    ratios = spark.createDataFrame(
        [(b, float(x)) for b, x in enumerate(log_ratio)],
        "bucket long, _ratio double",
    )
    per_doc = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(dsir_grams_expr(text_col)).alias("_g"),
        )
        .select("_id", dsir_bucket_expr(F.col("_g"), n_buckets).alias("bucket"))
        .join(F.broadcast(ratios), "bucket")
        .groupBy("_id")
        .agg(F.sum("_ratio").alias(out))
    )
    return (
        df.alias("_d")
        .join(
            per_doc.withColumnRenamed("_id", "_dw_id"),
            F.col(id_col) == F.col("_dw_id"),
            "left",
        )
        # a doc with zero grams has weight 0 (empty product), not NULL
        .select("_d.*", F.coalesce(F.col(out), F.lit(0.0)).alias(out))
    )


def _gumbel_expr(id_col: str, seed: str):
    """Deterministic standard-Gumbel noise from md5(seed:id) — the
    ``sample.hash_unit`` convention, shared by both selectors."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))), 1, 8
            ),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))  # u in (0, 1), never exactly 0 or 1
    return -F.log(-F.log(u))


def dsir_gumbel_select(
    df: DataFrame,
    id_col: str,
    logw_col: str,
    n_keep: int,
    *,
    seed: str = "dsir",
) -> DataFrame:
    """Deterministic Gumbel top-k: keep the ``n_keep`` rows with the
    largest ``logw + Gumbel(md5(seed:id))`` — exactly sampling without
    replacement with probability proportional to ``exp(logw)``, but
    replayable (the noise is a hash of the id, the
    ``sample.hash_unit`` convention) and shard-stable.

    Plan: one TakeOrdered (per-partition top-``n_keep`` heads merged on
    the driver, k x partitions rows) — NEVER a global sort. ``n_keep``
    must be driver-sized; for corpus-fraction budgets use
    :func:`dsir_threshold_select` instead."""
    return (
        df.withColumn("_dsir_key", F.col(logw_col) + _gumbel_expr(id_col, seed))
        .orderBy(F.col("_dsir_key").desc(), F.col(id_col))
        .limit(int(n_keep))
        .drop("_dsir_key")
    )


def dsir_threshold_select(
    df: DataFrame,
    id_col: str,
    logw_col: str,
    frac: float,
    *,
    seed: str = "dsir",
    accuracy: int = 10_000,
) -> DataFrame:
    """Corpus-fraction variant of :func:`dsir_gumbel_select` for budgets
    too large to merge on the driver (TakeOrdered collects
    k x partitions head rows): estimate the (1 - frac) quantile of the
    Gumbel-perturbed key with ONE ``percentile_approx`` aggregation,
    then keep rows above it — a pure filter afterwards, so the selected
    fraction is approximate (sketch error) but the plan touches nothing
    driver-sized. Same deterministic md5 Gumbel noise as the exact
    top-k, so a row's key is identical under both selectors."""
    if not 0.0 < frac < 1.0:
        raise ValueError("dsir_threshold_select: frac must be in (0, 1)")
    keyed = df.withColumn(
        "_dsir_key", F.col(logw_col) + _gumbel_expr(id_col, seed)
    )
    cut = keyed.agg(
        F.percentile_approx(
            F.col("_dsir_key"), F.lit(1.0 - frac), F.lit(accuracy)
        )
    ).collect()[0][0]
    if cut is None:  # empty input: nothing to select, don't TypeError
        return df.filter(F.lit(False))
    return keyed.filter(F.col("_dsir_key") > float(cut)).drop("_dsir_key")
