"""Synthetic problem generator (the reference's ``randomProblem``,
``R/utils.R:15-76`` in jolars/prague), Spark-native.

``spark.range(n)`` + ``randn``/``rand`` column expressions — fully
distributed and reproducible given a seed; the planted coefficient vector
is drawn driver-side (p-sized) and embedded as literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# Acklam's rational-polynomial inverse normal CDF (|relative error| <
# 1.15e-9 over (0,1)) as a PURE column expression — keeps the generator
# whole-stage-codegen JVM-side (no Python UDF in the package).
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
             1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
             6.680131188771972e+01, -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
             -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
             3.754408661907416e+00)
_ACKLAM_SPLIT = 0.02425


def _horner(coefs, x: Column) -> Column:
    acc = F.lit(float(coefs[0]))
    for c in coefs[1:]:
        acc = acc * x + F.lit(float(c))
    return acc


def norm_ppf_expr(u: Column) -> Column:
    """Standard-normal quantile of ``u`` (clamped away from 0/1) as a
    column expression."""
    u = F.least(F.greatest(u, F.lit(1e-9)), F.lit(1.0 - 1e-9))
    ql = F.sqrt(-2.0 * F.log(u))
    qh = F.sqrt(-2.0 * F.log(1.0 - u))
    high = -_horner(_ACKLAM_C, qh) / (_horner(_ACKLAM_D, qh) * qh + 1.0)
    qc = u - 0.5
    r = qc * qc
    central = (_horner(_ACKLAM_A, r) * qc) / (_horner(_ACKLAM_B, r) * r + 1.0)
    return (
        F.when(u < _ACKLAM_SPLIT, _horner(_ACKLAM_C, ql) / (_horner(_ACKLAM_D, ql) * ql + 1.0))
        .when(u > 1.0 - _ACKLAM_SPLIT, high)
        .otherwise(central)
    )


def random_problem(
    spark: SparkSession,
    n: int = 1000,
    p: int = 10,
    q: float = 0.2,
    family: str = "gaussian",
    density: float = 1.0,
    amplitude: float = 3.0,
    sigma_noise: float = 1.0,
    n_classes: int = 3,
    seed: int = 42,
    rho: float = 0.0,
    n_groups: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Returns (df with x1..xp + y, planted beta).

    x ~ N(0,1) (zeroed with prob 1-density); beta has floor(q*p) nonzeros
    of magnitude ``amplitude`` with alternating sign; y drawn per family:
    gaussian y = x.beta + N(0, sigma); binomial y = sign rule; poisson
    y ~ Poisson(exp(x.beta)) (approximated by inverse-CDF of a uniform for
    determinism); multinomial by softmax argmax of noisy scores.

    ``rho`` plants an equicorrelated design exactly as the reference
    (``R/utils.R:34-35``): ONE shared per-row N(0,1) draw scaled by
    sqrt(rho/(1-rho)) is added to every column, giving pairwise column
    correlation rho after the implied rescale. ``n_groups`` switches the
    support from random columns to the reference's grouped layout
    (``R/utils.R:37-41``): columns are blocked into n_groups contiguous
    groups and the first max(floor(n_groups*q), 1) groups are active —
    the fixture for group-correlated SLOPE clustering behavior."""
    rng = np.random.default_rng(seed)
    beta = np.zeros(p)
    if n_groups is not None:
        groups = np.repeat(
            np.arange(n_groups), int(np.ceil(p / n_groups))
        )[:p]
        active_groups = max(int(np.floor(n_groups * q)), 1)
        idx = np.flatnonzero(groups < active_groups)
    else:
        idx = rng.choice(p, size=max(1, int(np.floor(q * p))), replace=False)
    beta[idx] = amplitude * np.where(np.arange(len(idx)) % 2 == 0, 1.0, -1.0)

    df = spark.range(n).withColumnRenamed("id", "row_id")
    # one withColumns projection: per-column withColumn chaining nests a
    # Project node per feature and overflows Catalyst's recursive
    # analysis past ~1000 columns
    common = (
        F.lit(float(np.sqrt(rho / (1.0 - rho)))) * F.randn(seed + 999)
        if rho > 0
        else None
    )
    xcols = {}
    for j in range(p):
        x = F.randn(seed + 1000 + j)
        if density < 1.0:
            x = F.when(F.rand(seed + 2000 + j) < density, x).otherwise(0.0)
        if common is not None:
            x = x + common
        xcols[f"x{j + 1}"] = x
    df = df.withColumns(xcols)

    lp = F.lit(0.0)
    for j in range(p):
        if beta[j] != 0.0:
            lp = lp + F.lit(float(beta[j])) * F.col(f"x{j + 1}")
    df = df.withColumn("_lp", lp)

    if family == "gaussian":
        df = df.withColumn("y", F.col("_lp") + F.lit(sigma_noise) * F.randn(seed + 1))
    elif family == "binomial":
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_lp")))
        df = df.withColumn(
            "y", F.when(F.rand(seed + 1) < prob, "pos").otherwise("neg")
        )
    elif family == "poisson":
        # inverse-CDF sampling via a uniform and the exp-link mean
        mu = F.exp(F.least(F.col("_lp"), F.lit(10.0)))
        u = F.rand(seed + 1)
        # crude but deterministic: quantile of Poisson approximated by
        # floor(mu + sqrt(mu) * qnorm(u)) clamped at 0; qnorm is the
        # Acklam column expression (JVM codegen, no UDF)
        df = df.withColumn(
            "y",
            F.greatest(
                F.floor(mu + F.sqrt(mu) * norm_ppf_expr(u)),
                F.lit(0),
            ).cast("double"),
        )
    elif family == "multinomial":
        scores = [
            (F.col("_lp") * F.lit(float(np.cos(c + 1))) + F.randn(seed + 10 + c))
            for c in range(n_classes)
        ]
        best = F.greatest(*scores)
        label = None
        for c, s in enumerate(scores):
            cond = s == best
            label = F.when(cond, F.lit(f"c{c}")) if label is None else label.when(cond, F.lit(f"c{c}"))
        df = df.withColumn("y", label)
    else:
        raise ValueError(family)

    return df.drop("_lp"), beta


def _hash_uniform(*cols) -> Column:
    """Deterministic uniform in (0,1) from a 64-bit hash of ``cols`` —
    reproducible regardless of partitioning (unlike ``F.randn(seed)``,
    whose stream is keyed on the partition layout)."""
    h = F.xxhash64(*cols)
    return (F.pmod(h, F.lit(2**52)).cast("double") + 0.5) / float(2**52)


def random_sparse_problem(
    spark: SparkSession,
    n: int = 10_000,
    p: int = 5_000,
    nnz_per_row: int = 20,
    q: float = 0.02,
    family: str = "gaussian",
    amplitude: float = 2.0,
    sigma_noise: float = 1.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """Wide-p sparse synthetic problem in LONG (triplet) format — the
    input shape of :func:`prague_spark.ops.sparse.fit_sparse`.

    Returns ``(triplets(row_id, col_id, value), ydf(row_id, y),
    planted_beta)``. The reference's ``randomProblem`` (``R/utils.R:15-76``)
    only emits dense matrices; this is its long-format analogue for the
    p-beyond-array-row regime.

    Design points (all fully distributed, zero Python UDFs):

    - Row ``r``'s nonzero columns are ``(h(r) + k*stride) % p`` for
      ``k < nnz_per_row`` with ``stride = p // nnz_per_row`` — distinct by
      construction (no (row, col) duplicates, no dedup shuffle needed) and
      spread over all of [0, p) so every column gets ~n*nnz/p entries.
    - Values and noise come from ``norm_ppf(hash_uniform(row, col))`` —
      whole-stage-codegen column expressions, deterministic independent of
      partitioning, so the planted linear predictor can be recomputed
      exactly by any consumer (the correctness tests rely on this).
    - ``nnz_per_row`` must be <= p.
    """
    if nnz_per_row > p:
        raise ValueError("nnz_per_row must be <= p")
    rng = np.random.default_rng(seed)
    k = max(1, int(np.floor(q * p)))
    beta = np.zeros(p)
    idx = rng.choice(p, size=k, replace=False)
    beta[idx] = amplitude * np.where(np.arange(k) % 2 == 0, 1.0, -1.0)

    stride = max(1, p // nnz_per_row)
    base = spark.range(n * nnz_per_row)
    row = (F.col("id") / nnz_per_row).cast("long").alias("row_id")
    slot = F.col("id") % nnz_per_row
    offset = F.pmod(F.xxhash64(row, F.lit(seed)), F.lit(p))
    col = F.pmod(offset + slot * stride, F.lit(p)).cast("int").alias("col_id")
    trip = base.select(row, col).withColumn(
        "value",
        norm_ppf_expr(
            _hash_uniform(F.col("row_id"), F.col("col_id"), F.lit(seed + 1))
        ),
    )

    # planted linear predictor: one broadcast join on the k nonzero betas
    # + one groupBy(row) — cost O(n * nnz), never densified
    bdf = spark.createDataFrame(
        [(int(j), float(beta[j])) for j in idx], "col_id int, _b double"
    )
    lp = (
        trip.join(F.broadcast(bdf), "col_id")
        .groupBy("row_id")
        .agg(F.sum(F.col("value") * F.col("_b")).alias("_lp"))
    )
    ydf = (
        spark.range(n)
        .withColumnRenamed("id", "row_id")
        .join(lp, "row_id", "left")
        .withColumn("_lp", F.coalesce(F.col("_lp"), F.lit(0.0)))
    )
    noise_u = _hash_uniform(F.col("row_id"), F.lit(seed + 2))
    if family == "gaussian":
        ydf = ydf.withColumn(
            "y", F.col("_lp") + F.lit(sigma_noise) * norm_ppf_expr(noise_u)
        )
    elif family == "binomial":
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_lp")))
        ydf = ydf.withColumn(
            "y", F.when(noise_u < prob, "pos").otherwise("neg")
        )
    elif family == "multinomial":
        # 3 classes with planted per-class predictors (lp, -lp, 0): one
        # softmax + one uniform draw, all codegen column expressions —
        # class c0 loads on +beta, c1 on -beta, c2 is the flat baseline
        e0, e1 = F.exp(F.col("_lp")), F.exp(-F.col("_lp"))
        z = e0 + e1 + F.lit(1.0)
        ydf = ydf.withColumn(
            "y",
            F.when(noise_u < e0 / z, "c0")
            .when(noise_u < (e0 + e1) / z, "c1")
            .otherwise("c2"),
        )
    else:
        raise ValueError(f"random_sparse_problem: unsupported family {family!r}")
    return trip, ydf.drop("_lp"), beta
