"""Synthetic problem generator (the reference's ``randomProblem``,
``R/utils.R:15-76`` in jolars/prague), Spark-native.

``spark.range(n)`` + ``randn``/``rand`` column expressions — fully
distributed and reproducible given a seed; the planted coefficient vector
is drawn driver-side (p-sized) and embedded as literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


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
) -> tuple[DataFrame, np.ndarray]:
    """Returns (df with x1..xp + y, planted beta).

    x ~ N(0,1) (zeroed with prob 1-density); beta has floor(q*p) nonzeros
    of magnitude ``amplitude`` with alternating sign; y drawn per family:
    gaussian y = x.beta + N(0, sigma); binomial y = sign rule; poisson
    y ~ Poisson(exp(x.beta)) (approximated by inverse-CDF of a uniform for
    determinism); multinomial by softmax argmax of noisy scores.
    """
    rng = np.random.default_rng(seed)
    k = max(1, int(np.floor(q * p)))
    beta = np.zeros(p)
    idx = rng.choice(p, size=k, replace=False)
    beta[idx] = amplitude * np.where(np.arange(k) % 2 == 0, 1.0, -1.0)

    df = spark.range(n).withColumnRenamed("id", "row_id")
    for j in range(p):
        x = F.randn(seed + 1000 + j)
        if density < 1.0:
            x = F.when(F.rand(seed + 2000 + j) < density, x).otherwise(0.0)
        df = df.withColumn(f"x{j + 1}", x)

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
        # floor(mu + sqrt(mu) * qnorm(u)) clamped at 0
        from ..core.stats import norm_ppf

        df = df.withColumn("_u", u).withColumn(
            "y",
            F.greatest(
                F.floor(
                    mu
                    + F.sqrt(mu)
                    * F.udf(lambda x: float(norm_ppf(min(max(x, 1e-9), 1 - 1e-9))), "double")("_u")
                ),
                F.lit(0),
            ).cast("double"),
        ).drop("_u")
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
