"""Deterministic sampling operators for repeatable training-data curation.

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines or cluster layouts; curation pipelines instead sample on a
content-derived hash so that (a) the same document always makes the same
cut regardless of where it lands, (b) the sample is exactly reproducible
in any engine with md5 (the DuckDB oracle runs the same predicate), and
(c) downsampling ratios can differ per stratum (language/source mixing —
the data-mixture knob of LLM corpus construction).

Zero shuffle: the whole operator is one codegen filter projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_unit(id_col: str):
    """Uniform-[0,1) deterministic hash of the id: first 8 hex digits of
    md5(id) over 2^32. Exact in any engine: 32-bit int, exact double."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash_unit(id) < fractions[stratum] (strata not
    in ``fractions`` use ``default_fraction``). Per-stratum sampled
    fraction converges to the requested rate; membership is stable under
    repartitioning, engine changes, and incremental reruns."""
    frac = F.lit(float(default_fraction))
    for key, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == key, F.lit(float(f))).otherwise(frac)
    return df.withColumn("_u", hash_unit(id_col)).filter(
        F.col("_u") < frac
    ).drop("_u")


def stratified_topk(
    df: DataFrame, id_col: str, strata_col: str, k: int
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer if the stratum is smaller),
    selected as the k smallest id-hashes — the deterministic way to carve
    a fixed-size eval set per language/source: membership is stable under
    reruns and ingestion order, and adding documents later only evicts
    the largest-hash members.

    One shuffle (window partitioned by stratum). A pathologically large
    stratum makes its sort the straggler; for fraction-style downsampling
    at that scale use :func:`stratified_sample`, which is shuffle-free."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy("_u", id_col)
    return (
        df.withColumn("_u", hash_unit(id_col))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_u", "_rk")
    )
