"""Bucketed persistence for long-format designs — the co-location layer
for repeated fits at cluster scale.

Every `fit_sparse` / `cv_fit_sparse` call joins the triplet frame with
the row universe on ``row_id`` (setup statistics, KKT gradients, CV fold
filters). From plain parquet each of those joins shuffles BOTH sides;
over a path fit that is the dominant recurring Exchange. Persisting the
design ONCE as tables bucketed on ``row_id`` (same bucket count both
sides) makes every such equi-join and ``groupBy(row_id)`` co-located:
Spark's bucketed scan reports the hash partitioning to Catalyst, the
SortMergeJoin's Exchanges disappear, and at 100 TB the per-path-point
cluster cost drops to the aggregation itself. This is Spark's native
bucketing (``DataFrameWriter.bucketBy`` + ``saveAsTable``) — the same
mechanism as Hive bucketed tables, no custom reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_design(
    triplets: DataFrame,
    y_df: DataFrame,
    name: str,
    n_buckets: int = 64,
    row_col: str = "row_id",
    mode: str = "overwrite",
) -> tuple[str, str]:
    """Persist ``triplets`` and ``y_df`` as tables ``{name}_trip`` /
    ``{name}_y``, both bucketed (and sort-prefixed) on ``row_col`` with
    the SAME bucket count — the precondition for Exchange-free joins
    between them. Returns the two table names.

    Size ``n_buckets`` so a bucket of the triplet table fits an executor
    core's working set (nnz_total / n_buckets rows per bucket); bucket
    counts must match across tables you intend to co-join."""
    (
        triplets.write.mode(mode)
        .bucketBy(n_buckets, row_col)
        .sortBy(row_col)
        .format("parquet")
        .saveAsTable(f"{name}_trip")
    )
    (
        y_df.write.mode(mode)
        .bucketBy(n_buckets, row_col)
        .sortBy(row_col)
        .format("parquet")
        .saveAsTable(f"{name}_y")
    )
    return f"{name}_trip", f"{name}_y"


def read_bucketed_design(
    spark: SparkSession, name: str
) -> tuple[DataFrame, DataFrame]:
    """Load a design written by :func:`write_bucketed_design`. The
    returned frames carry the bucketing metadata, so joins and
    ``groupBy`` on the bucket column skip their Exchange (verify with
    ``.explain``: no ``Exchange hashpartitioning`` above the scans)."""
    return spark.table(f"{name}_trip"), spark.table(f"{name}_y")
