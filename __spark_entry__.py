"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
pipeline extensions (prague_spark.queries registry).
``oracle_sql()`` — DuckDB-equivalent SQL for each SQL-expressible query;
solver/k-means/stub-decoder queries are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from prague_spark import queries as _Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full gaussian SLOPE path fit on sf0.001 lineitem
    (one distributed Gram pass + driver-side path), returning the
    path summary table (print.Owl analogue)."""
    import prague_spark as ps

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    model = ps.fit(
        li,
        ["l_quantity", "l_discount", "l_tax"],
        "l_extendedprice",
        "gaussian",
        n_sigma=20,
    )
    return spark.createDataFrame(
        [
            (
                r["path_idx"],
                float(r["sigma"]),
                float(r["deviance_ratio"]),
                r["n_nonzero"],
            )
            for r in model.path_summary()
        ],
        "path_idx int, sigma double, deviance_ratio double, n_nonzero int",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_Q.ORACLES)
