"""Feature assembly: dense feature vectors, intercept, dummy coding.

Spark-first equivalents of the reference's input coercion and
``model.matrix`` one-hot preparation (``R/owl.R:353-374, 444-448`` and
``data-raw/datasets.R:51, 112-133`` in jolars/prague). Everything here is a
narrow projection — no shuffle, fully codegen'd — so it is free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assemble_features(
    df: DataFrame,
    cols: list[str],
    out: str = "features",
    intercept: bool = False,
    intercept_value: float = 1.0,
) -> DataFrame:
    """Pack ``cols`` into one ``array<double>`` column; when ``intercept``,
    a leading constant element is prepended (the reference's prepended ones
    column, ``R/owl.R:444-448``).

    ``intercept_value`` lets the caller precondition the intercept column:
    with unit-l2-scaled features an all-ones column has norm sqrt(n), which
    makes the Hessian condition number grow with n (FISTA iteration count
    ~ sqrt(n)). Passing 1/sqrt(n) gives the column unit norm too; since the
    intercept is unpenalized this is an exact reparameterization (undo by
    multiplying the fitted intercept by ``intercept_value``)."""
    arr = [F.col(c).cast("double") for c in cols]
    if intercept:
        arr = [F.lit(float(intercept_value))] + arr
    return df.withColumn(out, F.array(*arr))


def feature_names(cols: list[str], intercept: bool = False) -> list[str]:
    return (["(Intercept)"] if intercept else []) + list(cols)


def one_hot(
    df: DataFrame,
    col: str,
    prefix: str | None = None,
    drop_last: bool = True,
    levels: list[str] | None = None,
) -> tuple[DataFrame, list[str]]:
    """Dummy-code a low-cardinality string column into 0/1 double columns,
    dropping the last (alphabetically sorted) level as the reference class.

    Levels are collected driver-side (single distinct agg over a
    low-cardinality column — broadcastable at any scale).
    """
    prefix = prefix or col
    if levels is None:
        levels = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
    keep = levels[:-1] if drop_last else levels
    out_cols = []
    for lv in keep:
        name = f"{prefix}_{lv}"
        df = df.withColumn(
            name, F.when(F.col(col) == F.lit(lv), 1.0).otherwise(0.0)
        )
        out_cols.append(name)
    return df, out_cols
