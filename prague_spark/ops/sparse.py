"""Sparse (long-format) design ingest: (row_id, col_id, value) triplets.

The reference accepts ``dgCMatrix`` CSC input with a scale-only
standardization that preserves sparsity (``src/standardize.h:42-71``,
centering forbidden for sparse, ``R/owl.R:339, 353-360``). Spark-side:

- norms per column come from a single ``groupBy(col_id)`` over the
  triplets (shuffle keyed by col_id — p groups);
- the scaled triplets are then pivoted into the dense ``array<double>``
  row representation the solvers consume. Zero entries stay absent until
  the final assembly, so shuffle volume is O(nnz), not O(n*p).

At extreme p the dense-array assembly is the limiter; the long format
itself is the storage answer (nnz-proportional), and the gradient can be
computed directly on triplets via join+groupBy when p is too wide to
densify — that variant is the documented scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sparse_scales(
    triplets: DataFrame,
    n_rows: int,
    scale: str = "l2",
    row_col: str = "row_id",
    col_col: str = "col_id",
    val_col: str = "value",
) -> dict[int, float]:
    """Per-column scale factors over the *implicitly zero-padded* columns,
    mirroring ``src/standardize.h:42-71`` (sd uses population-corrected
    norm over n_rows including zeros; zero scale -> 1.0)."""
    v = F.col(val_col)
    if scale == "l1":
        agg = F.sum(F.abs(v))
    elif scale == "l2":
        agg = F.sqrt(F.sum(v * v))
    elif scale == "sd":
        # sd over the full column including implicit zeros:
        # mean = sum/n ; ss = sum(v^2) - n*mean^2 ; sd = sqrt(ss/(n-1))
        agg = F.sqrt(
            (F.sum(v * v) - F.pow(F.sum(v), 2) / n_rows) / (n_rows - 1)
        )
    elif scale == "max":
        # max including implicit zeros
        agg = F.greatest(F.max(v), F.lit(0.0))
    else:
        raise ValueError(scale)
    rows = triplets.groupBy(col_col).agg(agg.alias("s")).collect()
    return {
        int(r[col_col]): (1.0 if r["s"] is None or float(r["s"]) == 0.0 else float(r["s"]))
        for r in rows
    }


def long_to_features(
    triplets: DataFrame,
    n_cols: int,
    rows: DataFrame | None = None,
    row_col: str = "row_id",
    col_col: str = "col_id",
    val_col: str = "value",
    out: str = "features",
    scales: dict[int, float] | None = None,
) -> DataFrame:
    """Pivot triplets into a dense ``array<double>`` feature column
    (one groupBy(row_id); missing entries become 0.0). ``rows`` optionally
    supplies the full row universe so all-zero rows are kept."""
    t = triplets
    if scales:
        mapping = F.create_map(
            *[x for k, s in scales.items() for x in (F.lit(int(k)), F.lit(float(s)))]
        )
        t = t.withColumn(val_col, F.col(val_col) / mapping[F.col(col_col)])
    pairs = t.groupBy(row_col).agg(
        F.map_from_arrays(
            F.collect_list(F.col(col_col).cast("int")),
            F.collect_list(F.col(val_col).cast("double")),
        ).alias("_m")
    )
    if rows is not None:
        pairs = rows.select(F.col(row_col)).join(pairs, row_col, "left")
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_cols - 1)),
        lambda i: F.coalesce(F.col("_m")[i.cast("int")], F.lit(0.0)),
    )
    return pairs.withColumn(out, dense).drop("_m")


def sparse_xtv(
    triplets: DataFrame,
    v: DataFrame,
    row_col: str = "row_id",
    col_col: str = "col_id",
    val_col: str = "value",
    v_col: str = "v",
) -> DataFrame:
    """Distributed ``X^T v`` directly on the long format: join the triplets
    to the per-row vector ``v`` on row_id, then one groupBy(col_id) sum.

    This is the wide-p scale path (p too large to densify into array rows
    or to ship a p-vector to the driver): shuffle volume is O(nnz) for the
    join plus O(distinct col_id) for the aggregation, and the result stays
    a DataFrame — the gradient never has to exist as one dense object.
    Returns (col_id, xtv)."""
    return (
        triplets.join(v.select(F.col(row_col), F.col(v_col)), row_col)
        .groupBy(col_col)
        .agg(F.sum(F.col(val_col) * F.col(v_col)).alias("xtv"))
    )
