"""Column standardization as distributed aggregation + projection.

Semantics of the reference's ``standardize`` (``src/standardize.h:8-71`` in
jolars/prague): optionally center each column by its mean, then scale by
the ``l1`` / ``l2`` / ``sd`` (sample) / ``max`` norm **of the centered
column**; zero-norm columns get scale 1.0 so constant features survive.

Cost model at scale: two scans (one for means, one for centered norms) —
both are map-side-combined aggregations with a p-sized result, no shuffle
of data rows. The transform itself is a pure projection (whole-stage
codegen, no shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

SCALE_TYPES = ("l1", "l2", "sd", "max", "none")


@dataclass
class StandardizerModel:
    cols: list[str]
    center: dict[str, float] = field(default_factory=dict)
    scale: dict[str, float] = field(default_factory=dict)
    do_center: bool = True
    scale_type: str = "l2"

    def transform(self, df: DataFrame, suffix: str = "") -> DataFrame:
        """Replace (or suffix) each column with (x - center) / scale."""
        for c in self.cols:
            expr = F.col(c).cast("double")
            if self.do_center:
                expr = expr - F.lit(self.center[c])
            if self.scale_type != "none":
                expr = expr / F.lit(self.scale[c])
            df = df.withColumn(c + suffix, expr)
        return df


def fit_standardizer(
    df: DataFrame,
    cols: list[str],
    center: bool = True,
    scale: str = "l2",
) -> StandardizerModel:
    if scale not in SCALE_TYPES:
        raise ValueError(f"scale must be one of {SCALE_TYPES}")

    model = StandardizerModel(cols=list(cols), do_center=center, scale_type=scale)

    if center:
        row = df.agg(*[F.avg(F.col(c).cast("double")).alias(c) for c in cols]).first()
        model.center = {c: float(row[c]) for c in cols}

    if scale != "none":
        def centered(c):
            e = F.col(c).cast("double")
            return e - F.lit(model.center[c]) if center else e

        aggs = []
        for c in cols:
            e = centered(c)
            if scale == "l1":
                aggs.append(F.sum(F.abs(e)).alias(c))
            elif scale == "l2":
                aggs.append(F.sqrt(F.sum(e * e)).alias(c))
            elif scale == "sd":
                aggs.append(F.stddev_samp(e).alias(c))
            elif scale == "max":
                aggs.append(F.max(e).alias(c))
        row = df.agg(*aggs).first()
        model.scale = {
            c: (1.0 if row[c] is None or float(row[c]) == 0.0 else float(row[c]))
            for c in cols
        }
    return model
