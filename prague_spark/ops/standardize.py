"""Column standardization as distributed aggregation + projection.

Semantics of the reference's ``standardize`` (``src/standardize.h:8-71`` in
jolars/prague): optionally center each column by its mean, then scale by
the ``l1`` / ``l2`` / ``sd`` (sample) / ``max`` norm **of the centered
column**; zero-norm columns get scale 1.0 so constant features survive.

Cost model at scale: ONE scan for l2/sd/none (centered norms derive from
raw moments; the row count comes along for free), two scans for l1/max
(not moment-derivable) — all map-side-combined aggregations with a
p-sized result, no shuffle of data rows. The transform itself is a pure projection (whole-stage
codegen, no shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, functions as F

SCALE_TYPES = ("l1", "l2", "sd", "max", "none")


@dataclass
class StandardizerModel:
    cols: list[str]
    center: dict[str, float] = field(default_factory=dict)
    scale: dict[str, float] = field(default_factory=dict)
    do_center: bool = True
    scale_type: str = "l2"
    n: int | None = None  # row count, captured when the fit is one-scan

    def transform(self, df: DataFrame, suffix: str = "") -> DataFrame:
        """Replace (or suffix) each column with (x - center) / scale.

        One ``withColumns`` projection for ALL columns: chaining
        ``withColumn`` per feature nests one Project node each, and past
        ~1000 features Catalyst's recursive tree analysis overflows the
        JVM stack (and is quadratic in plan size before that)."""
        exprs = {}
        for c in self.cols:
            expr = F.col(c).cast("double")
            if self.do_center:
                expr = expr - F.lit(self.center[c])
            if self.scale_type != "none":
                expr = expr / F.lit(self.scale[c])
            exprs[c + suffix] = expr
        return df.withColumns(exprs)


def fit_standardizer(
    df: DataFrame,
    cols: list[str],
    center: bool = True,
    scale: str = "l2",
) -> StandardizerModel:
    if scale not in SCALE_TYPES:
        raise ValueError(f"scale must be one of {SCALE_TYPES}")

    model = StandardizerModel(cols=list(cols), do_center=center, scale_type=scale)

    if scale in ("l2", "sd", "none"):
        # ONE scan: l2/sd of the centered column derive from raw moments
        # (sum, sum of squares, n). The centered sum-of-squares
        # sumsq - n*mean^2 is exact to ~1e-7 relative even at the double-
        # precision edge (partition-wise partial sums), far inside every
        # oracle rounding. l1/max of centered values are not
        # moment-derivable and keep the two-scan path below.
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            e = F.col(c).cast("double")
            aggs.append(F.sum(e).alias(f"_s_{c}"))
            if scale != "none":
                aggs.append(F.sum(e * e).alias(f"_q_{c}"))
        row = df.agg(*aggs).first()
        n = int(row["_n"])
        model.n = n
        if center:
            model.center = {c: float(row[f"_s_{c}"]) / n for c in cols}
        if scale != "none":
            for c in cols:
                # 'sd' is ALWAYS the centered sample sd (arma::stddev,
                # src/standardize.h) — only the stored center depends on
                # the center flag. 'l2' of the raw column when not centering.
                mean = float(row[f"_s_{c}"]) / n if (center or scale == "sd") else 0.0
                css = max(float(row[f"_q_{c}"]) - n * mean * mean, 0.0)
                v = np.sqrt(css / (n - 1)) if scale == "sd" and n > 1 else np.sqrt(css)
                model.scale[c] = 1.0 if v == 0.0 else float(v)
        return model

    if center:
        row = df.agg(*[F.avg(F.col(c).cast("double")).alias(c) for c in cols]).first()
        model.center = {c: float(row[c]) for c in cols}

    def centered(c):
        e = F.col(c).cast("double")
        return e - F.lit(model.center[c]) if center else e

    aggs = []
    for c in cols:
        e = centered(c)
        if scale == "l1":
            aggs.append(F.sum(F.abs(e)).alias(c))
        elif scale == "max":
            aggs.append(F.max(e).alias(c))
    row = df.agg(*aggs).first()
    model.scale = {
        c: (1.0 if row[c] is None or float(row[c]) == 0.0 else float(row[c]))
        for c in cols
    }
    return model
