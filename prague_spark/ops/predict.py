"""Prediction operators: linear predictor + per-family links, as pure
column expressions (no UDF, no shuffle — whole-stage codegen all the way).

Re-expresses ``R/predict.R:32-197`` (jolars/prague). Coefficients are a
small driver-side cube, so each path slice becomes literal expressions
folded into the projection — the Spark plan is a scan + project regardless
of data size (the "broadcast the coefficients" strategy).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..model import SlopeModel


def linear_predictor_expr(
    model: SlopeModel, path_idx: int, target: int = 0, features: list[str] | None = None
) -> Column:
    """``intercept + sum_j beta_j * x_j`` for one path slice as a Column."""
    features = features or model.feature_names
    b = model.betas[path_idx, :, target]
    start = 1 if model.intercept else 0
    expr = F.lit(float(b[0])) if model.intercept else F.lit(0.0)
    for j, c in enumerate(features):
        coef = float(b[start + j])
        if coef != 0.0:
            expr = expr + F.lit(coef) * F.col(c).cast("double")
    return expr


def predict(
    df: DataFrame,
    model: SlopeModel,
    path_idx: int | None = None,
    sigma: float | None = None,
    type: str = "link",
    out: str = "pred",
) -> DataFrame:
    """Add a prediction column for one path slice.

    ``type``: "link" (linear predictor), "response" (family inverse link),
    "class" (binomial threshold at lp > 0 / multinomial argmax) —
    ``R/predict.R:73-197``.
    """
    if path_idx is None:
        if sigma is not None:
            # interpolate off-grid sigma into a temporary one-slice model
            from ..core.interpolate import interpolate_coefficients

            betas = interpolate_coefficients(model.betas, model.sigma, [sigma])
            tmp = SlopeModel(**{**model.__dict__, "betas": betas})
            return predict(df, tmp, path_idx=0, type=type, out=out)
        path_idx = model.n_path - 1

    fam = model.family
    m = model.n_targets

    if fam in ("gaussian", "binomial", "poisson"):
        lp = linear_predictor_expr(model, path_idx)
        if type == "link" or (type == "response" and fam == "gaussian"):
            return df.withColumn(out, lp)
        if fam == "binomial":
            if type == "response":
                return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-lp)))
            if type == "class":
                c1, c2 = model.class_names
                return df.withColumn(
                    out, F.when(lp > 0, F.lit(c2)).otherwise(F.lit(c1))
                )
        if fam == "poisson" and type == "response":
            return df.withColumn(out, F.exp(lp))
        raise ValueError(f"type {type!r} not supported for family {fam!r}")

    # multinomial: m-1 linear predictors + implicit 0 for the last class
    lps = [linear_predictor_expr(model, path_idx, target=t) for t in range(m)]
    if type == "link":
        return df.withColumn(out, F.array(*lps))
    # stabilized softmax, STAGED through temp columns so each p-wide
    # linear predictor exists ONCE in the plan: the inlined form
    # (greatest(*lps) + per-class exp(e - mx) + den re-inlined into
    # every prob) duplicated each dot ~(m+1)^2 times — at 100 classes
    # that is ~10^4 p-wide subtrees of driver analysis/codegen (the
    # assign_ivf_cells expression-blowup lesson). Arithmetic and op
    # order are unchanged (array_max == greatest; the fold's leading
    # 0.0 + exp(...) is IEEE-exact), so values stay bit-identical.
    # out-suffixed temp names (grouped.py's convention): a user column
    # that happens to be called "_lps_tmp" must not get clobbered and
    # silently dropped
    tmp_l, tmp_e, tmp_d = f"_lps_{out}", f"_exps_{out}", f"_den_{out}"
    a = F.col(tmp_l)
    ae = F.col(tmp_e)
    out_df = (
        df.withColumn(tmp_l, F.array(*lps, F.lit(0.0)))
        .withColumn(tmp_e, F.transform(a, lambda e: F.exp(e - F.array_max(a))))
        .withColumn(tmp_d, F.aggregate(ae, F.lit(0.0), lambda acc, v: acc + v))
    )
    probs = F.transform(ae, lambda e: e / F.col(tmp_d))
    if type == "response":
        return out_df.withColumn(out, probs).drop(tmp_l, tmp_e, tmp_d)
    if type == "class":
        classes = model.class_names
        tmp = f"_probs_{out}"
        out_df = out_df.withColumn(tmp, probs)
        # column API, not F.expr string interpolation: the temp name is
        # out-suffixed, so an `out` that is not a bare SQL identifier
        # (e.g. "pred-class") must still parse
        pos = F.array_position(F.col(tmp), F.array_max(F.col(tmp)))
        chain = None
        for i, cls in enumerate(classes):
            cond = pos == F.lit(i + 1)
            chain = F.when(cond, F.lit(cls)) if chain is None else chain.when(cond, F.lit(cls))
        return out_df.withColumn(out, chain).drop(tmp, tmp_l, tmp_e, tmp_d)
    raise ValueError(f"type {type!r} not supported for multinomial")


def predict_path(
    df: DataFrame,
    model: SlopeModel,
    type: str = "link",
    out: str = "pred_path",
) -> DataFrame:
    """Predictions for EVERY path point at once — one array element per
    sigma (the reference's 3-D n x m x n_sigma output, ``R/predict.R:65-67``).

    Still a single scan + project: each slice's coefficients fold in as
    literals, so the plan cost is independent of the path length apart
    from expression width."""
    fam = model.family

    def slice_expr(i):
        if fam in ("gaussian", "binomial", "poisson"):
            lp = linear_predictor_expr(model, i)
            if type == "link" or (type == "response" and fam == "gaussian"):
                return lp
            if fam == "binomial" and type == "response":
                return F.lit(1.0) / (F.lit(1.0) + F.exp(-lp))
            if fam == "poisson" and type == "response":
                return F.exp(lp)
            raise ValueError(f"type {type!r} not supported for family {fam!r}")
        if type != "link":
            raise ValueError("predict_path for multinomial supports type='link'")
        lps = [
            linear_predictor_expr(model, i, target=t)
            for t in range(model.n_targets)
        ]
        return F.array(*lps, F.lit(0.0))

    return df.withColumn(out, F.array(*[slice_expr(i) for i in range(model.n_path)]))
