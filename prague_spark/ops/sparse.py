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

import numpy as np
from pyspark.sql import DataFrame, functions as F

_EXP_MAX = 709.78  # trunc_exp clamp, mirrors core.families


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


class SparseLongDesign:
    """Solver design over long-format triplets — the TRUE sparse path: the
    design matrix never exists as dense rows (reference dual entry
    ``src/owl.cpp:398-412``). Per solver evaluation:

    - linear predictor: broadcast the (sparse) beta as a tiny DataFrame,
      join on col_id, groupBy(row_id) — shuffle volume O(nnz);
    - per-row pseudo-gradient / primal / dual: pure column expressions of
      (y, lp) (the family math of ``src/families/*.h`` in SQL form);
    - penalized gradient: join the per-row gradient back to the triplets,
      groupBy(col_id) — again O(nnz); only the p-vector reaches the driver.

    The intercept column (value 1/sqrt(n) under l2 preconditioning) is
    handled analytically, never materialized. All four families; the
    multinomial response rides as one internal column per target
    (``_y0.._y{m-1}``) and the per-row softmax runs as column expressions.
    """

    def __init__(self, trip, ydf, family: str, p: int, n: int, icol: float,
                 m: int = 1, row_col: str = "row_id", col_col: str = "col_id",
                 val_col: str = "value"):
        if family not in ("gaussian", "binomial", "poisson", "multinomial"):
            raise ValueError(f"unknown family {family!r}")
        self.trip = trip
        self.ydf = ydf  # (row_col, _y0.._y{m-1}) in internal encoding
        self.family = family
        self.p_pen = p
        self.p = p + 1  # +intercept, solver-facing
        self.m = m
        self.n = n
        self.icol = icol
        self.row_col, self.col_col, self.val_col = row_col, col_col, val_col
        if family == "poisson":
            # sum lgamma(y+1) is constant in beta; computed once so the
            # SQL primal/dual stay builtin-only (Spark lacks lgamma)
            from math import lgamma

            ys = [r["_y0"] for r in ydf.select("_y0").collect()] if n <= 10**7 else None
            if ys is None:
                raise ValueError("poisson sparse fit: n too large for lgamma setup")
            self._lg = float(np.sum([lgamma(v + 1.0) for v in ys]))
        else:
            self._lg = 0.0

    # -- family math as column expressions over (_y*, _lp*) ---------------
    # returns (primal_term, dual_term, [g_0..g_{m-1}])
    def _exprs(self):
        if self.family == "multinomial":
            lps = [F.col(f"_lp{t}") for t in range(self.m)]
            ys = [F.col(f"_y{t}") for t in range(self.m)]
            mx = F.greatest(*lps) if self.m > 1 else lps[0]
            ssum = F.exp(-mx)
            for t in range(self.m):
                ssum = ssum + F.exp(F.least(lps[t] - mx, F.lit(_EXP_MAX)))
            lse = F.log(ssum) + mx
            ylp = ys[0] * lps[0]
            lpe = lps[0] * F.exp(lps[0] - lse)
            for t in range(1, self.m):
                ylp = ylp + ys[t] * lps[t]
                lpe = lpe + lps[t] * F.exp(lps[t] - lse)
            gs = [F.exp(lps[t] - lse) - ys[t] for t in range(self.m)]
            return lse - ylp, lse - lpe, gs
        y, lp = F.col("_y0"), F.col("_lp0")
        if self.family == "gaussian":
            r = y - lp
            return 0.5 * r * r, 0.5 * y * y - 0.5 * lp * lp, [lp - y]
        if self.family == "binomial":
            eneg = F.exp(F.least(-y * lp, F.lit(_EXP_MAX)))
            epos = F.exp(F.least(y * lp, F.lit(_EXP_MAX)))
            r = F.lit(1.0) / (F.lit(1.0) + epos)
            logr = F.log(F.greatest(r, F.lit(1e-300)))
            log1mr = F.log(F.greatest(F.lit(1.0) - r, F.lit(1e-300)))
            return (
                F.log1p(eneg),
                (r - 1.0) * log1mr - r * logr,
                [-y / (F.lit(1.0) + epos)],
            )
        mu = F.exp(F.least(lp, F.lit(_EXP_MAX)))
        return -(y * lp - mu), -(mu * (lp - 1.0)), [mu - y]

    def _rows(self, beta):
        B = np.asarray(beta, dtype=np.float64).reshape(self.p, self.m)
        spark = self.trip.sparkSession
        nz = np.flatnonzero(np.any(B[1:] != 0, axis=1))
        rows = self.ydf
        if len(nz):
            bdf = spark.createDataFrame(
                [
                    (int(j), *[float(B[1 + j, t]) for t in range(self.m)])
                    for j in nz
                ],
                f"{self.col_col} int, "
                + ", ".join(f"_b{t} double" for t in range(self.m)),
            )
            lp = (
                self.trip.join(F.broadcast(bdf), self.col_col)
                .groupBy(self.row_col)
                .agg(
                    *[
                        F.sum(F.col(self.val_col) * F.col(f"_b{t}")).alias(f"_lp{t}")
                        for t in range(self.m)
                    ]
                )
            )
            rows = rows.join(lp, self.row_col, "left")
            for t in range(self.m):
                rows = rows.withColumn(
                    f"_lp{t}", F.coalesce(F.col(f"_lp{t}"), F.lit(0.0))
                )
        else:
            for t in range(self.m):
                rows = rows.withColumn(f"_lp{t}", F.lit(0.0))
        for t in range(self.m):
            rows = rows.withColumn(
                f"_lp{t}", F.col(f"_lp{t}") + F.lit(self.icol * float(B[0, t]))
            )
        return rows

    def eval(self, beta):
        rows = self._rows(beta)
        pe, de, ges = self._exprs()
        for t, ge in enumerate(ges):
            rows = rows.withColumn(f"_g{t}", ge)
        head = rows.agg(
            F.sum(pe).alias("_p"), F.sum(de).alias("_d"),
            *[F.sum(f"_g{t}").alias(f"_gi{t}") for t in range(self.m)],
        ).first()
        grad = np.zeros((self.p, self.m))
        for t in range(self.m):
            grad[0, t] = self.icol * float(head[f"_gi{t}"])
        gcols = [f"_g{t}" for t in range(self.m)]
        for r in (
            self.trip.join(rows.select(self.row_col, *gcols), self.row_col)
            .groupBy(self.col_col)
            .agg(
                *[
                    F.sum(F.col(self.val_col) * F.col(g)).alias(f"_gc{t}")
                    for t, g in enumerate(gcols)
                ]
            )
            .collect()
        ):
            for t in range(self.m):
                grad[1 + int(r[self.col_col]), t] = float(r[f"_gc{t}"])
        return float(head["_p"]) + self._lg, float(head["_d"]) + self._lg, grad

    def primal(self, beta):
        rows = self._rows(beta)
        pe, _, _ = self._exprs()
        return float(rows.agg(F.sum(pe)).first()[0]) + self._lg

    def full_gradient(self, beta):
        return self.eval(beta)[2]


def fit_sparse(
    triplets: DataFrame,
    y_df: DataFrame,
    label: str,
    family: str = "gaussian",
    *,
    n_cols: int,
    row_col: str = "row_id",
    col_col: str = "col_id",
    val_col: str = "value",
    scale: str = "l2",
    intercept: bool = True,
    lambda_type: str = "gaussian",
    q: float = 0.2,
    n_sigma: int = 20,
    sigma=None,
    lambda_min_ratio: float | None = None,
    max_passes: int = 10**5,
    tol_rel_gap: float = 1e-5,
    tol_infeas: float = 1e-3,
    tol_dev_change: float = 1e-5,
    tol_dev_ratio: float = 0.995,
):
    """End-to-end SLOPE path fit on a long-format sparse design WITHOUT
    densification — the wide-p scale path (p far beyond what array rows
    could hold; only p-vectors ever reach the driver).

    Mirrors the reference's sparse entry (``src/owl.cpp:398-412``):
    scale-only standardization (``src/standardize.h:42-71`` — centering is
    forbidden for sparse input, ``R/owl.R:339, 353-360``), same penalty
    machinery and stopping rules as the dense ``fit()``. Screening is not
    applied (the full gradient is already one O(nnz) aggregation).

    ``triplets``: (row_col, col_col, val_col) with col ids in [0, n_cols);
    ``y_df``: (row_col, label) with one row per observation (the row
    universe — all-zero rows included).
    """
    from ..core.lambdas import lambda_sequence, sigma_grid
    from ..core.solver import fista
    from ..fit import _lambda_max_from_stats, _rescale
    from ..model import SlopeModel
    from .response import Y_COL, preprocess_response

    spark = triplets.sparkSession
    ydf2, rinfo = preprocess_response(y_df, label, family)
    m = rinfo.n_targets
    if m > 1:
        ycols = [F.col(Y_COL)[t].alias(f"_y{t}") for t in range(m)]
    else:
        ycols = [F.col(Y_COL).alias("_y0")]
    ydf = ydf2.select(F.col(row_col), *ycols).persist()
    n = ydf.count()

    scales = sparse_scales(triplets, n, scale=scale,
                           row_col=row_col, col_col=col_col, val_col=val_col)
    sdf = spark.createDataFrame(
        [(int(k), float(v)) for k, v in scales.items()], f"{col_col} int, _s double"
    )
    trip = (
        triplets.select(row_col, col_col, val_col)
        .join(F.broadcast(sdf), col_col)
        .withColumn(val_col, F.col(val_col) / F.col("_s"))
        .drop("_s")
        .persist()
    )
    trip.count()

    icol = 1.0 / np.sqrt(n) if (intercept and scale == "l2") else 1.0
    design = SparseLongDesign(trip, ydf, family, n_cols, n, icol, m=m,
                              row_col=row_col, col_col=col_col, val_col=val_col)

    # one pass each for the lambda_max cross-moments (sparse aggregations)
    xty = np.zeros((n_cols + 1, m))
    sums_x = np.zeros(n_cols + 1)
    for r in (
        trip.join(ydf, row_col)
        .groupBy(col_col)
        .agg(
            *[F.sum(F.col(val_col) * F.col(f"_y{t}")).alias(f"_xy{t}")
              for t in range(m)],
            F.sum(val_col).alias("_sx"),
        )
        .collect()
    ):
        for t in range(m):
            xty[1 + int(r[col_col]), t] = float(r[f"_xy{t}"])
        sums_x[1 + int(r[col_col])] = float(r["_sx"])
    head = ydf.agg(
        *[F.sum(f"_y{t}").alias(f"_sy{t}") for t in range(m)]
    ).first()
    sums_y = np.array([float(head[f"_sy{t}"]) for t in range(m)])
    xty[0, :] = icol * sums_y
    sums_x[0] = n * icol
    lambda_max = _lambda_max_from_stats(
        family, xty, sums_x, sums_y, n, intercept=True
    )

    lam = lambda_sequence(n_cols * m, n, lambda_type, q)
    sigma_is_auto = sigma is None
    if sigma_is_auto:
        sig, _ = sigma_grid(lambda_max, lam, n_sigma, lambda_min_ratio, n=n, p=n_cols)
    else:
        sig = np.atleast_1d(np.asarray(sigma, dtype=np.float64))

    null_deviance = 2.0 * design.primal(np.zeros((n_cols + 1, m)))
    betas = np.zeros((len(sig), n_cols + 1, m))
    beta = np.zeros((n_cols + 1, m))
    deviances: list[float] = []
    dev_ratios: list[float] = []
    passes: list[int] = []
    k = 0
    while k < len(sig):
        res = fista(
            design, beta, lam * sig[k], n_unpenalized=1,
            max_passes=max_passes, tol_rel_gap=tol_rel_gap, tol_infeas=tol_infeas,
        )
        beta = res.beta.reshape(n_cols + 1, m)
        betas[k] = beta
        deviances.append(res.deviance)
        dev_ratios.append(1.0 - res.deviance / null_deviance)
        passes.append(res.passes)
        if k > 0 and sigma_is_auto and np.any(beta != 0):
            prev = deviances[k - 1]
            change = abs((prev - res.deviance) / prev) if prev != 0 else 0.0
            if change < tol_dev_change or dev_ratios[k] > tol_dev_ratio:
                k += 1
                break
        k += 1

    trip.unpersist()
    ydf.unpersist()
    betas = betas[:k]
    sig = sig[:k]
    betas[:, 0, :] *= icol
    x_scale = np.array([scales.get(j, 1.0) for j in range(n_cols)])
    out = _rescale(
        betas, np.zeros(n_cols), x_scale, rinfo.y_center, rinfo.y_scale, True
    )
    dev_scale = float(np.prod(np.asarray(rinfo.y_scale) ** 2))
    bp = betas[:, 1:, :]
    return SlopeModel(
        family=family,
        feature_names=[f"x{j}" for j in range(n_cols)],
        intercept=True,
        betas=out,
        sigma=sig,
        lam=lam / n,
        null_deviance=null_deviance * dev_scale,
        deviances=np.asarray(deviances[:k]) * dev_scale,
        deviance_ratios=np.asarray(dev_ratios[:k]),
        passes=np.asarray(passes[:k], dtype=int),
        active_sets=[np.flatnonzero(np.any(b != 0, axis=1)) for b in out],
        n_unique=np.array(
            [len(np.unique(np.abs(b[b != 0]))) for b in bp], dtype=int
        ),
        class_names=rinfo.class_names,
        n_targets=m,
        x_center=np.zeros(n_cols),
        x_scale=x_scale,
        y_center=rinfo.y_center,
        y_scale=rinfo.y_scale,
    )


def predict_sparse(
    triplets: DataFrame,
    model,
    *,
    rows: DataFrame | None = None,
    path_idx: int | None = None,
    type: str = "link",
    row_col: str = "row_id",
    col_col: str = "col_id",
    val_col: str = "value",
    out: str = "pred",
) -> DataFrame:
    """Predictions for a model (from ``fit_sparse`` or ``fit``) directly on
    long-format triplets — no densification (R/predict.R semantics on the
    sparse input path). One broadcast join + one groupBy(row_id): O(nnz).

    ``rows`` optionally supplies the full row universe so all-zero rows
    predict the intercept. ``type``: link | response | class. Returns
    (row_col, ``out``) — for multinomial response an array of class
    probabilities, for class the predicted label."""
    spark = triplets.sparkSession
    if path_idx is None:
        path_idx = model.n_path - 1
    B = np.asarray(model.betas[path_idx], dtype=np.float64)  # (p+1|p, m)
    m = model.n_targets
    start = 1 if model.intercept else 0
    b0 = B[0] if model.intercept else np.zeros(m)
    pen = B[start:]

    nz = np.flatnonzero(np.any(pen != 0, axis=1))
    lps = [F.lit(float(b0[t])) for t in range(m)]
    if len(nz):
        bdf = spark.createDataFrame(
            [(int(j), *[float(pen[j, t]) for t in range(m)]) for j in nz],
            f"{col_col} int, " + ", ".join(f"_b{t} double" for t in range(m)),
        )
        agg = (
            triplets.join(F.broadcast(bdf), col_col)
            .groupBy(row_col)
            .agg(
                *[
                    F.sum(F.col(val_col) * F.col(f"_b{t}")).alias(f"_s{t}")
                    for t in range(m)
                ]
            )
        )
        base = rows.select(row_col).join(agg, row_col, "left") if rows is not None else agg
        lps = [
            F.coalesce(F.col(f"_s{t}"), F.lit(0.0)) + F.lit(float(b0[t]))
            for t in range(m)
        ]
    else:
        if rows is None:
            base = triplets.select(row_col).distinct()
        else:
            base = rows.select(row_col)

    fam = model.family
    if fam in ("gaussian", "binomial", "poisson"):
        lp = lps[0]
        if type == "link" or (type == "response" and fam == "gaussian"):
            expr = lp
        elif fam == "binomial" and type == "response":
            expr = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp))
        elif fam == "binomial" and type == "class":
            c1, c2 = model.class_names
            expr = F.when(lp > 0, F.lit(c2)).otherwise(F.lit(c1))
        elif fam == "poisson" and type == "response":
            expr = F.exp(lp)
        else:
            raise ValueError(f"type {type!r} not supported for {fam!r}")
        return base.select(row_col, expr.alias(out))

    # multinomial
    lps_full = lps + [F.lit(0.0)]
    if type == "link":
        return base.select(row_col, F.array(*lps).alias(out))
    mx = F.greatest(*lps_full)
    exps = [F.exp(e - mx) for e in lps_full]
    den = exps[0]
    for e in exps[1:]:
        den = den + e
    probs = [e / den for e in exps]
    if type == "response":
        return base.select(row_col, F.array(*probs).alias(out))
    if type == "class":
        classes = model.class_names
        best = F.greatest(*probs)
        chain = None
        for i, cls in enumerate(classes):
            cond = probs[i] == best
            chain = F.when(cond, F.lit(cls)) if chain is None else chain.when(cond, F.lit(cls))
        return base.select(row_col, chain.alias(out))
    raise ValueError(f"type {type!r} not supported for multinomial")


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
