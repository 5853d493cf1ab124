"""Model scoring metrics as DataFrame aggregations.

Re-expresses ``R/score.R`` (jolars/prague): mse/mae for gaussian and
poisson, mse/mae/deviance/misclass/auc for binomial, mse/mae/deviance for
multinomial.

AUC uses the Mann–Whitney average-rank statistic (``R/score.R:146-151``)
but computed *without a global row sort*: probabilities are first reduced
with ``groupBy(prob)`` (map-side combine), the cumulative negative counts
run over the much smaller distinct-value table, so at 100 TB the only
wide operation is an aggregation keyed by probability value.

All metrics are also exposed as in-core NumPy (``score_path``) so CV can
score an entire path from one collected test fold.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..core.families import setup_family
from ..model import SlopeModel
from .predict import predict

PROB_MIN = 1e-5  # clipping, R/score.R:57-58
PROB_MAX = 1 - PROB_MIN


def score(
    df: DataFrame,
    model: SlopeModel,
    label: str,
    measure: str,
    path_idx: int | None = None,
) -> float:
    """Score one path slice on ``df`` (test data) — distributed aggregation."""
    if path_idx is None:
        path_idx = model.n_path - 1
    fam = model.family
    out_col = {"binomial": "_prob", "multinomial": "_probs"}.get(fam, "_pred")
    pred = predict(df, model, path_idx, type="response", out=out_col)
    return measure_from_pred(pred, label, measure, fam, model.class_names)


def measure_from_pred(
    pred: DataFrame,
    label: str,
    measure: str,
    fam: str,
    class_names,
) -> float:
    """Measure arithmetic over a response-prediction frame (``_pred`` /
    ``_prob`` / ``_probs`` per family) — shared by the dense :func:`score`
    and the long-format ``ops.sparse.score_sparse``; R/score.R semantics."""
    if fam in ("gaussian", "poisson"):
        err = F.col("_pred") - F.col(label).cast("double")
        if measure == "mse":
            return float(pred.agg(F.avg(err * err)).first()[0])
        if measure == "mae":
            return float(pred.agg(F.avg(F.abs(err))).first()[0])
        raise ValueError(f"measure {measure!r} invalid for {fam}")

    if fam == "binomial":
        c1, c2 = class_names
        y2 = F.when(F.col(label).cast("string") == F.lit(c2), 1.0).otherwise(0.0)
        y1 = F.lit(1.0) - y2
        ph = F.col("_prob")
        if measure == "mse":
            return float(
                pred.agg(F.avg((ph + y1 - 1.0) ** 2 + (ph - y2) ** 2)).first()[0]
            )
        if measure == "mae":
            return float(
                pred.agg(F.avg(F.abs(ph + y1 - 1.0) + F.abs(ph - y2))).first()[0]
            )
        if measure == "deviance":
            phc = F.least(F.greatest(ph, F.lit(PROB_MIN)), F.lit(PROB_MAX))
            lp = y1 * F.log(1.0 - phc) + y2 * F.log(phc)
            return float(pred.agg(F.avg(-2.0 * lp)).first()[0])
        if measure == "misclass":
            err = y1 * F.when(ph > 0.5, 1.0).otherwise(0.0) + y2 * F.when(
                ph <= 0.5, 1.0
            ).otherwise(0.0)
            return float(pred.agg(F.avg(err)).first()[0])
        if measure == "auc":
            return auc(pred, "_prob", y2)
        raise ValueError(f"measure {measure!r} invalid for binomial")

    if fam == "multinomial":
        per_class = []
        for i, cls in enumerate(class_names):
            yk = F.when(F.col(label).cast("string") == F.lit(cls), 1.0).otherwise(0.0)
            pk = F.col("_probs")[i]
            if measure == "mse":
                per_class.append((yk - pk) ** 2)
            elif measure == "mae":
                per_class.append(F.abs(yk - pk))
            elif measure == "deviance":
                pkc = F.least(F.greatest(pk, F.lit(PROB_MIN)), F.lit(PROB_MAX))
                per_class.append(-2.0 * yk * F.log(pkc))
            else:
                raise ValueError(f"measure {measure!r} invalid for multinomial")
        total = per_class[0]
        for e in per_class[1:]:
            total = total + e
        if measure in ("mse", "mae"):
            total = total / float(len(class_names))
        return float(pred.agg(F.avg(total)).first()[0])

    raise ValueError(fam)


AUC_BUCKETS = 1024


def auc(df: DataFrame, prob_col: str, pos_indicator, weight_col: str | None = None) -> float:
    """Rank-based AUC with average-rank tie handling; optionally weighted
    (the reference's weighted variant, ``R/score.R:152-166``, in its
    expectation form — deterministic instead of randomized tie breaking).

    Tie-handling delta vs the reference: ``R/score.R:152-166`` breaks
    weighted ties by RANDOMIZING the rank order within each tied
    probability group, so repeated calls return different AUCs whose
    expected value is the average-rank statistic. This implementation
    computes that expectation directly (each tied group contributes
    ``n1_g * n0_g / 2`` cross pairs), which is (a) the same number the
    randomized form converges to, (b) reproducible — required for the
    cross-engine hash oracle — and (c) shuffle-free to distribute. The
    only observable difference is the absence of per-call sampling noise
    of order O(ties / n^2).

    AUC = sum_over_distinct_p( n1_p * (cum_n0_below + n0_p / 2) ) / (n1 * n0),
    algebraically identical to the reference's
    ``(sum rank(prob)[y==1] - n1(n1+1)/2) / (n1 n0)`` with R average ranks;
    with weights, every count becomes a weight sum.

    Scale plan: probabilities reduce via groupBy(p) (map-side combine);
    the cumulative negative count then runs in TWO levels — per-bucket
    totals (AUC_BUCKETS coarse buckets over [0, 1]) flow through one
    un-partitioned window over <= AUC_BUCKETS rows (bounded by the
    constant, not the data, so the single task is fine at any size), and
    the within-bucket cumsum is a window PARTITIONED by bucket. The whole
    statistic is ONE job — no driver round-trip; the grouped frame's
    shuffle feeds both levels via Spark's ReuseExchange.
    """
    wcol = F.col(weight_col) if weight_col else F.lit(1.0)
    grouped = (
        df.select(
            F.col(prob_col).alias("p"), pos_indicator.alias("y2"), wcol.alias("w")
        )
        .groupBy("p")
        .agg(
            F.sum(F.col("w") * F.col("y2")).alias("n1_g"),
            F.sum(F.col("w") * (F.lit(1.0) - F.col("y2"))).alias("n0_g"),
        )
        .withColumn(
            "bucket",
            F.least(
                F.greatest(F.floor(F.col("p") * AUC_BUCKETS), F.lit(0)),
                F.lit(AUC_BUCKETS - 1),
            ).cast("int"),
        )
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix_df = (
        grouped.groupBy("bucket")
        .agg(F.sum("n0_g").alias("_t0"))
        .withColumn("n0_before", F.coalesce(F.sum("_t0").over(wb), F.lit(0.0)))
        .drop("_t0")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = grouped.join(F.broadcast(prefix_df), "bucket").withColumn(
        "cum_n0_below",
        F.col("n0_before") + F.coalesce(F.sum("n0_g").over(w), F.lit(0.0)),
    )
    row = scored.agg(
        F.sum(F.col("n1_g") * (F.col("cum_n0_below") + F.col("n0_g") / 2.0)).alias("u"),
        F.sum("n1_g").alias("n1"),
        F.sum("n0_g").alias("n0"),
    ).first()
    return float(row["u"] / (row["n1"] * row["n0"]))


def auc_grouped(
    df: DataFrame,
    prob_col: str,
    pos_indicator,
    group_cols,
    weight_col: str | None = None,
    out: str = "auc",
) -> DataFrame:
    """Rank-based AUC PER GROUP in one distributed job — the segment
    twin of :func:`auc` (same average-rank tie expectation, same
    ``R/score.R:137-166`` statistic per segment).

    Scale plan: the global form needs the two-level bucket trick because
    its cumulative window has no partition key; here every window IS
    partitioned by the group columns, so the plan is one groupBy
    (group, p) reduce (map-side combine) + one per-group running-sum
    window + one final per-group agg. The window's running sum streams
    through each group's externally-sorted distinct probabilities — no
    group ever needs to fit in memory. Groups with a single class
    return NULL (AUC undefined), never a division error."""
    group_cols = list(group_cols)
    wcol = F.col(weight_col) if weight_col else F.lit(1.0)
    grouped = (
        df.select(
            *group_cols, F.col(prob_col).alias("p"),
            pos_indicator.alias("y2"), wcol.alias("w"),
        )
        .groupBy(*group_cols, "p")
        .agg(
            F.sum(F.col("w") * F.col("y2")).alias("n1_g"),
            F.sum(F.col("w") * (F.lit(1.0) - F.col("y2"))).alias("n0_g"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = grouped.withColumn(
        "cum_n0_below", F.coalesce(F.sum("n0_g").over(w), F.lit(0.0))
    )
    aggs = [
        (
            F.sum(F.col("n1_g") * (F.col("cum_n0_below") + F.col("n0_g") / 2.0))
            / F.when(
                (F.sum("n1_g") > 0) & (F.sum("n0_g") > 0),
                F.sum("n1_g") * F.sum("n0_g"),
            )
        ).alias(out),
        # weight mass (= row count when unweighted) rides the same agg
        (F.sum("n1_g") + F.sum("n0_g")).alias(f"_{out}_n"),
    ]
    return scored.groupBy(*group_cols).agg(*aggs)


def _auc_all_slices(df: DataFrame, prob_exprs: list, y2_expr) -> list[float]:
    """Unweighted AUC for EVERY path slice in ONE distributed job — the
    batched form of :func:`auc` for path scoring (auc is a rank statistic,
    not an avg, so it can't ride the shared mean-aggregation; running it
    per-slice would issue one rank job per path point, n_sigma extra jobs
    per CV cell).

    The slice probabilities ride as one array column; ``posexplode`` keys
    every (slice, p) pair and the same two-level bucketed cumulative
    machinery as :func:`auc` runs with the slice index joined into every
    partition key. Cost: ONE scan of ``df`` (the explode's x n_path row
    blow-up collapses in the map-side combine of the groupBy — shuffle
    volume is distinct (slice, p) pairs, the same total as the per-slice
    jobs shuffled, minus n_path-1 scans)."""
    n_s = len(prob_exprs)
    if n_s == 0:
        return []
    long = df.select(
        y2_expr.alias("y2"),
        F.posexplode(F.array(*prob_exprs)).alias("i", "p"),
    )
    grouped = (
        long.groupBy("i", "p")
        .agg(
            F.sum("y2").alias("n1_g"),
            F.sum(F.lit(1.0) - F.col("y2")).alias("n0_g"),
        )
        .withColumn(
            "bucket",
            F.least(
                F.greatest(F.floor(F.col("p") * AUC_BUCKETS), F.lit(0)),
                F.lit(AUC_BUCKETS - 1),
            ).cast("int"),
        )
    )
    wb = Window.partitionBy("i").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix_df = (
        grouped.groupBy("i", "bucket")
        .agg(F.sum("n0_g").alias("_t0"))
        .withColumn("n0_before", F.coalesce(F.sum("_t0").over(wb), F.lit(0.0)))
        .drop("_t0")
    )
    w = (
        Window.partitionBy("i", "bucket")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = grouped.join(F.broadcast(prefix_df), ["i", "bucket"]).withColumn(
        "cum_n0_below",
        F.col("n0_before") + F.coalesce(F.sum("n0_g").over(w), F.lit(0.0)),
    )
    rows = (
        scored.groupBy("i")
        .agg(
            F.sum(
                F.col("n1_g") * (F.col("cum_n0_below") + F.col("n0_g") / 2.0)
            ).alias("u"),
            F.sum("n1_g").alias("n1"),
            F.sum("n0_g").alias("n0"),
        )
        .collect()
    )
    out = [float("nan")] * n_s
    for r in rows:
        out[int(r["i"])] = float(r["u"] / (r["n1"] * r["n0"]))
    return out


def score_path_spark(
    df: DataFrame, model: SlopeModel, label: str, measures: list[str]
) -> dict:
    """Score EVERY path slice for every measure in ONE distributed
    aggregation (plus ONE batched rank job for auc across all slices —
    see :func:`_auc_all_slices`). This is the O(n)-driver-memory-free CV
    scoring path: the test fold is never collected; each slice's
    coefficients fold into the projection as literals, so the scan cost is
    independent of the path length. Returns {measure: [value per path
    point]}."""
    from .predict import linear_predictor_expr

    def lp_fn(i: int, t: int = 0):
        return linear_predictor_expr(model, i, target=t)

    return score_path_from_lp(
        df, lp_fn, label, measures, model.family, model.class_names,
        model.n_path, model.n_targets,
    )


def score_path_from_lp(
    df: DataFrame,
    lp_fn,
    label: str,
    measures: list[str],
    fam: str,
    class_names,
    n_path: int,
    n_targets: int,
) -> dict:
    """Path scoring over any linear-predictor provider: ``lp_fn(i, t)``
    returns the lp Column of path point ``i``, target ``t`` against
    ``df``'s columns. The dense path folds coefficients into the
    projection (:func:`score_path_spark`); the sparse path pre-joins per-
    row lp columns (``ops.sparse.score_path_sparse``). One aggregation
    covers every (path point x measure); auc adds ONE batched rank job for
    all slices together (:func:`_auc_all_slices`).

    Column namespace: the multinomial branch stages its softmax through
    temp columns named ``_sc_lps_{i}`` / ``_sc_exps_{i}`` / ``_sc_den_{i}``
    (one triple per path point). The ``_sc_*`` prefix is RESERVED the same
    way the sparse layer reserves ``_lp_*`` — a user feature column with
    one of those exact names would be clobbered by the staging withColumn
    and every later ``lp_fn`` reference to it would resolve to the staged
    array (analysis error)."""
    if n_path <= 0:
        # a fully truncated path (max_variables / dense-tail abandon can
        # leave zero points, e.g. a CV cell refit) would otherwise build an
        # aggregation with no expressions — an opaque analysis error
        return {m: [] for m in measures}
    avg_measures = [m for m in measures if m != "auc"]
    out: dict = {m: [0.0] * n_path for m in measures}
    agg_df = score_path_agg_frame(
        df, lp_fn, label, avg_measures, fam, class_names, n_path, n_targets
    )
    if agg_df is not None:
        row = agg_df.first()
        for meas in avg_measures:
            out[meas] = [float(row[f"_{meas}_{i}"]) for i in range(n_path)]
    if "auc" in measures:
        y = F.col(label)
        c1, c2 = class_names
        y2 = F.when(y.cast("string") == F.lit(c2), 1.0).otherwise(0.0)
        phs = [
            F.lit(1.0) / (F.lit(1.0) + F.exp(-lp_fn(i))) for i in range(n_path)
        ]
        out["auc"] = _auc_all_slices(df, phs, y2)
    return out


def score_path_agg_frame(
    df: DataFrame,
    lp_fn,
    label: str,
    avg_measures: list[str],
    fam: str,
    class_names,
    n_path: int,
    n_targets: int = 0,
) -> "DataFrame | None":
    """The ONE-row aggregation frame :func:`score_path_from_lp` collects
    — exposed separately (the ``dedup._content_index_rows`` convention)
    so plan pins can audit the staged-softmax scoring plan at wide m
    without executing the scan. Returns None when no averaged measure
    is requested (auc-only scoring has no agg frame)."""
    y = F.col(label)
    aggs = []
    for i in range(n_path):
        if fam in ("gaussian", "poisson"):
            lp = lp_fn(i)
            pred = F.exp(lp) if fam == "poisson" else lp
            err = pred - y.cast("double")
            exprs = {"mse": F.avg(err * err), "mae": F.avg(F.abs(err))}
        elif fam == "binomial":
            c1, c2 = class_names
            lp = lp_fn(i)
            ph = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp))
            y2 = F.when(y.cast("string") == F.lit(c2), 1.0).otherwise(0.0)
            y1 = F.lit(1.0) - y2
            phc = F.least(F.greatest(ph, F.lit(PROB_MIN)), F.lit(PROB_MAX))
            exprs = {
                "mse": F.avg((ph + y1 - 1.0) ** 2 + (ph - y2) ** 2),
                "mae": F.avg(F.abs(ph + y1 - 1.0) + F.abs(ph - y2)),
                "deviance": F.avg(-2.0 * (y1 * F.log(1.0 - phc) + y2 * F.log(phc))),
                "misclass": F.avg(
                    y1 * F.when(ph > 0.5, 1.0).otherwise(0.0)
                    + y2 * F.when(ph <= 0.5, 1.0).otherwise(0.0)
                ),
            }
        else:  # multinomial
            classes = class_names
            m = n_targets
            # stabilized softmax STAGED through per-path-point temp
            # columns (ops.predict's form): inlined, every class term
            # would re-carry every linear predictor — ~(m+1)^2 p-wide
            # subtrees PER PATH POINT in the single scoring aggregation.
            # Same op order (array_max == greatest; the fold's leading
            # 0.0 + exp(..) is IEEE-exact), so scores are bit-identical.
            tmp_l, tmp_e, tmp_d = f"_sc_lps_{i}", f"_sc_exps_{i}", f"_sc_den_{i}"
            a, ae = F.col(tmp_l), F.col(tmp_e)
            df = (
                df.withColumn(
                    tmp_l,
                    F.array(*[lp_fn(i, t) for t in range(m)], F.lit(0.0)),
                )
                .withColumn(
                    tmp_e,
                    F.transform(a, lambda e: F.exp(e - F.array_max(a))),
                )
                .withColumn(
                    tmp_d,
                    F.aggregate(ae, F.lit(0.0), lambda acc, v: acc + v),
                )
            )
            per = {"mse": None, "mae": None, "deviance": None}
            for ci, cls in enumerate(classes):
                yk = F.when(y.cast("string") == F.lit(cls), 1.0).otherwise(0.0)
                pk = F.element_at(ae, ci + 1) / F.col(tmp_d)
                pkc = F.least(F.greatest(pk, F.lit(PROB_MIN)), F.lit(PROB_MAX))
                terms = {
                    "mse": (yk - pk) ** 2,
                    "mae": F.abs(yk - pk),
                    "deviance": -2.0 * yk * F.log(pkc),
                }
                for k2, t2 in terms.items():
                    per[k2] = t2 if per[k2] is None else per[k2] + t2
            exprs = {
                "mse": F.avg(per["mse"] / float(len(classes))),
                "mae": F.avg(per["mae"] / float(len(classes))),
                "deviance": F.avg(per["deviance"]),
            }
        for meas in avg_measures:
            aggs.append(exprs[meas].alias(f"_{meas}_{i}"))
    if not aggs:
        return None
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# in-core path scoring (CV fast path): all sigmas at once from NumPy arrays
# ---------------------------------------------------------------------------

def score_path(
    model: SlopeModel, X: np.ndarray, y, measure: str
) -> np.ndarray:
    """Score every path slice in one shot. ``X`` is the ORIGINAL-scale
    feature matrix (n, p) without the ones column; ``y`` the raw response."""
    fam = model.family
    n_path = model.n_path
    out = np.empty(n_path)
    start = 1 if model.intercept else 0

    for i in range(n_path):
        B = model.betas[i]  # (p_total, m)
        lp = X @ B[start:, :]
        if model.intercept:
            lp = lp + B[0, :][np.newaxis, :]
        out[i] = _score_slice(fam, model.class_names, lp, y, measure)
    return out


def _score_slice(fam, class_names, lp, y, measure):
    if fam in ("gaussian", "poisson"):
        pred = lp[:, 0] if fam == "gaussian" else np.exp(lp[:, 0])
        yv = np.asarray(y, dtype=np.float64)
        if measure == "mse":
            return float(np.mean((pred - yv) ** 2))
        if measure == "mae":
            return float(np.mean(np.abs(pred - yv)))
        raise ValueError(measure)
    if fam == "binomial":
        c2 = class_names[1]
        y2 = (np.asarray(y).astype(str) == str(c2)).astype(float)
        y1 = 1.0 - y2
        prob = 1.0 / (1.0 + np.exp(-lp[:, 0]))
        if measure == "mse":
            return float(np.mean((prob + y1 - 1.0) ** 2 + (prob - y2) ** 2))
        if measure == "mae":
            return float(np.mean(np.abs(prob + y1 - 1.0) + np.abs(prob - y2)))
        if measure == "deviance":
            p = np.clip(prob, PROB_MIN, PROB_MAX)
            return float(np.mean(-2.0 * (y1 * np.log(1.0 - p) + y2 * np.log(p))))
        if measure == "misclass":
            return float(np.mean(y1 * (prob > 0.5) + y2 * (prob <= 0.5)))
        if measure == "auc":
            return _auc_numpy(y2, prob)
        raise ValueError(measure)
    if fam == "multinomial":
        fam_obj = setup_family("multinomial")
        probs = fam_obj.link_inverse(lp)  # (n, n_classes)
        ys = np.asarray(y).astype(str)
        Y = np.stack(
            [(ys == str(c)).astype(float) for c in class_names], axis=1
        )
        if measure == "mse":
            return float(np.mean((Y - probs) ** 2))
        if measure == "mae":
            return float(np.mean(np.abs(Y - probs)))
        if measure == "deviance":
            p = np.clip(probs, PROB_MIN, PROB_MAX)
            return float(np.mean(np.sum(-2.0 * Y * np.log(p), axis=1)))
        raise ValueError(measure)
    raise ValueError(fam)


def _auc_numpy(y2: np.ndarray, prob: np.ndarray) -> float:
    """Average-rank Mann–Whitney AUC (matches R ``rank`` semantics)."""
    order = np.argsort(prob, kind="stable")
    sorted_p = prob[order]
    ranks = np.empty_like(prob)
    # average ranks over ties
    i = 0
    n = len(prob)
    while i < n:
        j = i
        while j + 1 < n and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        ranks[order[i : j + 1]] = avg
        i = j + 1
    n1 = float(np.sum(y2))
    n0 = float(len(y2) - n1)
    u = float(np.sum(ranks[y2 == 1.0])) - n1 * (n1 + 1.0) / 2.0
    return u / (n1 * n0)
