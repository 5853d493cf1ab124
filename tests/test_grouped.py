"""fit_grouped: one in-core SLOPE path per group via a single
applyInPandas shuffle. Parity is pinned against numpy_path_fit run
driver-side on each group's filtered rows — the SAME routine the KKT
oracles pin `fit` against, so agreement here chains the grouped fit to
the reference semantics (R/owl.R:1-390 per segment)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prague_spark import fit_grouped
from prague_spark.core.ref_fit import numpy_path_fit
from prague_spark.ops.grouped import INTERCEPT
from prague_spark.plan_audit import audit

FEATS = ["l_quantity", "l_discount"]


def _expected(li_pd, group_val, family, label, **kw):
    g = li_pd[li_pd["l_returnflag"] == group_val].sort_values("_rid",
                                                              kind="mergesort")
    X = g[FEATS].to_numpy(dtype=np.float64)
    y = g[label].to_numpy()
    return numpy_path_fit(X, y, family, **kw)


@pytest.fixture(scope="module")
def li(lineitem):
    return (
        lineitem.select("l_returnflag", "l_linestatus", "l_quantity",
                        "l_discount", "l_extendedprice", "l_orderkey",
                        "l_linenumber")
        .withColumn("_rid", F.xxhash64("l_orderkey", "l_linenumber"))
        .cache()
    )


def test_fit_grouped_matches_per_group_reference(spark, li):
    out = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=4, lambda_min_ratio=0.1, order_col="_rid",
    ).collect()
    li_pd = li.toPandas()
    groups = sorted(li_pd["l_returnflag"].unique())
    assert sorted({r["l_returnflag"] for r in out}) == groups
    for gv in groups:
        ref = _expected(li_pd, gv, "gaussian", "l_extendedprice",
                        n_sigma=4, lambda_min_ratio=0.1)
        B = ref["betas"]  # (K, p+1, 1)
        rows = [r for r in out if r["l_returnflag"] == gv]
        ks = {r["path_idx"] for r in rows}
        assert ks == set(range(B.shape[0]))
        names = [INTERCEPT] + FEATS
        got = {(r["path_idx"], r["feature"], r["cls"]): r["beta"] for r in rows}
        for k in range(B.shape[0]):
            for j, nm in enumerate(names):
                b = float(B[k, j, 0])
                if j > 0 and b == 0.0:
                    assert (k, nm, 0) not in got
                else:
                    # identical routine on identically-ordered rows; BLAS
                    # reductions are not bit-deterministic across thread
                    # contexts, so pin at ulp-scale, not exact
                    assert got[(k, nm, 0)] == pytest.approx(
                        b, rel=1e-9, abs=1e-9
                    ), (gv, k, nm)
        nz = {r["path_idx"]: r["n_nonzero"] for r in rows}
        assert nz == {k: ref["n_nonzero"][k] for k in range(B.shape[0])}


def test_fit_grouped_partition_invariant(spark, li):
    kw = dict(n_sigma=3, lambda_min_ratio=0.2, order_col="_rid")
    a = fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                    ["l_returnflag"], **kw).collect()
    b = fit_grouped(li.repartition(13), FEATS, "l_extendedprice", "gaussian",
                    ["l_returnflag"], **kw).collect()
    key = lambda r: (r["l_returnflag"], r["path_idx"], r["feature"], r["cls"])
    ka = {key(r): r["beta"] for r in a}
    kb = {key(r): r["beta"] for r in b}
    # same rows/support; betas equal to ulp scale (BLAS reductions are
    # not bit-deterministic across thread contexts, so not exact)
    assert set(ka) == set(kb)
    for k in ka:
        assert kb[k] == pytest.approx(ka[k], rel=1e-9, abs=1e-9), k


def test_fit_grouped_binomial_and_multikey(spark, li):
    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    out = fit_grouped(
        df, FEATS, "big", "binomial", ["l_returnflag", "l_linestatus"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    )
    rows = out.collect()
    combos = {(r["l_returnflag"], r["l_linestatus"]) for r in rows}
    # only combos present in the data (and two-class in the label) appear
    present = {
        (r["l_returnflag"], r["l_linestatus"])
        for r in df.select("l_returnflag", "l_linestatus").distinct().collect()
    }
    assert combos <= present and len(combos) >= 2
    # intercept emitted for every (group, path point)
    for gv in combos:
        pts = {r["path_idx"] for r in rows
               if (r["l_returnflag"], r["l_linestatus"]) == gv}
        icpts = {r["path_idx"] for r in rows
                 if (r["l_returnflag"], r["l_linestatus"]) == gv
                 and r["feature"] == INTERCEPT}
        assert icpts == pts


def test_fit_grouped_poisson_and_multinomial(spark, li):
    """The remaining families run per segment and match the driver-side
    reference on one probed group (poisson exactly via ulp-tolerance;
    multinomial support shape)."""
    pdf = li.toPandas()
    # poisson: counts from rounded quantity
    dfp = li.withColumn("cnt", F.round("l_quantity").cast("double"))
    outp = fit_grouped(
        dfp, ["l_discount"], "cnt", "poisson", ["l_linestatus"],
        n_sigma=3, lambda_min_ratio=0.2, order_col="_rid",
    ).collect()
    gs = sorted({r["l_linestatus"] for r in outp})
    assert len(gs) >= 1
    gv = gs[0]
    g = pdf[pdf["l_linestatus"] == gv].sort_values("_rid", kind="mergesort")
    ref = numpy_path_fit(
        g[["l_discount"]].to_numpy(dtype=np.float64),
        np.round(g["l_quantity"].to_numpy(dtype=np.float64)),
        "poisson", n_sigma=3, lambda_min_ratio=0.2,
    )
    got = {
        (r["path_idx"], r["feature"]): r["beta"]
        for r in outp if r["l_linestatus"] == gv
    }
    for k in range(ref["betas"].shape[0]):
        assert got[(k, INTERCEPT)] == pytest.approx(
            float(ref["betas"][k, 0, 0]), rel=1e-9, abs=1e-9
        )
    # multinomial: 3-class label from returnflag per linestatus segment;
    # cls must range over the (m-1)=2 targets
    outm = fit_grouped(
        li, FEATS, "l_returnflag", "multinomial", ["l_linestatus"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).collect()
    assert {r["cls"] for r in outm} == {0, 1}
    for gvm in {r["l_linestatus"] for r in outm}:
        pts = {r["path_idx"] for r in outm if r["l_linestatus"] == gvm}
        assert pts == set(range(max(pts) + 1))


def test_predict_grouped_roundtrip(spark, li):
    """fit_grouped -> predict_grouped: the broadcast-joined dot product
    reproduces the per-group linear predictor computed driver-side from
    the same coefficients (exact — same original-unit betas, plain
    column arithmetic), deepest path point by default, NULL for a group
    with no model, inverse links for response."""
    from prague_spark import predict_grouped

    coefs = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=4, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()
    pred = predict_grouped(
        li, coefs, FEATS, ["l_returnflag"], family="gaussian", type="link",
    )
    crows = coefs.collect()
    kmax = {}
    for r in crows:
        kmax[r["l_returnflag"]] = max(
            kmax.get(r["l_returnflag"], -1), r["path_idx"]
        )
    beta = {
        (r["l_returnflag"], r["feature"]): r["beta"]
        for r in crows if r["path_idx"] == kmax[r["l_returnflag"]]
    }
    got = pred.select("l_returnflag", *FEATS, "pred").limit(500).collect()
    for r in got:
        g = r["l_returnflag"]
        exp = beta.get((g, INTERCEPT), 0.0) + sum(
            beta.get((g, f), 0.0) * float(r[f]) for f in FEATS
        )
        assert r["pred"] == pytest.approx(exp, rel=1e-12), g
    # explicit path point 0 = intercept-only model -> constant per group
    p0 = predict_grouped(
        li, coefs, FEATS, ["l_returnflag"], family="gaussian",
        type="link", path_idx=0,
    )
    n_distinct = (
        p0.groupBy("l_returnflag")
        .agg(F.countDistinct(F.round("pred", 9)).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in n_distinct)
    # a group with no model scores NULL
    extra = li.withColumn("l_returnflag", F.lit("Z")).limit(5)
    pz = predict_grouped(
        extra, coefs, FEATS, ["l_returnflag"], family="gaussian"
    )
    assert all(r["pred"] is None for r in pz.collect())
    # binomial response is the sigmoid of the link
    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    cb = fit_grouped(
        df, FEATS, "big", "binomial", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    )
    pr = predict_grouped(
        df, cb, FEATS, ["l_returnflag"], family="binomial", type="response",
    ).select("pred").limit(50).collect()
    assert all(0.0 <= r["pred"] <= 1.0 for r in pr)
    # a gaussian coefficient frame carries no classes -> loud, not silent
    with pytest.raises(ValueError, match="> 2 classes"):
        predict_grouped(li, coefs, FEATS, ["l_returnflag"],
                        family="multinomial")
    with pytest.raises(ValueError, match="unknown type"):
        predict_grouped(li, coefs, FEATS, ["l_returnflag"], type="clazz")
    coefs.unpersist()


def test_predict_grouped_binomial_class_and_classes_column(spark, li):
    """type='class' thresholds at lp>0 with the positive class read off
    the coefficient frame's carried ``classes`` column — no scan of the
    scored data, no explicit classes= needed."""
    from prague_spark import predict_grouped

    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    cb = fit_grouped(
        df, FEATS, "big", "binomial", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()
    # fit_grouped carries the group's sorted classes on every row
    sets = {tuple(r[0]) for r in cb.select("classes").distinct().collect()}
    assert sets == {("hi", "lo")}
    both = predict_grouped(
        df, cb, FEATS, ["l_returnflag"], family="binomial", type="class",
        out="cls",
    )
    both = predict_grouped(
        both, cb, FEATS, ["l_returnflag"], family="binomial", type="link",
        out="lp",
    ).select("cls", "lp").limit(300).collect()
    for r in both:
        assert r["cls"] == ("lo" if r["lp"] > 0 else "hi"), r
    # rows from an unmodelled group classify as NULL
    pz = predict_grouped(
        df.withColumn("l_returnflag", F.lit("Z")).limit(4), cb, FEATS,
        ["l_returnflag"], family="binomial", type="class",
    )
    assert all(r["pred"] is None for r in pz.collect())
    cb.unpersist()


def test_predict_score_grouped_multinomial(spark, li):
    """Multinomial per-segment scoring: the broadcast nested-map softmax
    matches a driver-side recompute from the same coefficients
    (R/predict.R:151-197 per segment), argmax class agrees, and
    score_grouped's deviance/misclass equal the pandas recompute."""
    from prague_spark import predict_grouped, score_grouped

    cm = fit_grouped(
        li, FEATS, "l_returnflag", "multinomial", ["l_linestatus"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()
    classes = sorted(
        r[0] for r in li.select("l_returnflag").distinct().collect()
    )
    crows = cm.collect()
    kmax = {}
    for r in crows:
        kmax[r["l_linestatus"]] = max(kmax.get(r["l_linestatus"], -1),
                                      r["path_idx"])
    beta = {
        (r["l_linestatus"], r["cls"], r["feature"]): r["beta"]
        for r in crows if r["path_idx"] == kmax[r["l_linestatus"]]
    }

    def _probs(g, x):
        lps = [
            beta.get((g, t, INTERCEPT), 0.0)
            + sum(beta.get((g, t, f), 0.0) * x[f] for f in FEATS)
            for t in range(len(classes) - 1)
        ] + [0.0]
        mx = max(lps)
        ex = [np.exp(v - mx) for v in lps]
        return [e / sum(ex) for e in ex]

    pred = predict_grouped(
        li, cm, FEATS, ["l_linestatus"], family="multinomial",
        type="response", out="probs",
    )
    pred = predict_grouped(
        pred, cm, FEATS, ["l_linestatus"], family="multinomial",
        type="class", out="cls_pred",
    )
    rows = pred.select("l_linestatus", *FEATS, "l_returnflag", "probs",
                       "cls_pred").limit(400).collect()
    for r in rows:
        exp = _probs(r["l_linestatus"], {f: float(r[f]) for f in FEATS})
        assert len(r["probs"]) == len(classes)
        assert abs(sum(r["probs"]) - 1.0) < 1e-12
        for a, b in zip(r["probs"], exp):
            assert a == pytest.approx(b, rel=1e-12)
        assert r["cls_pred"] == classes[int(np.argmax(exp))]

    # score_grouped vs pandas recompute (classes carried, no df scan)
    got = {
        (r["l_linestatus"], r["measure"]): (r["value"], r["n"])
        for m in ("deviance", "misclass")
        for r in score_grouped(
            li, cm, FEATS, "l_returnflag", ["l_linestatus"],
            family="multinomial", measure=m,
        ).collect()
    }
    pdf = li.select("l_linestatus", *FEATS, "l_returnflag").toPandas()
    for gv, grp in pdf.groupby("l_linestatus"):
        P = np.array([
            _probs(gv, {f: float(row[f]) for f in FEATS})
            for _, row in grp.iterrows()
        ])
        yidx = np.searchsorted(classes, grp["l_returnflag"].to_numpy())
        ptrue = np.clip(P[np.arange(len(P)), yidx], 1e-12, 1 - 1e-12)
        assert got[(gv, "deviance")][0] == pytest.approx(
            float((-2.0 * np.log(ptrue)).mean()), rel=1e-9)
        assert got[(gv, "misclass")][0] == pytest.approx(
            float((P.argmax(axis=1) != yidx).mean()), rel=1e-9)
        assert got[(gv, "deviance")][1] == len(grp)
    # multinomial link is the (m-1) lp array
    lk = predict_grouped(
        li, cm, FEATS, ["l_linestatus"], family="multinomial", type="link",
    ).select("pred").first()
    assert len(lk["pred"]) == len(classes) - 1
    with pytest.raises(ValueError, match="invalid"):
        score_grouped(li, cm, FEATS, "l_returnflag", ["l_linestatus"],
                      family="multinomial", measure="auc")
    cm.unpersist()


def test_cv_fit_grouped(spark, li):
    """Per-segment CV: the in-core trainOwl recipe per group matches a
    driver-side recompute on one probed group (full fit fixes the grid,
    per-fold refit at the fixed sigmas, held-out mse, mean/se, argmin
    optimum), and validation fails loud."""
    from prague_spark import cv_fit_grouped

    out = cv_fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_folds=3, fold_col="l_orderkey", n_sigma=4, lambda_min_ratio=0.1,
        order_col="_rid",
    ).collect()
    groups = {r["l_returnflag"] for r in out}
    assert len(groups) == 3
    for gv in groups:
        rows = sorted((r for r in out if r["l_returnflag"] == gv),
                      key=lambda r: r["sigma_idx"])
        assert [r["sigma_idx"] for r in rows] == list(range(len(rows)))
        opt = [r for r in rows if r["is_optimum"]]
        assert len(opt) == 1
        assert opt[0]["mean"] == min(r["mean"] for r in rows)

    # driver-side recompute for one group
    gv = sorted(groups)[0]
    pdf = li.filter(F.col("l_returnflag") == gv).toPandas().sort_values(
        "_rid", kind="mergesort"
    )
    from prague_spark.core.ref_fit import numpy_path_fit

    X = pdf[FEATS].to_numpy(dtype=np.float64)
    y = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
    folds = pdf["l_orderkey"].to_numpy().astype(np.int64) % 3
    full = numpy_path_fit(X, y, "gaussian", n_sigma=4, lambda_min_ratio=0.1)
    sig = full["sigma"]
    scores = np.empty((3, len(sig)))
    for f in range(3):
        tr = folds != f
        fit = numpy_path_fit(X[tr], y[tr], "gaussian", sigma=sig)
        for si in range(len(sig)):
            B = fit["betas"][si]
            err = y[~tr] - (B[0, 0] + X[~tr] @ B[1:, 0])
            scores[f, si] = (err * err).mean()
    got = {r["sigma_idx"]: (r["sigma"], r["mean"], r["se"])
           for r in out if r["l_returnflag"] == gv}
    assert len(got) == len(sig)
    for si in range(len(sig)):
        assert got[si][0] == pytest.approx(float(sig[si]), rel=1e-12)
        assert got[si][1] == pytest.approx(float(scores[:, si].mean()), rel=1e-9)
        assert got[si][2] == pytest.approx(
            float(scores[:, si].std(ddof=1) / np.sqrt(3)), rel=1e-9)

    with pytest.raises(ValueError, match="fold_col is required"):
        cv_fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                       ["l_returnflag"], n_sigma=2)
    with pytest.raises(ValueError, match="needs family"):
        cv_fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                       ["l_returnflag"], fold_col="l_orderkey",
                       measure="deviance", n_sigma=2)


def test_cv_fit_grouped_matches_distributed_cv(spark, li):
    """The two CV implementations agree on the same single-segment data:
    cv_fit_grouped (in-core trainOwl per group) vs ops.cv.cv_fit (the
    distributed gram-stats path) with the same deterministic folds and
    the same frozen sigma grid — per-sigma mean AND se at rel 1e-7,
    chaining the grouped twin to the already-oracled distributed one."""
    from prague_spark import cv_fit_grouped
    from prague_spark.ops.cv import cv_fit

    kw = dict(n_folds=3, n_sigma=4, lambda_min_ratio=0.1)
    # both sides converged tightly: the 1e-7 agreement target needs both
    # solvers' stopping noise well below it
    res = cv_fit(
        li, FEATS, "l_extendedprice", "gaussian", measures=["mse"],
        fold_col="l_orderkey", method="refit", n_folds=kw["n_folds"],
        n_sigma=kw["n_sigma"], lambda_min_ratio=kw["lambda_min_ratio"],
        tol_rel_gap=1e-12, tol_abs=1e-13, tol_rel=1e-13,
    )
    base = {r["sigma_idx"]: r for r in res.summary}
    got = cv_fit_grouped(
        li.withColumn("_g", F.lit("all")), FEATS, "l_extendedprice",
        "gaussian", ["_g"], fold_col="l_orderkey", order_col="_rid",
        measure="mse", tol_rel_gap=1e-12, **kw,
    ).collect()
    assert len(got) == len(base)
    for r in got:
        b = base[r["sigma_idx"]]
        assert r["sigma"] == pytest.approx(b["sigma"], rel=1e-7)
        assert r["mean"] == pytest.approx(b["mean"], rel=1e-7)
        assert r["se"] == pytest.approx(b["se"], rel=1e-7, abs=1e-9)
    # the gram-statistics fast path agrees too, up to its moment-formula
    # cancellation (mse from y'y - 2b'X'y + b'Gb loses ~2 digits more
    # than direct residuals; it is hash-pinned separately in c1_cv_fit)
    res_g = cv_fit(
        li, FEATS, "l_extendedprice", "gaussian", measures=["mse"],
        fold_col="l_orderkey", method="gram", n_folds=kw["n_folds"],
        n_sigma=kw["n_sigma"], lambda_min_ratio=kw["lambda_min_ratio"],
        tol_abs=1e-13, tol_rel=1e-13,
    )
    for r in res_g.summary:
        assert r["mean"] == pytest.approx(
            base[r["sigma_idx"]]["mean"], rel=5e-6)


def test_cv_fit_auc_optimum_direction(spark, li):
    """optimum='best' makes the distributed cv_fit direction-aware on
    auc (argmax), agreeing with cv_fit_grouped's is_optimum on the same
    single-segment data; the reference-exact default still argmins and
    WARNS that it is selecting the lowest-auc point (R/trainOwl.R:165
    applies which.min to every measure)."""
    from prague_spark import cv_fit_grouped
    from prague_spark.ops.cv import cv_fit

    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000, "hi").otherwise("lo")
    )
    kw = dict(n_folds=3, n_sigma=3, lambda_min_ratio=0.1)
    with pytest.warns(UserWarning, match="argmin"):
        res_ref = cv_fit(
            df, FEATS, "big", "binomial", measures=["auc"],
            fold_col="l_orderkey", method="refit", tol_rel_gap=1e-10, **kw,
        )
    res_best = cv_fit(
        df, FEATS, "big", "binomial", measures=["auc"],
        fold_col="l_orderkey", method="refit", optimum="best",
        tol_rel_gap=1e-10, **kw,
    )
    by_idx = {r["sigma_idx"]: r["mean"] for r in res_best.summary}
    # same summary either way; only the optimum pick flips direction
    assert {r["sigma_idx"]: r["mean"] for r in res_ref.summary} == by_idx
    ref_pick = res_ref.optima[0]
    best_pick = res_best.optima[0]
    assert ref_pick["mean"] == min(by_idx.values())
    assert best_pick["mean"] == max(by_idx.values())

    grp = cv_fit_grouped(
        df.withColumn("_g", F.lit("all")), FEATS, "big", "binomial",
        ["_g"], fold_col="l_orderkey", order_col="_rid", measure="auc",
        tol_rel_gap=1e-10, **kw,
    ).collect()
    gmeans = {r["sigma_idx"]: r["mean"] for r in grp}
    for si, mv in gmeans.items():
        assert mv == pytest.approx(by_idx[si], rel=1e-7)
    g_opt = [r["sigma_idx"] for r in grp if r["is_optimum"]]
    assert g_opt == [best_pick["sigma_idx"]]
    with pytest.raises(ValueError, match="optimum"):
        cv_fit(df, FEATS, "big", "binomial", measures=["auc"],
               optimum="bogus")


def test_cv_fit_grouped_fold_class_coding(spark, li):
    """Binomial fold scoring uses the GROUP's class pair, never the
    fold's own labels: a fold whose held-out rows are single-class (or
    whose training rows lose a class) fails loud naming the group and
    fold, and well-mixed folds produce results identical to the
    driver-side recompute with group-level coding."""
    from prague_spark import cv_fit_grouped

    # craft: group 'G', class 'b' lives ONLY in fold 0 -> fold 0's
    # training rows lose 'b' entirely AND folds 1/2 hold out single-class
    rows = [("G", float(i), float(i % 7), "b" if i % 3 == 0 else "a", i)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "g string, x1 double, x2 double, yy string, k int"
    ).withColumn("fold3", F.when(F.col("yy") == "b", 0).otherwise(
        (F.col("k") % 2) + 1))
    with pytest.raises(Exception, match="fold .*(training|held-out)"):
        cv_fit_grouped(df, ["x1", "x2"], "yy", "binomial", ["g"],
                       fold_col="fold3", measure="deviance", n_sigma=2,
                       lambda_min_ratio=0.5).collect()

    # well-mixed folds: matches the driver recompute with the GROUP pair
    df2 = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    out = cv_fit_grouped(
        df2, FEATS, "big", "binomial", ["l_linestatus"],
        fold_col="l_orderkey", order_col="_rid", measure="deviance",
        n_folds=3, n_sigma=3, lambda_min_ratio=0.2,
    ).collect()
    gv = sorted({r["l_linestatus"] for r in out})[0]
    pdf = df2.filter(F.col("l_linestatus") == gv).toPandas().sort_values(
        "_rid", kind="mergesort")
    X = pdf[FEATS].to_numpy(dtype=np.float64)
    ys = pdf["big"].astype(str).to_numpy()
    folds = pdf["l_orderkey"].to_numpy().astype(np.int64) % 3
    full = numpy_path_fit(X, ys, "binomial", n_sigma=3, lambda_min_ratio=0.2)
    sig = full["sigma"]
    y2 = (ys == "lo").astype(float)  # group-level positive class
    scores = np.empty((3, len(sig)))
    for f in range(3):
        tr = folds != f
        fit = numpy_path_fit(X[tr], ys[tr], "binomial", sigma=sig)
        for si in range(len(sig)):
            B = fit["betas"][si]
            p1 = 1.0 / (1.0 + np.exp(-(B[0, 0] + X[~tr] @ B[1:, 0])))
            p1 = np.clip(p1, 1e-12, 1 - 1e-12)
            scores[f, si] = (-2.0 * (y2[~tr] * np.log(p1)
                                     + (1 - y2[~tr]) * np.log(1 - p1))).mean()
    got = {r["sigma_idx"]: r["mean"] for r in out if r["l_linestatus"] == gv}
    assert len(got) == len(sig)
    for si in range(len(sig)):
        assert got[si] == pytest.approx(float(scores[:, si].mean()), rel=1e-9)


def test_score_grouped(spark, li):
    """score_grouped: per-segment mse equals the driver-side recompute
    from predict_grouped's own responses; binomial misclass is in [0,1];
    invalid measures fail loud."""
    from prague_spark import predict_grouped, score_grouped

    coefs = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()
    sc = score_grouped(
        li, coefs, FEATS, "l_extendedprice", ["l_returnflag"],
        family="gaussian", measure="mse",
    )
    got = {r["l_returnflag"]: (r["value"], r["n"]) for r in sc.collect()}
    pred = predict_grouped(
        li, coefs, FEATS, ["l_returnflag"], family="gaussian",
        type="response", out="mu",
    ).select("l_returnflag", "l_extendedprice", "mu").toPandas()
    for gv, grp in pred.groupby("l_returnflag"):
        err = grp["l_extendedprice"].astype(float) - grp["mu"]
        assert got[gv][1] == len(grp)
        assert got[gv][0] == pytest.approx(float((err * err).mean()), rel=1e-9)
    # binomial misclass
    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    cb = fit_grouped(
        df, FEATS, "big", "binomial", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    )
    mc = score_grouped(
        df, cb, FEATS, "big", ["l_returnflag"],
        family="binomial", measure="misclass",
    ).collect()
    assert mc and all(0.0 <= r["value"] <= 1.0 for r in mc)
    with pytest.raises(ValueError, match="invalid"):
        score_grouped(li, coefs, FEATS, "l_extendedprice",
                      ["l_returnflag"], family="gaussian", measure="auc")
    coefs.unpersist()


def test_score_grouped_full_measure_grid(spark, li):
    """score_grouped covers the distributed scorer's measure/family grid
    (ops.cv._OK_MEASURES): binomial mse/mae (the reference two-term
    form), multinomial mse/mae (per-class mean), poisson mse/mae — each
    equal to a pandas recompute from predict_grouped's own responses."""
    from prague_spark import predict_grouped, score_grouped

    # binomial mse/mae
    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    cb = fit_grouped(df, FEATS, "big", "binomial", ["l_linestatus"],
                     n_sigma=3, lambda_min_ratio=0.1, order_col="_rid").cache()
    pred = predict_grouped(
        df, cb, FEATS, ["l_linestatus"], family="binomial",
        type="response", out="mu",
    ).select("l_linestatus", "big", "mu").toPandas()
    for meas in ("mse", "mae"):
        got = {r["l_linestatus"]: r["value"] for r in score_grouped(
            df, cb, FEATS, "big", ["l_linestatus"],
            family="binomial", measure=meas).collect()}
        for gv, grp in pred.groupby("l_linestatus"):
            y2 = (grp["big"] == "lo").astype(float).to_numpy()
            p = grp["mu"].to_numpy()
            a, b = p + (1 - y2) - 1.0, p - y2
            exp = (a**2 + b**2).mean() if meas == "mse" else (
                np.abs(a) + np.abs(b)).mean()
            assert got[gv] == pytest.approx(float(exp), rel=1e-9), (meas, gv)
    cb.unpersist()

    # poisson mse on the exp-link response
    dfp = li.withColumn("cnt", F.round("l_quantity").cast("double"))
    cp = fit_grouped(dfp, ["l_discount"], "cnt", "poisson", ["l_linestatus"],
                     n_sigma=2, lambda_min_ratio=0.5, order_col="_rid").cache()
    got = {r["l_linestatus"]: r["value"] for r in score_grouped(
        dfp, cp, ["l_discount"], "cnt", ["l_linestatus"],
        family="poisson", measure="mse").collect()}
    pp = predict_grouped(
        dfp, cp, ["l_discount"], ["l_linestatus"], family="poisson",
        type="response", out="mu",
    ).select("l_linestatus", "cnt", "mu").toPandas()
    for gv, grp in pp.groupby("l_linestatus"):
        err = grp["cnt"].to_numpy() - grp["mu"].to_numpy()
        assert got[gv] == pytest.approx(float((err * err).mean()), rel=1e-9)
    cp.unpersist()

    # multinomial mse (per-class mean over the simplex)
    cm = fit_grouped(li, FEATS, "l_returnflag", "multinomial",
                     ["l_linestatus"], n_sigma=2, lambda_min_ratio=0.3,
                     order_col="_rid").cache()
    classes = sorted(r[0] for r in
                     li.select("l_returnflag").distinct().collect())
    got = {r["l_linestatus"]: r["value"] for r in score_grouped(
        li, cm, FEATS, "l_returnflag", ["l_linestatus"],
        family="multinomial", measure="mse").collect()}
    pm = predict_grouped(
        li, cm, FEATS, ["l_linestatus"], family="multinomial",
        type="response", out="probs",
    ).select("l_linestatus", "l_returnflag", "probs").toPandas()
    for gv, grp in pm.groupby("l_linestatus"):
        P = np.vstack(grp["probs"].to_numpy())
        yidx = np.searchsorted(classes, grp["l_returnflag"].to_numpy())
        onehot = np.zeros_like(P)
        onehot[np.arange(len(P)), yidx] = 1.0
        exp = (((onehot - P) ** 2).sum(axis=1) / len(classes)).mean()
        assert got[gv] == pytest.approx(float(exp), rel=1e-9), gv
    cm.unpersist()


def test_cv_fit_grouped_auc_and_poisson(spark, li):
    """cv_fit_grouped's extended measure grid: per-fold AUC equals the
    independent distributed rank AUC (ops.score.auc) on the same fold
    predictions, and poisson mse CV runs the exp-link response."""
    from prague_spark import cv_fit_grouped
    from prague_spark.core.ref_fit import numpy_path_fit
    from prague_spark.ops.score import auc as dist_auc

    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    out = cv_fit_grouped(
        df, FEATS, "big", "binomial", ["l_linestatus"],
        fold_col="l_orderkey", order_col="_rid", measure="auc",
        n_folds=3, n_sigma=2, lambda_min_ratio=0.3,
    ).collect()
    gv = sorted({r["l_linestatus"] for r in out})[0]
    pdf = df.filter(F.col("l_linestatus") == gv).toPandas().sort_values(
        "_rid", kind="mergesort")
    X = pdf[FEATS].to_numpy(dtype=np.float64)
    ys = pdf["big"].astype(str).to_numpy()
    folds = pdf["l_orderkey"].to_numpy().astype(np.int64) % 3
    full = numpy_path_fit(X, ys, "binomial", n_sigma=2, lambda_min_ratio=0.3)
    sig = full["sigma"]
    scores = np.empty((3, len(sig)))
    for f in range(3):
        tr = folds != f
        fit = numpy_path_fit(X[tr], ys[tr], "binomial", sigma=sig)
        for si in range(len(sig)):
            B = fit["betas"][si]
            p1 = 1.0 / (1.0 + np.exp(-(B[0, 0] + X[~tr] @ B[1:, 0])))
            y2 = (ys[~tr] == "lo").astype(float)
            hold = spark.createDataFrame(
                [(float(a), float(b)) for a, b in zip(p1, y2)],
                "p double, y2 double",
            )
            scores[f, si] = dist_auc(hold, "p", F.col("y2"))
    got = {r["sigma_idx"]: r["mean"] for r in out if r["l_linestatus"] == gv}
    for si in range(len(sig)):
        assert got[si] == pytest.approx(float(scores[:, si].mean()), rel=1e-9)
    # auc is higher-is-better: is_optimum must mark each group's MAX
    # (direction-aware, unlike the reference's which.min quirk)
    for g in {r["l_linestatus"] for r in out}:
        rows_g = [r for r in out if r["l_linestatus"] == g]
        opt = [r for r in rows_g if r["is_optimum"]]
        assert len(opt) == 1
        assert opt[0]["mean"] == max(r["mean"] for r in rows_g)

    # poisson CV on the exp-link response runs and orders sanely
    dfp = li.withColumn("cnt", F.round("l_quantity").cast("double"))
    outp = cv_fit_grouped(
        dfp, ["l_discount"], "cnt", "poisson", ["l_linestatus"],
        fold_col="l_orderkey", order_col="_rid", measure="mse",
        n_folds=3, n_sigma=2, lambda_min_ratio=0.5,
    ).collect()
    assert outp and all(r["mean"] > 0 for r in outp)
    assert sum(1 for r in outp if r["is_optimum"]) == len(
        {r["l_linestatus"] for r in outp})
    with pytest.raises(ValueError, match="needs family"):
        cv_fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                       ["l_linestatus"], fold_col="l_orderkey",
                       measure="auc", n_sigma=2)


def test_score_grouped_auc(spark, li):
    """Per-segment AUC: each group's value equals the already-oracled
    global rank AUC (ops.score.auc) computed on that group's rows alone,
    and a single-class segment returns NULL instead of dividing by
    zero."""
    from prague_spark import predict_grouped, score_grouped
    from prague_spark.ops.score import auc, auc_grouped

    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    cb = fit_grouped(
        df, FEATS, "big", "binomial", ["l_linestatus"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()
    got = {
        r["l_linestatus"]: (r["value"], r["n"])
        for r in score_grouped(
            df, cb, FEATS, "big", ["l_linestatus"],
            family="binomial", measure="auc",
        ).collect()
    }
    pred = predict_grouped(
        df, cb, FEATS, ["l_linestatus"], family="binomial",
        type="response", out="_mu",
    ).cache()
    # positive class = the LAST sorted label ('lo'), the same coding
    # _mu is the response probability of
    y2 = F.when(F.col("big") == "lo", 1.0).otherwise(0.0)
    for gv in got:
        one = pred.filter(F.col("l_linestatus") == gv)
        exp = auc(one.select(F.col("_mu").alias("p"), y2.alias("y2")),
                  "p", F.col("y2"))
        assert got[gv][0] == pytest.approx(exp, rel=1e-12), gv
        assert got[gv][1] == one.count()
    pred.unpersist()
    # single-class group -> NULL auc (undefined), loud nowhere
    const = spark.createDataFrame(
        [("g1", 0.3, 1.0), ("g1", 0.7, 1.0), ("g2", 0.2, 0.0)],
        "g string, p double, y2 double",
    )
    rows = {r["g"]: r["auc"] for r in
            auc_grouped(const, "p", F.col("y2"), ["g"]).collect()}
    assert rows["g1"] is None and rows["g2"] is None
    # weighted variant degenerates to unweighted at w=1
    w1 = const.withColumn("w", F.lit(1.0))
    a = auc_grouped(w1, "p", F.col("y2"), ["g"], weight_col="w").collect()
    b = auc_grouped(const, "p", F.col("y2"), ["g"]).collect()
    assert {r["g"]: r["auc"] for r in a} == {r["g"]: r["auc"] for r in b}
    cb.unpersist()


def test_predict_at_per_group_cv_optimum(spark, li):
    """The fit -> CV -> predict loop per segment: cv_optimum_path turns
    grouped-CV optima into a per-group path selection, and
    predict_grouped scores each segment at its OWN chosen point — equal
    to the driver recompute from that group's coefficients at exactly
    that path index."""
    from prague_spark import (
        cv_fit_grouped, cv_optimum_path, predict_grouped,
    )

    kw = dict(n_sigma=4, lambda_min_ratio=0.1)
    coefs = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        order_col="_rid", **kw,
    ).cache()
    cv = cv_fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        fold_col="l_orderkey", order_col="_rid", measure="mse", n_folds=3,
        **kw,
    )
    sel = cv_optimum_path(cv, ["l_returnflag"]).cache()
    opt = {r["l_returnflag"]: r["path_idx"] for r in sel.collect()}
    assert len(opt) == 3 and all(0 <= k < 4 for k in opt.values())
    pred = predict_grouped(
        li, coefs, FEATS, ["l_returnflag"], family="gaussian",
        type="link", path_idx=sel, out="lp",
    )
    crows = coefs.collect()
    beta = {
        (r["l_returnflag"], r["feature"]): r["beta"]
        for r in crows if r["path_idx"] == opt[r["l_returnflag"]]
    }
    for r in pred.select("l_returnflag", *FEATS, "lp").limit(300).collect():
        g = r["l_returnflag"]
        exp = beta.get((g, INTERCEPT), 0.0) + sum(
            beta.get((g, f), 0.0) * float(r[f]) for f in FEATS
        )
        assert r["lp"] == pytest.approx(exp, rel=1e-12), g
    # a malformed selection frame fails loud
    with pytest.raises(ValueError, match="path selection"):
        predict_grouped(li, coefs, FEATS, ["l_returnflag"],
                        path_idx=sel.select("path_idx"))
    sel.unpersist()
    coefs.unpersist()


def test_fit_grouped_errors(spark, li):
    # single-class binomial group fails loud, naming the group
    df = li.withColumn("const", F.lit("same"))
    with pytest.raises(Exception, match="exactly two classes"):
        fit_grouped(df, FEATS, "const", "binomial", ["l_returnflag"],
                    n_sigma=2).collect()
    # group size guard
    with pytest.raises(Exception, match="max_group_rows"):
        fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                    ["l_returnflag"], n_sigma=2, max_group_rows=10).collect()
    # group cols must not overlap the design
    with pytest.raises(ValueError, match="overlap"):
        fit_grouped(li, FEATS, "l_extendedprice", "gaussian", ["l_quantity"])
    with pytest.raises(ValueError, match="non-empty"):
        fit_grouped(li, FEATS, "l_extendedprice", "gaussian", [])


def test_save_load_grouped_roundtrip(spark, li, tmp_path):
    """Grouped model sink: save/load round-trips the coefficient frame
    byte-exactly (classes column included), restored models score
    identically, and schema validation fails loud on wrong frames."""
    from prague_spark import load_grouped, predict_grouped, save_grouped

    df = li.withColumn(
        "big", F.when(F.col("l_extendedprice") > 30000.0, "hi").otherwise("lo")
    )
    cb = fit_grouped(df, FEATS, "big", "binomial", ["l_returnflag"],
                     n_sigma=3, lambda_min_ratio=0.1, order_col="_rid")
    path = str(tmp_path / "grouped_model")
    save_grouped(cb, path)
    back = load_grouped(spark, path, ["l_returnflag"])
    key = lambda r: (r["l_returnflag"], r["path_idx"], r["feature"], r["cls"])
    a = {key(r): (r["beta"], r["sigma"], tuple(r["classes"])) for r in cb.collect()}
    b = {key(r): (r["beta"], r["sigma"], tuple(r["classes"])) for r in back.collect()}
    assert a == b
    p1 = predict_grouped(df, cb, FEATS, ["l_returnflag"],
                         family="binomial", type="response", out="p")
    p2 = predict_grouped(df, back, FEATS, ["l_returnflag"],
                         family="binomial", type="response", out="p")
    k = ["l_orderkey", "l_linenumber"]
    g1 = {tuple(r[c] for c in k): r["p"] for r in p1.select(*k, "p").collect()}
    g2 = {tuple(r[c] for c in k): r["p"] for r in p2.select(*k, "p").collect()}
    assert g1 == g2
    with pytest.raises(ValueError, match="missing columns"):
        save_grouped(li, str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="missing columns"):
        load_grouped(spark, path, ["no_such_group_col"])
    # resave to the SAME path must not destroy the model mid-write
    save_grouped(back, path)
    again = load_grouped(spark, path, ["l_returnflag"])
    assert {key(r): r["beta"] for r in again.collect()} == {
        k: v[0] for k, v in a.items()
    }
    # loading a multi-key model with a PARTIAL segmentation key is the
    # silent-garbage case (betas would pivot across the dropped key's
    # models) — rejected loud
    c2 = fit_grouped(df, FEATS, "big", "binomial",
                     ["l_returnflag", "l_linestatus"],
                     n_sigma=2, lambda_min_ratio=0.3, order_col="_rid")
    p2path = str(tmp_path / "grouped_model2")
    save_grouped(c2, p2path)
    with pytest.raises(ValueError, match="FULL segmentation key"):
        load_grouped(spark, p2path, ["l_returnflag"])
    load_grouped(spark, p2path, ["l_returnflag", "l_linestatus"])


def test_cap_group_rows(spark, li):
    """Upstream whale-segment guard: oversized groups downsample to
    ~max_rows by a deterministic hash threshold BEFORE the grouped solve
    materializes them; groups under the cap pass through byte-identical,
    reruns reproduce the exact surviving set, and the capped frame fits
    where the raw one fails loud."""
    from prague_spark import cap_group_rows

    # l_returnflag groups are ~2k rows each at sf0.001
    sizes = {r["l_returnflag"]: r["n"] for r in li.groupBy("l_returnflag")
             .agg(F.count("*").alias("n")).collect()}
    big = max(sizes.values())
    cap = 500
    keys = ["l_orderkey", "l_linenumber"]
    out = cap_group_rows(li, ["l_returnflag"], cap, keys).cache()
    got = {r["l_returnflag"]: r["n"] for r in out.groupBy("l_returnflag")
           .agg(F.count("*").alias("n")).collect()}
    for g, n in got.items():
        # binomial concentration around the cap (sd ~ sqrt(cap) ~ 22)
        assert n <= cap + 120 and n >= cap - 120, (g, n)
    # determinism: the exact same rows survive a rerun
    a = {tuple(r) for r in out.select(*keys).collect()}
    b = {tuple(r) for r in
         cap_group_rows(li, ["l_returnflag"], cap, keys).select(*keys).collect()}
    assert a == b
    # a different seed deals a different (but same-sized-ish) hand
    c = {tuple(r) for r in
         cap_group_rows(li, ["l_returnflag"], cap, keys, seed=7)
         .select(*keys).collect()}
    assert c != a
    # groups under the cap are untouched
    untouched = cap_group_rows(li, ["l_returnflag"], big + 1, keys)
    assert untouched.count() == li.count()
    # composition: the whale fails the grouped fit raw, passes capped
    with pytest.raises(Exception, match="max_group_rows"):
        fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                    ["l_returnflag"], n_sigma=2, lambda_min_ratio=0.5,
                    max_group_rows=cap + 200).collect()
    fit_grouped(out, FEATS, "l_extendedprice", "gaussian",
                ["l_returnflag"], n_sigma=2, lambda_min_ratio=0.5,
                max_group_rows=cap + 200).collect()
    out.unpersist()
    with pytest.raises(ValueError, match="key_cols"):
        cap_group_rows(li, ["l_returnflag"], cap, [])
    with pytest.raises(ValueError, match="max_rows"):
        cap_group_rows(li, ["l_returnflag"], 0, keys)
    # NULL/delimiter key patterns hash DISTINCTLY (per-column md5): the
    # four rows below would collide pairwise under a naive ':' concat
    tricky = spark.createDataFrame(
        [("g", None, "x", i) for i in range(2)]
        + [("g", "x", None, i) for i in range(2, 4)]
        + [("g", "a:1", "2", i) for i in range(4, 6)]
        + [("g", "a", "1:2", i) for i in range(6, 8)],
        "g string, k1 string, k2 string, i int",
    )
    from prague_spark.pipeline.sample import _hash_unit_expr

    parts = [
        F.md5(F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00")))
        for c in ("k1", "k2")
    ]
    us = tricky.select(_hash_unit_expr(*parts, F.lit(42)).alias("u")) \
        .distinct().count()
    assert us == 4  # four distinct key patterns -> four distinct hashes


def test_cap_group_rows_exact_and_null_keys(spark, li):
    """exact=True guarantees <= max_rows per group (ONE row_number
    window over the same md5 hash order, deterministic), so composing
    cap_group_rows(N, exact=True) -> fit_grouped(max_group_rows=N) can
    NEVER fail — the expectation mode's binomial wobble is gone. And a
    NULL-keyed whale group is capped like any other (the keep-fraction
    join is NULL-safe)."""
    from prague_spark import cap_group_rows, fit_grouped

    cap = 500
    keys = ["l_orderkey", "l_linenumber"]
    out = cap_group_rows(li, ["l_returnflag"], cap, keys, exact=True).cache()
    got = {r["l_returnflag"]: r["n"] for r in out.groupBy("l_returnflag")
           .agg(F.count("*").alias("n")).collect()}
    for g, n in got.items():
        assert n == cap, (g, n)  # whales land EXACTLY at the cap
    # deterministic: rerun keeps the identical surviving set
    a = {tuple(r) for r in out.select("l_returnflag", *keys).collect()}
    b = {tuple(r) for r in
         cap_group_rows(li, ["l_returnflag"], cap, keys, exact=True)
         .select("l_returnflag", *keys).collect()}
    assert a == b
    # exact-mode survivors are the LOWEST-hash rows — a strict subset
    # ordering vs the expectation mode is not required, but composing
    # with an equal hard limit must never raise
    fit_grouped(out, FEATS, "l_extendedprice", "gaussian",
                ["l_returnflag"], n_sigma=2, lambda_min_ratio=0.5,
                max_group_rows=cap).collect()
    out.unpersist()

    # NULL group key: the whale group keyed by NULL is capped too
    # (expectation mode's broadcast join is eqNullSafe); before the fix
    # it silently bypassed the cap entirely
    rows = [(None if i % 2 == 0 else "g", i) for i in range(4000)]
    df = spark.createDataFrame(rows, "seg string, k int")
    capped = cap_group_rows(df, ["seg"], 300, ["k"])
    by_seg = {r["seg"]: r["n"] for r in capped.groupBy("seg")
              .agg(F.count("*").alias("n")).collect()}
    assert by_seg["g"] <= 450 and by_seg["g"] >= 150
    assert by_seg[None] <= 450 and by_seg[None] >= 150, (
        "NULL-keyed group bypassed the cap"
    )
    exact_null = cap_group_rows(df, ["seg"], 300, ["k"], exact=True)
    ns = {r["seg"]: r["n"] for r in exact_null.groupBy("seg")
          .agg(F.count("*").alias("n")).collect()}
    assert ns == {None: 300, "g": 300}


def test_slice_path_selection_fails_loud_on_unmatched(spark, li):
    """A per-group path selection naming a path_idx the group's
    coefficient frame never reached (e.g. CV run with different penalty
    params) raises naming the segment — before, the inner join silently
    dropped it and every row scored NULL."""
    from prague_spark.ops.grouped import predict_grouped

    coefs = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1,
    ).cache()
    groups = [r[0] for r in coefs.select("l_returnflag").distinct().collect()]
    # a selection that points one segment at a nonexistent path point
    sel = spark.createDataFrame(
        [(g, 1) for g in groups[:-1]] + [(groups[-1], 99)],
        "l_returnflag string, path_idx int",
    )
    with pytest.raises(ValueError, match="matched no coefficient rows"):
        predict_grouped(li, coefs, FEATS, ["l_returnflag"],
                        path_idx=sel).collect()
    # a selection with TWO path points for one group is rejected (the
    # inner join would keep both and the max-pivot would silently merge
    # two models elementwise)
    dup = spark.createDataFrame(
        [(groups[0], 0), (groups[0], 1)] + [(g, 1) for g in groups[1:]],
        "l_returnflag string, path_idx int",
    )
    with pytest.raises(ValueError, match="MULTIPLE path_idx"):
        predict_grouped(li, coefs, FEATS, ["l_returnflag"],
                        path_idx=dup).collect()
    # a fully valid selection still works
    ok = spark.createDataFrame(
        [(g, 1) for g in groups], "l_returnflag string, path_idx int"
    )
    assert predict_grouped(
        li, coefs, FEATS, ["l_returnflag"], path_idx=ok
    ).filter(F.col("pred").isNull()).count() == 0
    coefs.unpersist()


def test_predict_grouped_null_keyed_segment(spark):
    """A NULL-keyed segment is a real segment: fit_grouped models it,
    the per-group path selection matches it (NULL-safe join), and
    predict_grouped scores its rows with its own model instead of NULL
    — end to end, gaussian and multinomial."""
    from prague_spark import fit_grouped
    from prague_spark.ops.grouped import predict_grouped

    rows = [
        (None if i % 2 else "g", float(i % 13), float(i % 7),
         float(i % 17), ["a", "b", "c"][i % 3])
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "seg string, x1 double, x2 double, y double, cls3 string"
    )
    coefs = fit_grouped(df, ["x1", "x2"], "y", "gaussian", ["seg"],
                        n_sigma=2, lambda_min_ratio=0.5)
    sel = spark.createDataFrame(
        [(None, 1), ("g", 1)], "seg string, path_idx int"
    )
    out = predict_grouped(df, coefs, ["x1", "x2"], ["seg"], path_idx=sel)
    assert out.filter(F.col("pred").isNull()).count() == 0
    # and without a selection frame (deepest point), same property
    out2 = predict_grouped(df, coefs, ["x1", "x2"], ["seg"])
    assert out2.filter(F.col("pred").isNull()).count() == 0
    # multinomial path goes through its own pivoted join
    cm = fit_grouped(df, ["x1", "x2"], "cls3", "multinomial", ["seg"],
                     n_sigma=2, lambda_min_ratio=0.5)
    om = predict_grouped(df, cm, ["x1", "x2"], ["seg"],
                         family="multinomial", type="class")
    assert om.filter(F.col("pred").isNull()).count() == 0


def test_predict_grouped_internal_columns_no_collision(spark, li):
    """User columns named like the scorer's internals (_has_model,
    _beta_0) survive scoring untouched — the internal join columns are
    suffixed with the output name."""
    from prague_spark.ops.grouped import predict_grouped

    coefs = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=2, lambda_min_ratio=0.5,
    )
    df = li.withColumn("_has_model", F.lit("mine")).withColumn(
        "_beta_0", F.lit(123.0)
    )
    out = predict_grouped(df, coefs, FEATS, ["l_returnflag"], out="pred")
    row = out.select("_has_model", "_beta_0", "pred").first()
    assert row["_has_model"] == "mine"
    assert row["_beta_0"] == 123.0
    assert row["pred"] is not None


def test_fit_grouped_plan_shape(spark, li):
    # ONE shuffle (the groupBy), ONE python stage (the per-group solve)
    a = audit(fit_grouped(li, FEATS, "l_extendedprice", "gaussian",
                          ["l_returnflag"], n_sigma=2))
    assert a.shuffles == 1
    assert a.py_stages == 1
    assert a.nested_loops == 0 and a.cartesians == 0


def test_cap_group_rows_exact_prefilter_same_result(spark, li):
    """exact=True with the skew prefilter keeps the SAME rows as the
    plain exact window (the window keeps the lowest-hash rows; the
    prefilter keeps a hash-prefix superset), still exactly max_rows
    per over-cap group — the whale group just arrives at the sort
    already near the cap."""
    from prague_spark import cap_group_rows

    cap = 400
    keys = ["l_orderkey", "l_linenumber"]
    plain = {
        tuple(r)
        for r in cap_group_rows(li, ["l_returnflag"], cap, keys, exact=True)
        .select("l_returnflag", *keys).collect()
    }
    pre = {
        tuple(r)
        for r in cap_group_rows(
            li, ["l_returnflag"], cap, keys, exact=True, prefilter=True
        ).select("l_returnflag", *keys).collect()
    }
    assert pre == plain
    with pytest.raises(ValueError, match="prefilter_margin"):
        cap_group_rows(li, ["l_returnflag"], cap, keys, exact=True,
                       prefilter=True, prefilter_margin=0.5)


def test_slice_path_selection_executes_coefs_once(spark, li):
    """predict_grouped(path_idx=<selection frame>) materializes the
    model-sized coefficient frame ONCE: validation and scoring share the
    collected rows, so an UNPERSISTED applyInPandas fit is not paid
    twice (before round 10, validation ran the fit and the scoring
    action ran it again)."""
    from prague_spark import fit_grouped
    from prague_spark.ops.grouped import predict_grouped

    coefs = fit_grouped(
        li, FEATS, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1,
    )  # deliberately NOT cached
    _DF = type(coefs)  # the CONCRETE DataFrame class (Spark 4 facade split)
    groups = [r[0] for r in coefs.select("l_returnflag").distinct().collect()]
    sel = spark.createDataFrame(
        [(g, 1) for g in groups], "l_returnflag string, path_idx int"
    )
    calls = {"n": 0}
    orig = _DF.collect

    def counting_collect(self):
        if "beta" in self.columns:  # the coefficient lineage
            calls["n"] += 1
        return orig(self)

    _DF.collect = counting_collect
    try:
        out = predict_grouped(li, coefs, FEATS, ["l_returnflag"],
                              path_idx=sel)
        assert out.filter(F.col("pred").isNull()).count() == 0
    finally:
        _DF.collect = orig
    # exactly one collect of a beta-carrying frame (the _slice_path
    # materialization); the scoring action pivots the LOCAL rebuild
    assert calls["n"] == 1


def test_grouped_multinomial_score_plan_stays_linear_in_classes(spark, li):
    """The staged softmax's scale contract for GROUPED scoring (the
    round-13 verdict ask, twin of the dense-predict pin in test_fit):
    score_grouped at m=40 keeps a bounded-shuffle all-JVM plan whose
    optimized-plan SIZE grows linearly in m — the inlined form's
    ~(m+1)^2 duplication would show a ~16x size jump from m=10 to m=40
    where the staged form stays ~4x."""
    from prague_spark.ops.grouped import score_grouped
    from prague_spark.plan_audit import assert_scale_shape

    rng = np.random.default_rng(13)
    names = [INTERCEPT] + FEATS
    groups = ["O", "F"]

    def score_frame(m):
        rows = [
            (g, 0, t, nm, float(rng.normal(scale=0.1)))
            for g in groups for t in range(m - 1) for nm in names
        ]
        coefs = spark.createDataFrame(
            rows,
            "l_linestatus string, path_idx int, cls int, feature string, "
            "beta double",
        )
        return score_grouped(
            li, coefs, FEATS, "l_returnflag", ["l_linestatus"],
            family="multinomial", measure="deviance", path_idx=0,
            classes=[f"c{i}" for i in range(m)],
        )

    wide = score_frame(40)
    # 2 shuffles: the coef flat-pivot agg + the per-group score agg (the
    # data-side join stays broadcast)
    assert_scale_shape(wide, max_shuffles=2, max_py_stages=0)
    narrow = score_frame(10)
    w = len(wide._jdf.queryExecution().optimizedPlan().toString())
    n = len(narrow._jdf.queryExecution().optimizedPlan().toString())
    assert w / n < 8.0, (w, n)
    got = {r["l_linestatus"]: r for r in wide.collect()}
    # labels never match the synthetic c* classes -> p_true floors at
    # 1e-12 -> deviance = -2 log(1e-12) exactly; n covers every row
    for g in groups:
        assert got[g]["value"] == pytest.approx(-2.0 * np.log(1e-12))
    assert sum(r["n"] for r in got.values()) == li.count()
