"""Unregularized-limit oracle tests for the iterative families.

The reference's dominant oracle pattern (``tests/testthat/test-binomial.R:1-25``,
``test-poisson.R:1-27``, ``test-multinomial.R`` in jolars/prague): a SLOPE fit
with sigma -> 0 must agree with the family's maximum-likelihood fit. The
oracle here is a closed-loop NumPy IRLS (Newton) reference implementation —
no external ML library needed.

The binomial case additionally runs through the DISTRIBUTED prox-Newton
solver (solver="spark"), closing the loop on the scale path too.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import prague_spark as ps

FEATURES = ["l_quantity", "l_discount", "l_tax"]
SIGMA0 = np.array([1e-7])


def _design(pdf, features):
    X = pdf[list(features)].to_numpy(dtype=np.float64)
    return np.hstack([np.ones((len(X), 1)), X])


def _irls_logistic(X, y01, iters=100, tol=1e-12):
    b = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ b)))
        W = p * (1.0 - p)
        g = X.T @ (y01 - p)
        H = (X * W[:, np.newaxis]).T @ X
        step = np.linalg.solve(H, g)
        b = b + step
        if np.abs(step).max() < tol:
            break
    return b


def _irls_poisson(X, y, iters=100, tol=1e-12):
    b = np.zeros(X.shape[1])
    b[0] = np.log(max(y.mean(), 1e-12))  # start at the null model
    for _ in range(iters):
        mu = np.exp(X @ b)
        g = X.T @ (y - mu)
        H = (X * mu[:, np.newaxis]).T @ X
        step = np.linalg.solve(H, g)
        b = b + step
        if np.abs(step).max() < tol:
            break
    return b


def _irls_multinomial(X, Y, iters=200, tol=1e-12):
    """Newton on the (m-1)-target softmax with the last class as reference
    (the reference's parameterization, src/families/multinomial.h)."""
    n, p = X.shape
    m = Y.shape[1]
    B = np.zeros((p, m))
    for _ in range(iters):
        lp = X @ B
        lp_full = np.hstack([lp, np.zeros((n, 1))])
        lp_full -= lp_full.max(axis=1, keepdims=True)
        e = np.exp(lp_full)
        P = (e / e.sum(axis=1, keepdims=True))[:, :m]
        g = (X.T @ (Y - P)).ravel(order="F")
        H = np.empty((p * m, p * m))
        for k in range(m):
            for l in range(m):
                w = P[:, k] * ((1.0 if k == l else 0.0) - P[:, l])
                H[k * p : (k + 1) * p, l * p : (l + 1) * p] = (
                    (X * w[:, np.newaxis]).T @ X
                )
        step = np.linalg.solve(H + 1e-10 * np.eye(p * m), g)
        B = B + step.reshape((p, m), order="F")
        if np.abs(step).max() < tol:
            break
    return B


@pytest.fixture(scope="module")
def li_small(lineitem):
    return lineitem.limit(1200).cache()


@pytest.mark.parametrize("solver", ["incore", "spark"])
def test_binomial_sigma0_matches_irls(li_small, solver):
    df = li_small.withColumn(
        "flag", F.when(F.col("l_returnflag") == "R", "ret").otherwise("ok")
    )
    m = ps.fit(df, FEATURES, "flag", "binomial", sigma=SIGMA0, solver=solver)
    pdf = df.select(*FEATURES, "flag").toPandas()
    X = _design(pdf, FEATURES)
    y01 = (pdf["flag"] == "ret").to_numpy(dtype=np.float64)  # class 2 ('ret')
    b_ref = _irls_logistic(X, y01)
    b_fit = m.betas[0, :, 0]
    np.testing.assert_allclose(b_fit, b_ref, rtol=1e-3, atol=1e-4)


def test_poisson_sigma0_matches_irls(li_small):
    df = li_small.withColumn("cnt", F.round("l_quantity").cast("double"))
    m = ps.fit(df, ["l_discount", "l_tax"], "cnt", "poisson", sigma=SIGMA0)
    pdf = df.select("l_discount", "l_tax", "cnt").toPandas()
    X = _design(pdf, ["l_discount", "l_tax"])
    b_ref = _irls_poisson(X, pdf["cnt"].to_numpy(dtype=np.float64))
    b_fit = m.betas[0, :, 0]
    np.testing.assert_allclose(b_fit, b_ref, rtol=1e-3, atol=1e-4)


def test_multinomial_sigma0_matches_irls(li_small):
    feats = ["l_quantity", "l_discount"]
    m = ps.fit(li_small, feats, "l_returnflag", "multinomial", sigma=SIGMA0)
    pdf = li_small.select(*feats, "l_returnflag").toPandas()
    X = _design(pdf, feats)
    classes = sorted(pdf["l_returnflag"].unique())
    Y = np.stack(
        [(pdf["l_returnflag"] == c).to_numpy(dtype=np.float64) for c in classes[:-1]],
        axis=1,
    )
    B_ref = _irls_multinomial(X, Y)
    B_fit = m.betas[0]
    np.testing.assert_allclose(B_fit, B_ref, rtol=2e-3, atol=2e-4)


def test_gaussian_sigma0_matches_ols_spark_design(li_small):
    """sigma -> 0 gaussian through the distributed prox-Newton path too."""
    m = ps.fit(
        li_small, FEATURES, "l_extendedprice", "gaussian",
        sigma=SIGMA0, solver="spark",
    )
    pdf = li_small.select(*FEATURES, "l_extendedprice").toPandas()
    X = _design(pdf, FEATURES)
    y = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
    b_ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    np.testing.assert_allclose(m.betas[0, :, 0], b_ref, rtol=1e-4, atol=1e-5)
