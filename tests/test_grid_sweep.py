"""SURVEY §5 pattern-2 grid sweep (the reference's test-gaussian.R:19-36 /
test-screening-rules.R idea): tall, wide (n < p), and sparse-design random
problems; screening on == screening off; wide fits run through the same
Gram/ADMM machinery (the reference's Woodbury regime)."""

import numpy as np
import pytest

import prague_spark as ps
from prague_spark.ops.synth import random_problem

# slow: dozens of full path fits across problem shapes — deselect with -m 'not slow' for the
# mid-round loop; the full suite gates commit milestones
pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "n,p,density,rho",
    [
        (2000, 20, 1.0, 0.0),
        (300, 60, 1.0, 0.0),
        (1000, 40, 0.5, 0.0),
        # equicorrelated design (the regime SLOPE's coefficient clustering
        # targets): screening invariance must hold under correlation too
        (1500, 30, 1.0, 0.6),
    ],
    ids=["tall", "wide_n_lt_p", "sparse_design", "correlated"],
)
def test_grid_screening_invariance(spark, n, p, density, rho):
    df, beta = random_problem(spark, n=n, p=p, family="gaussian",
                              density=density, seed=11, rho=rho)
    feats = [f"x{j}" for j in range(1, p + 1)]
    kw = dict(n_sigma=6, lambda_min_ratio=0.05, diagnostics=True)  # staged path (screening lives there)
    m_on = ps.fit(df, feats, "y", "gaussian", screening=True, **kw)
    m_off = ps.fit(df, feats, "y", "gaussian", screening=False, **kw)
    assert m_on.n_path == m_off.n_path
    # agreement to solver tolerance: ADMM stops at ~1e-4 absolute, so
    # near-zero coefficients may flip between 0 and O(1e-5)
    np.testing.assert_allclose(m_on.betas, m_off.betas, rtol=5e-3, atol=2e-4)
    # regularized fit should recover a superset-ish of the planted support:
    # at the end of the path the largest-magnitude coefs align with beta
    last = m_on.betas[-1, 1:, 0]
    planted = np.flatnonzero(beta != 0)
    if len(planted):
        top = np.argsort(-np.abs(last))[: max(len(planted), 1)]
        overlap = len(set(top.tolist()) & set(planted.tolist())) / len(planted)
        assert overlap >= 0.5
