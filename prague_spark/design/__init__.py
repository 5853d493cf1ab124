"""Design-matrix abstractions the solvers run against.

Three interchangeable implementations of the same three-method interface
(``eval``, ``primal``, ``subset``); the FISTA/ADMM code in
``prague_spark.core.solver`` is agnostic to which one it gets:

- :class:`LocalDesign` — in-core NumPy, used when the (standardized)
  design fits comfortably on the driver. This is the reference's own
  regime (its largest problem is 1000 x 500) and the fast path for CV.
- :class:`GramGaussianDesign` — gaussian only: built from ONE distributed
  pass (``gram_xty_pass``); every solver evaluation afterwards is
  driver-side O(p^2) with no data passes. The scale architecture for
  least-squares SLOPE at 100 TB.
- :class:`SparkGlmDesign` — binomial/poisson/multinomial: each evaluation
  is one fused Arrow-batched scan of the cached feature DataFrame
  producing [primal, dual, X^T grad] partials per partition (the MLlib
  cost-aggregator shape).

Column pruning for active-set fits (the Spark analogue of the reference's
``matrixSubset``, ``src/utils.h:7-25``) happens inside the Arrow batch:
the scan still reads the cached vector column, but all linear algebra is
restricted to the active indices.
"""

from __future__ import annotations

import numpy as np

from ..core.families import Family
from ..core.solver import GramData
from .linalg import _batch_xy, gram_xty_pass, partial_aggregate, xtv_pass

__all__ = [
    "LocalDesign",
    "GramGaussianDesign",
    "SparkGlmDesign",
    "GramData",
    "gram_xty_pass",
    "xtv_pass",
]


class LocalDesign:
    """In-core design: X (n, p) and Y (n, m) NumPy arrays."""

    def __init__(self, X: np.ndarray, Y: np.ndarray, family: Family):
        self.X = np.asarray(X, dtype=np.float64)
        Y = np.asarray(Y, dtype=np.float64)
        self.Y = Y[:, np.newaxis] if Y.ndim == 1 else Y
        self.family = family
        self.n, self.p = self.X.shape
        self.m = self.Y.shape[1]

    def eval(self, beta):
        lin_pred = self.X @ beta
        g = self.family.primal(self.Y, lin_pred)
        G = self.family.dual(self.Y, lin_pred)
        grad = self.X.T @ self.family.pseudo_gradient(self.Y, lin_pred)
        return g, G, grad

    def primal(self, beta):
        return self.family.primal(self.Y, self.X @ beta)

    def full_gradient(self, beta):
        lin_pred = self.X @ beta
        return self.X.T @ self.family.pseudo_gradient(self.Y, lin_pred)

    def eval_hessian(self, beta):
        """(primal, dual, gradient, Hessian) at beta — the prox-Newton
        outer-iteration bundle. Hessian is (p*m, p*m) in F-ravel order."""
        lin_pred = self.X @ beta
        g = self.family.primal(self.Y, lin_pred)
        G = self.family.dual(self.Y, lin_pred)
        grad = self.X.T @ self.family.pseudo_gradient(self.Y, lin_pred)
        W = self.family.hessian_weights(self.Y, lin_pred)
        H = _weighted_gram(self.X, W if W.ndim > 1 else W[:, np.newaxis],
                           self.m, multinomial=self.family.name == "multinomial")
        return g, G, grad, H

    def subset(self, idx):
        return LocalDesign(self.X[:, np.asarray(idx)], self.Y, self.family)

    def gram(self) -> GramData:
        # from_xy picks the reference's Woodbury / kernel route when the
        # design is wide (p > n): the n x n eigenfactorization replaces
        # the p x p one (src/families/gaussian.h:88-93, owl.cpp:183-187)
        return GramData.from_xy(self.X, self.Y)


class GramGaussianDesign:
    """Gaussian design expressed purely through sufficient statistics.

    primal(b) = 0.5 (y'y - 2 b'X'y + b'Gb);  dual(b) = 0.5 y'y - 0.5 b'Gb;
    gradient(b) = Gb - X'y — identical to the reference's gaussian family
    (``src/families/gaussian.h:21-45``) evaluated without touching the data.
    """

    def __init__(self, gram_data: GramData, m: int = 1):
        self.g = gram_data
        self.n = gram_data.n
        self.p = gram_data.p
        self.m = 1

    def eval(self, beta):
        b = np.ravel(beta)
        gb = self.g.matvec(b)
        btgb = float(b @ gb)
        bxty = float(b @ self.g.xty)
        primal = 0.5 * (self.g.yty - 2.0 * bxty + btgb)
        dual = 0.5 * self.g.yty - 0.5 * btgb
        grad = (gb - self.g.xty)[:, np.newaxis]
        return primal, dual, grad

    def primal(self, beta):
        b = np.ravel(beta)
        return 0.5 * (
            self.g.yty - 2.0 * float(b @ self.g.xty) + self.g.quad(b)
        )

    def full_gradient(self, beta):
        return (self.g.matvec(np.ravel(beta)) - self.g.xty)[:, np.newaxis]

    def subset(self, idx):
        return GramGaussianDesign(self.g.subset(np.asarray(idx)))


def _weighted_gram(X: np.ndarray, W: np.ndarray, m: int, multinomial: bool) -> np.ndarray:
    """X^T W X for the IRLS Hessian, (p*m, p*m) in F-ravel coordinate
    order (index = j + p*k for feature j, target k).

    m = 1: W is the (n, 1) diagonal weight.  Multinomial: W holds class
    probabilities p_ik and block (k, l) is X^T diag(p_k (delta_kl - p_l)) X
    (the exact softmax Hessian, symmetric)."""
    n, p = X.shape
    if not multinomial:
        return (X * W[:, 0:1]).T @ X
    H = np.empty((p * m, p * m), dtype=np.float64)
    for k in range(m):
        for l in range(k, m):
            w_kl = W[:, k] * ((1.0 if k == l else 0.0) - W[:, l])
            blk = (X * w_kl[:, np.newaxis]).T @ X
            H[k * p : (k + 1) * p, l * p : (l + 1) * p] = blk
            if l != k:
                H[l * p : (l + 1) * p, k * p : (k + 1) * p] = blk
    return H


class SparkGlmDesign:
    """Distributed design over a cached DataFrame with an ``array<double>``
    feature column and a scalar (or, for multinomial, array) response.

    ``active_idx`` restricts the linear algebra to a column subset without
    rewriting the cached data (NumPy fancy-indexing inside the Arrow batch).
    """

    def __init__(self, df, x_col: str, y_col: str, family: Family,
                 p_full: int, m: int = 1, n: int | None = None,
                 active_idx: np.ndarray | None = None):
        self.df = df
        self.x_col = x_col
        self.y_col = y_col
        self.family = family
        self.p_full = p_full
        self.m = m
        self.active_idx = None if active_idx is None else np.asarray(active_idx)
        self.p = p_full if self.active_idx is None else len(self.active_idx)
        if n is None:
            n = df.count()
        self.n = n

    def _scan(self, beta, need_grad: bool, need_hess: bool = False):
        x_col, y_col = self.x_col, self.y_col
        p_full, m = self.p_full, self.m
        idx = self.active_idx
        fam = self.family
        p_act = self.p
        beta = np.ascontiguousarray(beta, dtype=np.float64).reshape(p_act, m)
        pm = p_act * m
        out_len = 2 + (pm if need_grad else 0) + (pm * pm if need_hess else 0)
        is_multi = fam.name == "multinomial"

        def make_partial(batch):
            X, Y = _batch_xy(batch, x_col, y_col, p_full, m)
            if idx is not None:
                X = X[:, idx]
            lin_pred = X @ beta
            part = np.empty(out_len, dtype=np.float64)
            part[0] = fam.primal(Y, lin_pred)
            part[1] = fam.dual(Y, lin_pred)
            if need_grad:
                part[2 : 2 + pm] = (
                    X.T @ fam.pseudo_gradient(Y, lin_pred)
                ).ravel(order="F")
            if need_hess:
                W = fam.hessian_weights(Y, lin_pred)
                if W.ndim == 1:
                    W = W[:, np.newaxis]
                part[2 + pm :] = _weighted_gram(X, W, m, is_multi).ravel()
            return part

        tot = partial_aggregate(self.df.select(x_col, y_col), out_len, make_partial)
        grad = tot[2 : 2 + pm].reshape((p_act, m), order="F") if need_grad else None
        if need_hess:
            return tot[0], tot[1], grad, tot[2 + pm :].reshape(pm, pm)
        return tot[0], tot[1], grad

    def eval(self, beta):
        return self._scan(beta, need_grad=True)

    def eval_hessian(self, beta):
        """(primal, dual, gradient, X^T W X) in ONE fused distributed scan —
        the per-outer-iteration cost of the prox-Newton solver."""
        return self._scan(beta, need_grad=True, need_hess=True)

    def primal(self, beta):
        return self._scan(beta, need_grad=False)[0]

    def full_gradient(self, beta_full):
        saved = self.active_idx
        try:
            self.active_idx, self.p = None, self.p_full
            _, _, grad = self._scan(beta_full, need_grad=True)
        finally:
            self.active_idx = saved
            self.p = self.p_full if saved is None else len(saved)
        return grad

    def subset(self, idx):
        idx = np.asarray(idx)
        base = idx if self.active_idx is None else self.active_idx[idx]
        return SparkGlmDesign(
            self.df, self.x_col, self.y_col, self.family,
            self.p_full, self.m, n=self.n, active_idx=base,
        )
