"""Feature screening for the SLOPE path: strong rule, KKT check, infeasibility.

Driver-side NumPy re-implementations with the semantics of the reference's
``src/screening.h:7-53``, ``src/kktCheck.h:8-37`` and
``src/infeasibility.h:8-12`` (jolars/prague). All inputs are p-sized
gradients already reduced by the distributed layer, so these stay O(p log p)
on the driver — the screening decision then *prunes the distributed
computation* (the Spark gradient aggregation only touches the active
columns), which is the Spark analogue of the reference's column-subset fits.
"""

from __future__ import annotations

import numpy as np


def strong_rule_active_set(
    gradient_prev: np.ndarray,
    lam: np.ndarray,
    lam_prev: np.ndarray,
    intercept: bool,
) -> np.ndarray:
    """SLOPE strong screening rule (sequential, sorted cumulative-sum form).

    ``gradient_prev`` is the (p, m) gradient at the previous path solution
    *excluding* the intercept row. ``lam``/``lam_prev`` are the current and
    previous full penalty vectors (length p*m). Returns sorted indices of
    predicted-active features (0-based, over the p*m flattened coefficients
    folded back to p feature indices; the intercept index 0 is prepended
    when ``intercept`` and all other indices are shifted by one, matching
    ``src/screening.h:40-50``).
    """
    g = np.asarray(gradient_prev, dtype=np.float64)
    if g.ndim == 1:
        g = g[:, np.newaxis]
    m = g.shape[1]
    abs_grad = np.abs(g.ravel(order="F"))
    p = abs_grad.size
    ord_ = np.argsort(-abs_grad, kind="stable")
    tmp = abs_grad[ord_] + np.asarray(lam_prev) - 2.0 * np.asarray(lam)

    i = 0
    k = 0
    s = 0.0
    while i + k < p:
        s += tmp[k + i]
        if s >= 0:
            k = k + i + 1
            i = 0
            s = 0.0
        else:
            i += 1

    active = np.zeros(p, dtype=bool)
    chosen = np.zeros(p, dtype=bool)
    chosen[:k] = True
    active[ord_] = chosen

    active_mat = active.reshape((p // m, m), order="F")
    out = np.flatnonzero(np.any(active_mat, axis=1))
    if intercept:
        out = np.concatenate(([0], out + 1))
    return out


def kkt_check(
    gradient: np.ndarray,
    beta: np.ndarray,
    lam: np.ndarray,
    tol: float,
    intercept: bool,
) -> np.ndarray:
    """KKT violation check on the full gradient (``src/kktCheck.h:8-37``).

    Returns feature indices whose sorted cumulative |gradient| exceeds the
    penalty budget while their coefficient is zero.
    """
    g = np.asarray(gradient, dtype=np.float64)
    b = np.asarray(beta, dtype=np.float64)
    if g.ndim == 1:
        g = g[:, np.newaxis]
    if b.ndim == 1:
        b = b[:, np.newaxis]
    if intercept:
        g = g[1:]
        b = b[1:]
    flat_g = g.ravel(order="F")
    flat_b = b.ravel(order="F")
    lam = np.asarray(lam, dtype=np.float64)

    nonzeros = np.flatnonzero(flat_b != 0.0)
    ord_ = np.argsort(-np.abs(flat_g), kind="stable")
    abs_sorted = np.abs(flat_g[ord_])

    rh = max(np.sqrt(np.finfo(np.float64).eps), tol * lam[0]) if lam.size else np.inf
    tmp_sorted = np.cumsum(abs_sorted - lam) > rh
    tmp = np.empty_like(tmp_sorted)
    tmp[ord_] = tmp_sorted
    tmp[nonzeros] = False

    tmp_mat = tmp.reshape(g.shape, order="F")
    out = np.flatnonzero(np.any(tmp_mat, axis=1))
    if intercept:
        out = out + 1
    return out


def infeasibility(gradient: np.ndarray, lam: np.ndarray) -> float:
    """Dual-feasibility distance ``max(max(cumsum(sort_desc|g| - lam)), 0)``
    (``src/infeasibility.h:8-12``)."""
    ag = np.sort(np.abs(np.ravel(gradient)))[::-1]
    if ag.size == 0:
        return 0.0
    return float(max(np.max(np.cumsum(ag - np.ravel(lam))), 0.0))
