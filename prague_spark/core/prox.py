"""Proximal operator of the sorted-L1 (SLOPE / OWL) norm.

Semantics follow the reference implementation (``src/prox.h:8-56`` in
jolars/prague): given a non-increasing, non-negative ``lam`` the prox of
``J(x) = sum_j lam_j * |x|_(j)`` is computed by sorting ``|v|`` in
decreasing order, subtracting ``lam``, running a stack-based
pool-adjacent-violators (isotonic) pass to enforce a non-increasing
solution, clamping at zero, and restoring the original order and signs.
This is the FastProxSL1 algorithm of Bogdan et al. (2015), "SLOPE —
adaptive variable selection via convex optimization".

This is deliberately a driver-side NumPy routine: the input is only ever
a p-vector (p coefficients), never an n-sized object, so at 100 TB scale
it stays O(p log p) on the driver while the data-sized work happens in
Spark aggregations.
"""

from __future__ import annotations

import numpy as np


def sorted_l1_prox(v: np.ndarray, lam: np.ndarray) -> np.ndarray:
    """Prox of the sorted-L1 norm evaluated at ``v`` with weights ``lam``.

    Parameters
    ----------
    v : array (will be flattened). The point at which to evaluate the prox.
    lam : non-increasing, non-negative array of the same flattened length.

    Returns
    -------
    Array with the same shape as ``v``.
    """
    v = np.asarray(v, dtype=np.float64)
    shape = v.shape
    x = v.ravel()
    lam = np.asarray(lam, dtype=np.float64).ravel()
    p = x.size
    if lam.size != p:
        raise ValueError(f"lam has length {lam.size}, expected {p}")
    if p == 0:
        return v.copy()

    sign = np.sign(x)
    ax = np.abs(x)
    order = np.argsort(-ax, kind="stable")
    z = ax[order] - lam

    # Stack-based PAVA for a non-increasing fit to z.
    idx_i = np.empty(p, dtype=np.intp)
    idx_j = np.empty(p, dtype=np.intp)
    sums = np.empty(p, dtype=np.float64)
    means = np.empty(p, dtype=np.float64)
    k = 0
    for i in range(p):
        idx_i[k] = i
        idx_j[k] = i
        sums[k] = z[i]
        means[k] = z[i]
        while k > 0 and means[k - 1] <= means[k]:
            k -= 1
            idx_j[k] = i
            sums[k] += sums[k + 1]
            means[k] = sums[k] / (i - idx_i[k] + 1.0)
        k += 1

    sorted_out = np.empty(p, dtype=np.float64)
    for j in range(k):
        sorted_out[idx_i[j] : idx_j[j] + 1] = max(means[j], 0.0)

    out = np.empty(p, dtype=np.float64)
    out[order] = sorted_out
    return (out * sign).reshape(shape)


def sorted_l1_norm(v: np.ndarray, lam: np.ndarray) -> float:
    """J(v) = sum_j lam_j |v|_(j) with |v| sorted in decreasing order."""
    av = np.sort(np.abs(np.ravel(v)))[::-1]
    return float(np.dot(av, np.ravel(lam)))
