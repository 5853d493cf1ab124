"""Penalty / coefficient interpolation for off-grid sigma values.

Re-implements the glmnet-derived interpolation the reference uses in
``coef()``/``predict()`` (``R/interpolatePenalty.R:10-37`` and
``R/interpolateCoefficients.R:9-27`` in jolars/prague).
"""

from __future__ import annotations

import numpy as np


def interpolate_penalty(penalty: np.ndarray, x: np.ndarray):
    """Return (left, right, frac) index/weight triples so that the value at
    each requested ``x`` is ``frac * value[left] + (1 - frac) * value[right]``.
    """
    penalty = np.asarray(penalty, dtype=np.float64)
    x = np.atleast_1d(np.asarray(x, dtype=np.float64)).copy()

    if penalty.size == 1:
        k = x.size
        return np.zeros(k, int), np.zeros(k, int), np.ones(k)

    x = np.clip(x, penalty.min(), penalty.max())
    k = penalty.size
    xfrac = (penalty[0] - x) / (penalty[0] - penalty[k - 1])
    pfrac = (penalty[0] - penalty) / (penalty[0] - penalty[k - 1])
    # positions of xfrac within the normalized penalty grid (1-based in R;
    # 0-based here)
    coord = np.interp(xfrac, pfrac, np.arange(k, dtype=np.float64))
    left = np.floor(coord).astype(int)
    right = np.ceil(coord).astype(int)
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = (xfrac - pfrac[right]) / (pfrac[left] - pfrac[right])
    frac[left == right] = 1.0
    frac[np.abs(pfrac[left] - pfrac[right]) < np.finfo(float).eps] = 1.0
    return left, right, frac


def interpolate_coefficients(betas: np.ndarray, penalty: np.ndarray, x) -> np.ndarray:
    """Linear interpolation of the coefficient cube ``betas`` with shape
    (n_path, p, m) at the requested penalty values ``x``."""
    left, right, frac = interpolate_penalty(penalty, x)
    out = np.empty((left.size,) + betas.shape[1:], dtype=np.float64)
    for i in range(left.size):
        out[i] = betas[left[i]] * frac[i] + betas[right[i]] * (1.0 - frac[i])
    return out
