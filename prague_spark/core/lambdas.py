"""Regularization sequences for SLOPE.

Driver-side NumPy re-implementations of the reference's penalty machinery
(``src/regularizationPath.h:9-72`` and ``src/lambdaMax.h:8-60`` in
jolars/prague). The only data-sized ingredient is ``lambda_max = |X^T y~|``,
which the Spark layer computes with a single distributed aggregation; the
sequences themselves are p-vectors and stay on the driver.
"""

from __future__ import annotations

import numpy as np

from .stats import norm_ppf


def lambda_sequence(
    n_lambda: int,
    n: int,
    lambda_type: str = "gaussian",
    q: float = 0.2,
    user_lambda: np.ndarray | None = None,
) -> np.ndarray:
    """Build the non-increasing SLOPE lambda sequence.

    ``lambda_type``:
      - ``"bh"``: Benjamini–Hochberg, lam_i = qnorm(1 - i*q/(2*k))
        (reference ``src/regularizationPath.h:28-33``).
      - ``"gaussian"``: BH adjusted by sqrt(1 + cumsum(lam^2)/w) with
        w = max(1, n - i - 1), then forced non-increasing from the argmin
        onward (``src/regularizationPath.h:35-46``).
      - ``"oscar"``: lam_i = q*(k - i) + 1 (``src/regularizationPath.h:48-50``).
      - ``"user"``: user sequence scaled by n (``src/regularizationPath.h:52-55``),
        validated non-increasing and non-negative (``R/owl.R:401-413``).
    """
    k = int(n_lambda)
    if lambda_type in ("bh", "gaussian"):
        probs = np.arange(1, k + 1, dtype=np.float64) * q / (2.0 * k)
        lam = np.array([norm_ppf(1.0 - pr) for pr in probs])
        if lambda_type == "gaussian" and k > 1:
            # The adjusted lam can overflow float64 at huge k (the multiplier
            # sqrt(1 + cumsum(lam^2)/w) compounds once w floors at 1). Every
            # overflowed entry is far above the running minimum, so the
            # argmin clamp below replaces it regardless of its exact value:
            # stopping the accumulation at the first non-finite cumsum and
            # marking the tail +inf is exactly equivalent to the reference
            # recursion (src/regularizationPath.h:35-46) in float64, minus
            # the RuntimeWarnings and the inf/inf->NaN hazard.
            sum_sq = 0.0
            with np.errstate(over="ignore"):
                for i in range(1, k):
                    sum_sq += np.float64(lam[i - 1]) ** 2
                    if not np.isfinite(sum_sq):
                        lam[i:] = np.inf
                        break
                    w = max(1.0, float(n - i - 1))
                    lam[i] *= np.sqrt(1.0 + sum_sq / w)
                    if not np.isfinite(lam[i]):
                        lam[i:] = np.inf
                        break
            # force non-increasing: everything after the argmin is set to min
            imin = int(np.argmin(lam))
            lam[imin:] = lam[imin]
            if not np.all(np.isfinite(lam)):  # k == 1 blow-up cannot happen:
                raise FloatingPointError(  # lam[0] is a plain norm_ppf value
                    "lambda sequence is non-finite; check n_lambda/q inputs"
                )
        return lam
    if lambda_type == "oscar":
        return q * (np.arange(k, 0, -1, dtype=np.float64) - 1.0) + 1.0
    if lambda_type == "user":
        if user_lambda is None:
            raise ValueError("lambda_type='user' requires user_lambda")
        lam = np.asarray(user_lambda, dtype=np.float64).ravel()
        if lam.size != k:
            raise ValueError(f"user lambda has length {lam.size}, expected {k}")
        if np.any(np.diff(lam) > 0):
            raise ValueError("lambda sequence must be non-increasing")
        if np.any(lam < 0):
            raise ValueError("lambda sequence must be non-negative")
        return lam * float(n)
    raise ValueError(f"unknown lambda_type {lambda_type!r}")


def lambda_max_from_xty(
    xty: np.ndarray,
    family: str,
    y_scale: np.ndarray | None = None,
) -> np.ndarray:
    """Per-coefficient penalty scale ``|X^T y~|``.

    ``xty`` is the family-specific cross-product computed distributed by the
    Spark layer (see ``prague_spark.design``), already excluding the
    intercept column. Mirrors ``src/lambdaMax.h:8-60``:

    - gaussian: X^T y (y centered)
    - binomial: X^T ((y+1)/2 - mean((y+1)/2)) for y in {-1, +1}
    - poisson:  X^T (1 - y)
    - multinomial: X^T ((y - mean)/std) * std, per class column

    The family-specific response transforms are applied by the caller;
    here we only take |.| and flatten, plus the multinomial y_scale
    re-multiplication.
    """
    lm = np.asarray(xty, dtype=np.float64)
    if family == "multinomial" and y_scale is not None:
        lm = lm * np.asarray(y_scale, dtype=np.float64)[np.newaxis, :]
    return np.abs(lm.ravel(order="F"))


def sigma_grid(
    lambda_max: np.ndarray,
    lam: np.ndarray,
    n_sigma: int = 100,
    lambda_min_ratio: float | None = None,
    n: int | None = None,
    p: int | None = None,
) -> tuple[np.ndarray, float]:
    """Log-spaced sigma grid down from sigma_max.

    ``sigma_max = max(cumsum(sort_desc(|lambda_max|)) / cumsum(lambda))``
    (``src/regularizationPath.h:57-71``). Default ``lambda_min_ratio`` is
    1e-2 if n < p else 1e-4 (``R/owl.R:280``).
    """
    if lambda_min_ratio is None:
        if n is None or p is None:
            raise ValueError("need n and p to default lambda_min_ratio")
        lambda_min_ratio = 1e-2 if n < p else 1e-4
    lm_sorted = np.sort(np.abs(lambda_max))[::-1]
    sigma_max = float(np.max(np.cumsum(lm_sorted) / np.cumsum(lam)))
    grid = np.exp(
        np.linspace(np.log(sigma_max), np.log(sigma_max * lambda_min_ratio), n_sigma)
    )
    return grid, sigma_max
