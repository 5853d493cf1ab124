"""Driver-side NumPy math for the SLOPE engine (p-sized objects only)."""

from .families import setup_family, FAMILIES
from .interpolate import interpolate_coefficients, interpolate_penalty
from .lambdas import lambda_max_from_xty, lambda_sequence, sigma_grid
from .prox import sorted_l1_norm, sorted_l1_prox
from .screening import infeasibility, kkt_check, strong_rule_active_set
from .solver import FitResult, GramData, admm_gaussian, admm_rho, fista
from .stats import norm_ppf, t_ppf

__all__ = [
    "setup_family", "FAMILIES",
    "interpolate_coefficients", "interpolate_penalty",
    "lambda_max_from_xty", "lambda_sequence", "sigma_grid",
    "sorted_l1_norm", "sorted_l1_prox",
    "infeasibility", "kkt_check", "strong_rule_active_set",
    "FitResult", "GramData", "admm_gaussian", "admm_rho", "fista",
    "norm_ppf", "t_ppf",
]
