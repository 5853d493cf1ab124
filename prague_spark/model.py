"""Fitted SLOPE model container (the reference's ``Owl`` S3 object,
``R/owl.R:471-486`` in jolars/prague, as a Python dataclass).

Coefficients live on the driver as a small (n_path, p, m) cube; the
``coef_df`` helper explodes them to a tidy DataFrame so downstream SQL can
join/broadcast them (the SQL-verifiable surface).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .core.interpolate import interpolate_coefficients


@dataclass
class SlopeModel:
    family: str
    feature_names: list[str]  # excludes the intercept row
    intercept: bool
    betas: np.ndarray  # (n_path, p_total, m), original data scale; row 0 = intercept
    sigma: np.ndarray
    lam: np.ndarray  # lambda / n (reference normalization, src/owl.cpp:380)
    null_deviance: float
    deviances: np.ndarray
    deviance_ratios: np.ndarray
    passes: np.ndarray
    active_sets: list[np.ndarray]
    n_unique: np.ndarray
    class_names: list[str] = field(default_factory=list)
    n_targets: int = 1
    x_center: np.ndarray | None = None
    x_scale: np.ndarray | None = None
    y_center: np.ndarray | None = None
    y_scale: np.ndarray | None = None
    diagnostics: dict | None = None
    # refit closure installed by fit() (not persisted by save/load): called
    # by coef(exact=True) to rerun the fit at off-grid sigma, the analogue
    # of stats::update in R/coef.R:42-43
    refit: object = field(default=None, repr=False, compare=False)

    @property
    def n_path(self) -> int:
        return self.betas.shape[0]

    def coef(self, sigma=None, exact: bool = False) -> np.ndarray:
        """Coefficient cube (``R/coef.R:23-54``).

        sigma None -> the full path. Requested sigmas all on the grid ->
        those slices. Off-grid: linear interpolation by default
        (``R/interpolatePenalty.R``), or with ``exact=True`` a REFIT at the
        requested sigmas with the stored fit configuration
        (``R/coef.R:35-48`` / ``stats::update``) — needs the model to have
        been produced by ``fit()`` in this session (models restored from a
        sink have no training data attached)."""
        if sigma is None:
            return self.betas
        sig = np.atleast_1d(np.asarray(sigma, dtype=np.float64))
        if sig.size and np.all(np.isin(sig, self.sigma)):
            idx = [int(np.flatnonzero(self.sigma == s)[0]) for s in sig]
            return self.betas[idx]
        if exact:
            if self.refit is None:
                raise ValueError(
                    "coef(exact=True) needs the fit-time training data; this "
                    "model was restored without it — refit with fit() or use "
                    "exact=False interpolation"
                )
            return self.refit(sig).betas
        return interpolate_coefficients(self.betas, self.sigma, sig)

    def nonzeros(self) -> np.ndarray:
        """Count of nonzero (non-intercept) coefficients per path point."""
        start = 1 if self.intercept else 0
        return np.count_nonzero(np.any(self.betas[:, start:, :] != 0, axis=2), axis=1)

    def path_summary(self):
        """print.Owl table: (path_idx, sigma, deviance_ratio, n_nonzero)
        (``R/print.R:14-31``)."""
        nz = self.nonzeros()
        return [
            {
                "path_idx": int(i),
                "sigma": float(self.sigma[i]),
                "deviance_ratio": float(self.deviance_ratios[i]),
                "n_nonzero": int(nz[i]),
            }
            for i in range(self.n_path)
        ]

    def coef_df(self, spark):
        """Tidy coefficient DataFrame (path_idx, target, feature, coef) —
        the broadcastable form predictions join against."""
        names = (["(Intercept)"] if self.intercept else []) + list(self.feature_names)
        rows = []
        for i in range(self.n_path):
            for j, name in enumerate(names):
                for k in range(self.betas.shape[2]):
                    rows.append((int(i), int(k), name, float(self.betas[i, j, k])))
        return spark.createDataFrame(
            rows, "path_idx int, target int, feature string, coef double"
        )

    def deviance(self) -> np.ndarray:
        """(1 - deviance_ratio) * null_deviance (``R/deviance.R:13-18``)."""
        return (1.0 - self.deviance_ratios) * self.null_deviance

    # -- model sink (S5): persist/restore as parquet ----------------------

    def save(self, spark, path: str) -> None:
        """Persist the model as parquet: the tidy coefficient table plus a
        one-row JSON metadata table (the reference's model sink,
        ``R/owl.R:471-486``, re-expressed as a queryable dataset).

        Zero PENALIZED coefficients are skipped on disk (``load`` zero-
        fills, so the restored model — and its ``coef_df`` — are
        identical): a sparse wide-p model (e.g. a 2^15-feature quality
        filter) saves O(nonzero) rows, not O(p x path). Intercept rows
        always persist."""
        import json

        names = (["(Intercept)"] if self.intercept else []) + list(
            self.feature_names
        )
        rows = []
        for i in range(self.n_path):
            B = self.betas[i]
            keep = set(np.flatnonzero(np.any(B != 0.0, axis=1)))
            if self.intercept:
                keep.add(0)  # intercepts are meaningful even at 0.0
            for j in sorted(keep):
                for k in range(B.shape[1]):
                    rows.append((int(i), int(k), names[j], float(B[j, k])))
        spark.createDataFrame(
            rows, "path_idx int, target int, feature string, coef double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/coefs")
        meta = dict(
            family=self.family,
            feature_names=list(self.feature_names),
            intercept=bool(self.intercept),
            sigma=[float(x) for x in self.sigma],
            lam=[float(x) for x in self.lam],
            null_deviance=float(self.null_deviance),
            deviances=[float(x) for x in self.deviances],
            deviance_ratios=[float(x) for x in self.deviance_ratios],
            passes=[int(x) for x in self.passes],
            n_unique=[int(x) for x in self.n_unique],
            class_names=list(self.class_names),
            n_targets=int(self.n_targets),
        )
        spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/meta")

    @staticmethod
    def load(spark, path: str) -> "SlopeModel":
        """Restore a model persisted by ``save`` (predictions/scoring only;
        solver state such as diagnostics is not round-tripped)."""
        import json

        meta = json.loads(spark.read.parquet(f"{path}/meta").first()["meta"])
        names = (["(Intercept)"] if meta["intercept"] else []) + list(
            meta["feature_names"]
        )
        name_pos = {nm: j for j, nm in enumerate(names)}
        n_path = len(meta["sigma"])
        m = meta["n_targets"]
        betas = np.zeros((n_path, len(names), m))
        for r in spark.read.parquet(f"{path}/coefs").collect():
            betas[int(r["path_idx"]), name_pos[r["feature"]], int(r["target"])] = r[
                "coef"
            ]
        return SlopeModel(
            family=meta["family"],
            feature_names=list(meta["feature_names"]),
            intercept=meta["intercept"],
            betas=betas,
            sigma=np.asarray(meta["sigma"]),
            lam=np.asarray(meta["lam"]),
            null_deviance=meta["null_deviance"],
            deviances=np.asarray(meta["deviances"]),
            deviance_ratios=np.asarray(meta["deviance_ratios"]),
            passes=np.asarray(meta["passes"], dtype=int),
            active_sets=[],
            n_unique=np.asarray(meta["n_unique"], dtype=int),
            class_names=list(meta["class_names"]),
            n_targets=m,
        )

    def diagnostics_df(self, spark):
        """Tidy per-iteration diagnostics (path_idx, iteration, primal,
        dual, time_s) — the ``plotDiagnostics`` data output
        (``R/setupDiagnostics.R:9-25``, ``R/plotDiagnostics.R:22-73``).
        Requires the fit to have run with ``diagnostics=True``."""
        # sparse fits attach a diagnostics dict carrying only scan-count
        # accounting (sparse_scans) with empty trace lists — that is NOT
        # a per-iteration trace, so keep raising for it
        if not self.diagnostics or not self.diagnostics.get("primals"):
            raise ValueError("fit was run without diagnostics=True")
        rows = []
        for pi, (prim, dual, tim) in enumerate(
            zip(
                self.diagnostics["primals"],
                self.diagnostics["duals"],
                self.diagnostics["time"],
            )
        ):
            for it in range(len(prim)):
                rows.append(
                    (pi, it, float(prim[it]), float(dual[it]), float(tim[it]))
                )
        return spark.createDataFrame(
            rows,
            "path_idx int, iteration int, primal double, dual double, time_s double",
        )
