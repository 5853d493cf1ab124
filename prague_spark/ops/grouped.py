"""Per-segment SLOPE path fitting: one independent model per group key.

The reference fits ONE model per call (``R/owl.R:1-390``); at cluster
scale the common ask is one model per segment (per language, per
source, per region) over a table far too large for any single node.
Spark's shape for that is a single hash shuffle on the group keys
followed by embarrassingly parallel IN-CORE solves — each group's rows
land in one ``applyInPandas`` call, which runs the driver-only NumPy
reference fit (:func:`prague_spark.core.ref_fit.numpy_path_fit`, the
pinned twin of ``prague_spark.fit.fit``) on the executor.

Scale notes (100 TB):
- ONE shuffle total, keyed by the group columns; thousands of segments
  fit concurrently, one task each. This is the textbook "many small
  models" pattern — the alternative (a driver loop of distributed fits)
  pays a full scan per segment.
- Each GROUP must fit in one task's memory (``n_rows x (p + m)``
  doubles). ``max_group_rows`` fails loud with the offending group key
  rather than OOMing the executor; segments above it should be sampled
  or fit individually with the distributed :func:`prague_spark.fit.fit`.
- Hot segments skew task time, not memory ceilings elsewhere: AQE
  cannot split a single applyInPandas group, so cap-and-sample the
  known-degenerate keys upstream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, StringType, StructField,
    StructType,
)

__all__ = [
    "fit_grouped", "predict_grouped", "score_grouped", "cv_fit_grouped",
    "cv_optimum_path", "cap_group_rows", "save_grouped", "load_grouped",
]

#: coefficient rows use this pseudo-feature name for the intercept
INTERCEPT = "(intercept)"


def _resolve_classes(coefs: DataFrame, classes, who: str) -> list[str]:
    """Class names for scoring: the explicit ``classes=`` argument wins;
    otherwise they are read off the MODEL-SIZED coefficient frame's
    ``classes`` column (carried by :func:`fit_grouped` — never a scan of
    the data being scored). All groups must share one class set: scoring
    emits fixed columns, so heterogeneous per-group simplexes cannot be
    expressed in one plan — fail loud rather than mis-map a class."""
    if classes is not None:
        return [str(c) for c in classes]
    if "classes" not in coefs.columns:
        raise ValueError(
            f"{who}: pass classes= (the coefficient frame has no 'classes' "
            "column — re-fit with fit_grouped, which carries it)"
        )
    sets = [
        tuple(r[0]) for r in coefs.select("classes").distinct().collect()
    ]
    if len(sets) != 1:
        raise ValueError(
            f"{who}: groups carry different class sets {sorted(sets)}; "
            "pass classes= explicitly or score the segments separately"
        )
    return list(sets[0])


def fit_grouped(
    df: DataFrame,
    features: Sequence[str],
    label: str,
    family: str,
    group_cols: Sequence[str],
    *,
    q: float = 0.2,
    n_sigma: int = 100,
    lambda_min_ratio: float | None = None,
    lambda_type: str = "gaussian",
    order_col: str | None = None,
    max_group_rows: int = 2_000_000,
) -> DataFrame:
    """Fit one SLOPE path per distinct ``group_cols`` key.

    Returns a long coefficient frame: one row per
    (group, path_idx, feature, cls) with a NONZERO coefficient (the
    intercept row is always emitted), plus the per-point ``sigma`` and
    ``n_nonzero``. ``cls`` indexes the (m-1) multinomial targets and is
    0 for single-target families.

    ``order_col``: sort each group's rows by this column before solving
    — float accumulation ORDER is then fixed, making the output invariant
    to upstream partitioning up to BLAS-reduction ulps (the parity tests
    pin this at rel 1e-9; bit-exactness is not achievable because BLAS
    splits reductions by thread context).

    Groups that cannot be fit raise ``ValueError`` naming the group key
    (single-class binomial labels, negative poisson counts, rows above
    ``max_group_rows``) — loud beats a silently missing segment.
    """
    import numpy as np
    import pandas as pd

    from ..core.ref_fit import numpy_path_fit

    features = list(features)
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("fit_grouped: group_cols must be non-empty")
    overlap = set(group_cols) & (set(features) | {label})
    if overlap:
        raise ValueError(f"fit_grouped: group_cols overlap features/label: {overlap}")

    gfields = [df.schema[c] for c in group_cols]
    schema = StructType(
        [StructField(f.name, f.dataType, True) for f in gfields]
        + [
            StructField("path_idx", IntegerType()),
            StructField("sigma", DoubleType()),
            StructField("feature", StringType()),
            StructField("cls", IntegerType()),
            StructField("beta", DoubleType()),
            StructField("n_nonzero", IntegerType()),
            # the group's sorted class names ([] for gaussian/poisson) —
            # carried on the model-sized frame so scoring never needs an
            # extra pass over the data to discover the label coding
            StructField("classes", ArrayType(StringType())),
        ]
    )

    cols = group_cols + features + [label] + ([order_col] if order_col else [])
    cols = list(dict.fromkeys(cols))

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        key = tuple(pdf.iloc[0][c] for c in group_cols)
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"fit_grouped: group {key} has {len(pdf)} rows > "
                f"max_group_rows={max_group_rows}; sample the segment or fit "
                "it with the distributed prague_spark.fit"
            )
        if order_col:
            pdf = pdf.sort_values(order_col, kind="mergesort")
        X = pdf[features].to_numpy(dtype=np.float64)
        y = pdf[label].to_numpy()
        # per-group response validation, mirroring ops.response (ref_fit's
        # preprocess assumes a pre-validated response) — the error names
        # the group so a bad segment is findable in a 10k-segment job
        if family in ("binomial", "multinomial"):
            import collections

            cnt = collections.Counter(str(v) for v in y)
            if family == "binomial" and len(cnt) != 2:
                raise ValueError(
                    f"fit_grouped: group {key}: binomial needs exactly two "
                    f"classes, got {sorted(cnt)}"
                )
            if family == "multinomial" and len(cnt) < 3:
                raise ValueError(
                    f"fit_grouped: group {key}: multinomial needs > 2 "
                    f"classes, got {sorted(cnt)}"
                )
            if min(cnt.values()) < 2:
                raise ValueError(
                    f"fit_grouped: group {key}: one class only has "
                    f"{min(cnt.values())} observation(s)"
                )
        elif family == "poisson" and (y.astype(np.float64) < 0).any():
            raise ValueError(
                f"fit_grouped: group {key}: negative responses in poisson model"
            )
        try:
            res = numpy_path_fit(
                X, y, family, q=q, n_sigma=n_sigma,
                lambda_min_ratio=lambda_min_ratio, lambda_type=lambda_type,
            )
        except ValueError as e:
            raise ValueError(f"fit_grouped: group {key}: {e}") from e
        B = res["betas"]  # (K, p+1, m) original units
        K, _, m = B.shape
        cls_names = [str(c) for c in res["class_names"]]
        names = [INTERCEPT] + features
        out: dict = {c: [] for c in group_cols}
        pi, sg, ft, cl, bt, nz = [], [], [], [], [], []
        for k in range(K):
            for j, nm in enumerate(names):
                for t in range(m):
                    b = float(B[k, j, t])
                    if j > 0 and b == 0.0:
                        continue
                    for c, v in zip(group_cols, key):
                        out[c].append(v)
                    pi.append(k)
                    sg.append(float(res["sigma"][k]))
                    ft.append(nm)
                    cl.append(t)
                    bt.append(b)
                    nz.append(int(res["n_nonzero"][k]))
        out.update(
            path_idx=pi, sigma=sg, feature=ft, cls=cl, beta=bt, n_nonzero=nz,
            classes=[cls_names] * len(pi),
        )
        return pd.DataFrame(out)

    return df.select(*cols).groupBy(*group_cols).applyInPandas(_solve, schema)


def _slice_path(c: DataFrame, group_cols, path_idx):
    """One path point per group: the caller's explicit global index, a
    PER-GROUP selection frame (group_cols..., path_idx — e.g.
    :func:`cv_optimum_path` from a grouped CV), else each group's
    DEEPEST (max path_idx, per group — paths may stop early)."""
    from pyspark.sql import Window

    if path_idx is None:
        w = Window.partitionBy(*group_cols)
        return c.withColumn("_kmax", F.max("path_idx").over(w)).filter(
            F.col("path_idx") == F.col("_kmax")
        ).drop("_kmax")
    if isinstance(path_idx, DataFrame):
        sel_cols = set(path_idx.columns)
        need = set(group_cols) | {"path_idx"}
        if not need <= sel_cols:
            raise ValueError(
                f"per-group path selection needs columns {sorted(need)}, "
                f"got {sorted(sel_cols)}"
            )
        sel = path_idx.select(*group_cols, "path_idx")
        # fail loud on selections an inner join would silently drop: a
        # selection built with DIFFERENT penalty params than the
        # coefficient frame can name a path_idx the group's path never
        # reached — every row of that segment would otherwise score
        # NULL. Validated DRIVER-SIDE from the two frames' distinct keys
        # (NULL group keys compare fine as Python tuples — a join-based
        # check would need null-safe equality). Both frames are
        # MODEL-SIZED, so they are collected WHOLE and rebuilt as local
        # frames: validation and the returned join then share ONE
        # execution of each lineage — an unpersisted applyInPandas fit
        # used to run once for validation here and AGAIN at scoring.
        keys = [*group_cols, "path_idx"]
        spark = c.sparkSession
        c_rows = c.collect()
        c = spark.createDataFrame(c_rows, c.schema)
        sel_rows = sel.collect()
        sel = spark.createDataFrame(sel_rows, sel.schema)
        have = {tuple(getattr(r, k) for k in keys) for r in c_rows}
        want = {tuple(getattr(r, k) for k in keys) for r in sel_rows}
        # exactly ONE path point per group: two selection rows for a
        # group would both survive the inner join and the downstream
        # max(when(...)) pivot would silently merge two models
        # elementwise — a model that was never fit
        by_group: dict = {}
        for t in want:
            by_group.setdefault(t[:-1], set()).add(t[-1])
        dupes = sorted(
            (g for g, pts in by_group.items() if len(pts) > 1), key=repr
        )
        if dupes:
            raise ValueError(
                "per-group path selection has MULTIPLE path_idx rows for "
                f"group(s) {dupes[:10]}{'...' if len(dupes) > 10 else ''}"
                " — deduplicate the selection to one point per group"
            )
        missing = sorted(want - have, key=repr)
        if missing:
            raise ValueError(
                "per-group path selection matched no coefficient rows for "
                f"group(s) {missing[:10]}{'...' if len(missing) > 10 else ''}"
                " — the selection's path_idx is absent from those groups' "
                "paths (were the CV and the fit run with the same penalty "
                "parameters?)"
            )
        # model-sized join: one row per group picks that group's point.
        # NULL-safe on the group key — a NULL-keyed segment with a valid
        # selection must match, not vanish (plain '=' would drop it).
        lhs, rhs = c.alias("_sp_l"), sel.alias("_sp_r")
        cond = F.col("_sp_l.path_idx") == F.col("_sp_r.path_idx")
        for g in group_cols:
            cond = cond & F.col(f"_sp_l.{g}").eqNullSafe(F.col(f"_sp_r.{g}"))
        return lhs.join(rhs, cond).select("_sp_l.*")
    return c.filter(F.col("path_idx") == int(path_idx))


def _join_models(df: DataFrame, bflat: DataFrame, group_cols, model_cols):
    """Broadcast-left-join the model-sized pivoted coefficient frame onto
    the data, NULL-SAFE on the group key: fit_grouped/applyInPandas
    happily model a NULL-keyed segment, so scoring must match it too —
    plain '=' would leave every row of that segment NULL. Returns all of
    ``df``'s columns plus ``model_cols`` from the coefficient side."""
    from pyspark.sql.functions import broadcast

    lhs, rhs = df.alias("_pg_l"), broadcast(bflat.alias("_pg_r"))
    cond = None
    for g in group_cols:
        e = F.col(f"_pg_l.{g}").eqNullSafe(F.col(f"_pg_r.{g}"))
        cond = e if cond is None else cond & e
    return lhs.join(rhs, cond, "left").select(
        "_pg_l.*", *[F.col(f"_pg_r.{c}") for c in model_cols]
    )


#: columns every grouped coefficient frame must carry (plus group cols)
_COEF_COLS = (
    "path_idx", "sigma", "feature", "cls", "beta", "n_nonzero", "classes",
)


def save_grouped(coefs: DataFrame, path: str) -> None:
    """Persist a :func:`fit_grouped` coefficient frame (the grouped
    model sink, the per-segment analogue of ``SlopeModel.save`` —
    ``R/owl.R:471-486``'s S5 for many models at once). The frame is
    model-sized, so it lands as one parquet file; the schema is
    validated BEFORE writing so a wrong frame fails loud here, not at
    some later scoring call."""
    missing = [c for c in _COEF_COLS if c not in coefs.columns]
    if missing:
        raise ValueError(
            f"save_grouped: not a fit_grouped coefficient frame — "
            f"missing columns {missing}"
        )
    # materialize driver-side BEFORE the overwrite: if `coefs` was
    # loaded from (or lazily depends on) `path` itself, overwriting the
    # files under a plan that still reads them would destroy the only
    # copy mid-write. The frame is model-sized by construction.
    spark = coefs.sparkSession
    rows = coefs.collect()
    spark.createDataFrame(rows, coefs.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_grouped(spark, path: str, group_cols: Sequence[str]) -> DataFrame:
    """Restore a :func:`save_grouped` frame, validating that it carries
    the coefficient schema AND the caller's expected group columns —
    scoring with the wrong segmentation key would otherwise surface as
    an opaque join error (or worse, all-NULL predictions)."""
    coefs = spark.read.parquet(path)
    missing = [
        c for c in (*group_cols, *_COEF_COLS) if c not in coefs.columns
    ]
    if missing:
        raise ValueError(
            f"load_grouped: {path!r} is not a grouped coefficient frame "
            f"for groups {list(group_cols)} — missing columns {missing}"
        )
    # the saved frame's group columns must match EXACTLY: loading a
    # (region, lang)-segmented model as region-only would pass a
    # missing-columns check but then pivot/aggregate betas ACROSS the
    # lang models into one garbage coefficient set per region
    extra = set(coefs.columns) - set(_COEF_COLS) - set(group_cols)
    if extra:
        raise ValueError(
            f"load_grouped: {path!r} was saved with additional group "
            f"column(s) {sorted(extra)} — load it with the FULL "
            f"segmentation key, not {list(group_cols)}"
        )
    return coefs


def _approx_cap_filter(df: DataFrame, group_cols, target_rows: int, u):
    """The shared hash-threshold pass of :func:`cap_group_rows`: ONE
    count aggregation finds groups above ``target_rows``, their keep
    fractions broadcast-join back (NULL-safe), each row survives iff
    its hash unit < fraction. Groups at or under the target pass
    through untouched; surviving group sizes concentrate binomially
    around ``target_rows``."""
    import logging

    over_rows = (
        df.groupBy(*group_cols)
        .count()
        .filter(F.col("count") > target_rows)
        .select(
            *group_cols,
            (F.lit(float(target_rows)) / F.col("count")).alias("_keep_frac"),
        )
        .collect()
    )
    if not over_rows:
        return df
    logging.getLogger("prague_spark.grouped").warning(
        "cap_group_rows: downsampling %d group(s) above %d rows",
        len(over_rows), target_rows,
    )
    from pyspark.sql.functions import broadcast

    over = df.sparkSession.createDataFrame(
        over_rows,
        df.select(*group_cols).schema.add("_keep_frac", DoubleType()),
    )
    # NULL-safe equality on the group key: plain column-name joins use
    # null-unsafe '=', so a whale group keyed by NULL would never match
    # its keep fraction and silently bypass the cap — the exact segment
    # this helper exists to save
    lhs, rhs = df.alias("_cap_l"), broadcast(over.alias("_cap_r"))
    cond = None
    for c in group_cols:
        e = F.col(f"_cap_l.{c}").eqNullSafe(F.col(f"_cap_r.{c}"))
        cond = e if cond is None else cond & e
    joined = lhs.join(rhs, cond, "left").select(
        "_cap_l.*", F.col("_cap_r._keep_frac").alias("_keep_frac")
    )
    return joined.filter(
        F.col("_keep_frac").isNull() | (u < F.col("_keep_frac"))
    ).drop("_keep_frac")


def cap_group_rows(
    df: DataFrame,
    group_cols: Sequence[str],
    max_rows: int,
    key_cols: Sequence[str],
    seed: int = 42,
    exact: bool = False,
    prefilter: bool = False,
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Deterministic per-group downsampling to ``max_rows`` rows,
    applied BEFORE a grouped solve: ``fit_grouped``'s ``max_group_rows``
    guard fails loud only after ``applyInPandas`` has already
    materialized the whale group in one task — the memory is spent by
    the time the check runs. This helper keeps the job alive instead.
    Rows survive by a deterministic md5 hash on ``key_cols`` — the same
    hash-unit rule as the oracle-gated stratified sampler
    (pipeline.sample), so the surviving set is engine-portable,
    partition-invariant, and replayable in SQL. Each key column is
    md5-hashed SEPARATELY (NULLs coalesced to a sentinel) before the
    combined hash: fixed-width parts make the concatenation
    delimiter-unambiguous ('a:1'+'2' vs 'a'+'1:2') and a NULL in one
    column cannot collapse distinct keys. Groups at or under the cap
    pass through untouched.

    Two modes:

    - ``exact=False`` (default, the zero-shuffle path): one count
      aggregation finds the oversized groups, their keep fractions
      broadcast-join back (NULL-safe on the group key — a NULL-keyed
      whale group is capped like any other), and each row survives iff
      hash < fraction. Capped group sizes concentrate binomially around
      ``max_rows`` — EXPECTED size, not exact, so a group can land a few
      rows above the cap: leave a margin (cap at ~0.9x) before a hard
      ``fit_grouped(max_group_rows=max_rows)`` limit, or use exact mode.
    - ``exact=True``: each group keeps the ``max_rows`` rows with the
      LOWEST hash values (ties broken by ``key_cols``) via ONE
      row_number window partitioned by the group key — guaranteed
      ``<= max_rows``, so composing with ``fit_grouped(max_group_rows=
      max_rows)`` can never fail. Costs a hash-partition shuffle on
      ``group_cols`` — which the grouped solve right after it repartitions
      on anyway (same keys, so the exchange is reusable) — and a
      per-partition sort; still no count pass, no join, no cache.

      **SKEW WARNING**: the window funnels each ENTIRE group through one
      task's sort before discarding — a billion-row whale group is one
      unboundedly-skewed task (sort spill keeps it alive, wall-clock
      pays). ``prefilter=True`` bounds it: the approximate hash pass
      runs FIRST at ``prefilter_margin * max_rows``, so the sorted
      group is already near the cap. The kept set is unchanged — the
      window keeps the lowest-hash rows and the prefilter keeps a
      hash-prefix superset — EXCEPT with probability ~exp(-max_rows *
      (margin-1)^2 / (2*margin)) (binomial tail, astronomically small at
      the default margin 4 for any real cap) a group can come out
      slightly UNDER ``max_rows``: still a valid cap, never over, still
      deterministic. Costs the approximate mode's count pass + join.

    ``key_cols`` must identify rows uniquely within a group — a reused
    key survives or dies as a block, skewing the sample."""
    from ..pipeline.sample import _hash_unit_expr

    group_cols = list(group_cols)
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("cap_group_rows: key_cols must be non-empty")
    if max_rows <= 0:
        raise ValueError("cap_group_rows: max_rows must be positive")
    parts = [
        F.md5(F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00")))
        for c in key_cols
    ]
    u = _hash_unit_expr(*parts, F.lit(seed))
    if exact:
        from pyspark.sql import Window

        if prefilter:
            if prefilter_margin <= 1.0:
                raise ValueError(
                    "cap_group_rows: prefilter_margin must be > 1 "
                    "(headroom over max_rows so the window still sees "
                    "the full kept set)"
                )
            df = _approx_cap_filter(
                df, group_cols, int(prefilter_margin * max_rows), u
            )
        w = Window.partitionBy(*group_cols).orderBy(
            u.asc(), *[F.col(c).asc() for c in key_cols]
        )
        return df.withColumn("_cap_rn", F.row_number().over(w)).filter(
            F.col("_cap_rn") <= int(max_rows)
        ).drop("_cap_rn")
    return _approx_cap_filter(df, group_cols, int(max_rows), u)


def cv_optimum_path(cv_out: DataFrame, group_cols) -> DataFrame:
    """Each group's CV-optimal path point as a selection frame for
    ``predict_grouped(path_idx=...)`` / ``score_grouped(path_idx=...)``:
    (group_cols..., path_idx). ``cv_out`` is :func:`cv_fit_grouped`'s
    output; its ``sigma_idx`` indexes the SAME grid as
    :func:`fit_grouped`'s ``path_idx`` when both ran with the same
    penalty parameters (q, n_sigma, lambda_min_ratio, lambda_type) —
    both fix the grid with the identical in-core full fit.
    ``is_optimum`` is direction-aware (min for loss measures, MAX for
    auc), so the selection is always each segment's best model."""
    group_cols = list(group_cols)
    return (
        cv_out.filter(F.col("is_optimum"))
        .select(*group_cols, F.col("sigma_idx").cast("int").alias("path_idx"))
    )


def predict_grouped(
    df: DataFrame,
    coefs: DataFrame,
    features: Sequence[str],
    group_cols: Sequence[str],
    *,
    family: str = "gaussian",
    path_idx: "int | DataFrame | None" = None,
    type: str = "response",
    out: str = "pred",
    classes: Sequence[str] | None = None,
) -> DataFrame:
    """Score rows with the per-segment models :func:`fit_grouped`
    produced: one path point per group (default: each group's DEEPEST;
    pass an int for one global point, or a (group_cols..., path_idx)
    DataFrame — e.g. :func:`cv_optimum_path` — to score each segment
    at its OWN CV-chosen point),
    the coefficient rows FLAT-PIVOTED to one broadcast double column per
    (feature) and joined on the group key, then one codegen dot product
    in ORIGINAL units. Rows whose group has no model get NULL; the join
    is NULL-SAFE on the group key, so a NULL-keyed segment scores with
    its own model (fit_grouped models it like any other).

    The coefficient frame is model-sized (segments x path x nonzeros) —
    always broadcastable — so scoring 100 TB with 10k segment models is
    a map-side join + projection: no shuffle of the data.

    ``type``: 'link' (x'beta; multinomial: array of the m-1 target lps),
    'response' (inverse link; multinomial: the m-class stabilized
    softmax array, implicit-last-class, ``R/predict.R:151-197``) or
    'class' (binomial lp>0 threshold / multinomial argmax, first-match
    ties, ``R/predict.R:91-121,180-197``). Class names come from
    ``classes=`` or the coefficient frame's ``classes`` column; all
    groups must share one class set (the output columns are fixed at
    plan time)."""
    if type not in ("link", "response", "class"):
        raise ValueError(f"predict_grouped: unknown type {type!r}")
    if family not in ("gaussian", "binomial", "poisson", "multinomial"):
        raise ValueError(f"predict_grouped: unknown family {family!r}")
    if type == "class" and family not in ("binomial", "multinomial"):
        raise ValueError(f"predict_grouped: type='class' needs a "
                         f"classification family, not {family!r}")
    features = list(features)
    group_cols = list(group_cols)

    if family == "multinomial":
        return _predict_grouped_multinomial(
            df, coefs, features, group_cols,
            path_idx=path_idx, type=type, out=out, classes=classes,
        )

    if type == "class":
        classes = _resolve_classes(coefs, classes, "predict_grouped")
        if len(classes) != 2:
            raise ValueError(
                f"predict_grouped: binomial needs exactly two classes, "
                f"got {classes}"
            )
    c = _slice_path(coefs.filter(F.col("cls") == 0), group_cols, path_idx)
    # pivot to FLAT double columns (one per coefficient), not a
    # feature->beta map: a per-row map lookup costs an object
    # deserialization per reference, ~30x slower than plain column
    # arithmetic in codegen. Arithmetic is unchanged (missing
    # coefficient -> coalesce to 0.0). Internal join columns carry the
    # ``out`` name as a suffix (like _probs_{out}) so they cannot
    # collide with same-named columns in the scored DataFrame.
    names = [INTERCEPT] + features
    hm = f"_has_model_{out}"
    bname = [f"_beta_{out}_{j}" for j in range(len(names))]
    bflat = c.groupBy(*group_cols).agg(
        F.lit(True).alias(hm),
        *[
            F.max(
                F.when(F.col("feature") == F.lit(nm), F.col("beta"))
            ).alias(bname[j])
            for j, nm in enumerate(names)
        ],
    )
    joined = _join_models(df, bflat, group_cols, [hm, *bname])
    lp = F.coalesce(F.col(bname[0]), F.lit(0.0))
    for j, f in enumerate(features):
        lp = lp + F.coalesce(
            F.col(bname[j + 1]), F.lit(0.0)
        ) * F.col(f).cast("double")
    has = F.col(hm).isNotNull()
    lp = F.when(has, lp)
    if type == "class":
        # lp > 0 <=> response > 0.5; second sorted class is the positive
        # one, matching preprocess_response (R/predict.R:112-121)
        lp = F.when(
            has,
            F.when(lp > 0, F.lit(str(classes[1]))).otherwise(
                F.lit(str(classes[0]))
            ),
        )
    elif type == "response":
        if family == "binomial":
            lp = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp))
        elif family == "poisson":
            lp = F.exp(lp)
    return joined.withColumn(out, lp).drop(hm, *bname)


def _predict_grouped_multinomial(
    df: DataFrame,
    coefs: DataFrame,
    features: list[str],
    group_cols: list[str],
    *,
    path_idx: int | None,
    type: str,
    out: str,
    classes: Sequence[str] | None,
) -> DataFrame:
    """Multinomial per-segment scoring: the coefficient rows pivot to
    FLAT double columns over the (cls, feature) grid (model-sized, ONE
    broadcast join — per-row map lookups would cost an object
    deserialization per coefficient reference, ~30x plain column
    arithmetic), each of the m-1 target lps is its own codegen dot
    product, and the m-class simplex is the stabilized softmax with the
    implicit last class at lp=0 — exactly the dense
    :func:`prague_spark.ops.predict.predict` arithmetic, per segment."""
    classes = _resolve_classes(coefs, classes, "predict_grouped")
    m = len(classes)
    if m < 3:
        raise ValueError(
            f"predict_grouped: multinomial needs > 2 classes, got {classes}"
        )
    c = _slice_path(coefs, group_cols, path_idx)
    names = [INTERCEPT] + features
    # internal columns suffixed with ``out`` (like _probs_{out}) so a
    # same-named user column cannot collide with the broadcast join
    hm = f"_has_model_{out}"

    def bname(t, j):
        return f"_beta_{out}_{t}_{j}"

    bflat = c.groupBy(*group_cols).agg(
        F.lit(True).alias(hm),
        *[
            F.max(
                F.when(
                    (F.col("cls") == t) & (F.col("feature") == F.lit(nm)),
                    F.col("beta"),
                )
            ).alias(bname(t, j))
            for t in range(m - 1)
            for j, nm in enumerate(names)
        ],
    )
    drop_cols = [hm] + [
        bname(t, j) for t in range(m - 1) for j in range(len(names))
    ]
    joined = _join_models(df, bflat, group_cols, drop_cols)
    lps = []
    for t in range(m - 1):
        lp = F.coalesce(F.col(bname(t, 0)), F.lit(0.0))
        for j, f in enumerate(features):
            lp = lp + F.coalesce(
                F.col(bname(t, j + 1)), F.lit(0.0)
            ) * F.col(f).cast("double")
        lps.append(lp)
    has = F.col(hm).isNotNull()
    if type == "link":
        return joined.withColumn(
            out, F.when(has, F.array(*lps))
        ).drop(*drop_cols)
    # stabilized softmax STAGED through temp columns (ops.predict's
    # form): each p-term linear predictor exists once in the plan
    # instead of ~(m+1)^2 times; same op order, values bit-identical
    tmp_l, tmp_e, tmp_d = f"_lps_{out}", f"_exps_{out}", f"_den_{out}"
    a, ae = F.col(tmp_l), F.col(tmp_e)
    joined = (
        joined.withColumn(tmp_l, F.array(*lps, F.lit(0.0)))
        .withColumn(tmp_e, F.transform(a, lambda e: F.exp(e - F.array_max(a))))
        .withColumn(tmp_d, F.aggregate(ae, F.lit(0.0), lambda acc, v: acc + v))
    )
    drop_cols = drop_cols + [tmp_l, tmp_e, tmp_d]
    probs = F.transform(ae, lambda e: e / F.col(tmp_d))
    if type == "response":
        return joined.withColumn(out, F.when(has, probs)).drop(*drop_cols)
    # class: argmax with first-match ties, like ops.predict
    tmp = f"_probs_{out}"
    joined = joined.withColumn(tmp, F.when(has, probs))
    pos = F.array_position(F.col(tmp), F.array_max(F.col(tmp)))
    chain = None
    for i, cls in enumerate(classes):
        cond = pos == F.lit(i + 1)
        chain = (F.when if chain is None else chain.when)(
            cond, F.lit(str(cls))
        )
    return joined.withColumn(out, F.when(has, chain)).drop(tmp, *drop_cols)


def score_grouped(
    df: DataFrame,
    coefs: DataFrame,
    features: Sequence[str],
    label: str,
    group_cols: Sequence[str],
    *,
    family: str = "gaussian",
    measure: str = "mse",
    path_idx: "int | DataFrame | None" = None,
    classes: Sequence[str] | None = None,
) -> DataFrame:
    """Per-segment goodness of fit: :func:`predict_grouped` responses
    aggregated per group — one broadcast join + one groupBy, so scoring
    every segment model over the full table is a single pass. Returns
    (group_cols..., measure, value, n).

    Measure/family grid matches the distributed scorer
    (``ops.cv._OK_MEASURES``, R/score.R semantics): 'mse'/'mae' for
    every family (gaussian/poisson on the response scale; binomial the
    reference's two-term form over (p, 1-p); multinomial the per-class
    mean over the simplex), 'deviance'/'misclass' for binomial and
    multinomial, 'auc' for binomial (the per-segment average-rank
    statistic of ``R/score.R:137-166`` via ops.score.auc_grouped — NULL
    for a single-class segment). Binomial codes the LAST sorted class
    as positive, matching preprocess_response. Class names come from
    ``classes=`` or the coefficient frame's ``classes`` column — never
    an extra scan of ``df``."""
    group_cols = list(group_cols)
    if family == "multinomial":
        return _score_grouped_multinomial(
            df, coefs, features, label, group_cols,
            measure=measure, path_idx=path_idx, classes=classes,
        )
    pred = predict_grouped(
        df, coefs, features, group_cols,
        family=family, path_idx=path_idx, type="response", out="_mu",
    ).filter(F.col("_mu").isNotNull())
    mu = F.col("_mu")
    if family in ("gaussian", "poisson") and measure in ("mse", "mae"):
        err = F.col(label).cast("double") - mu
        agg = F.avg(err * err) if measure == "mse" else F.avg(F.abs(err))
    elif family == "binomial" and measure in (
        "mse", "mae", "deviance", "misclass", "auc"
    ):
        classes = _resolve_classes(coefs, classes, "score_grouped")
        if len(classes) != 2:
            raise ValueError(
                f"score_grouped: binomial needs exactly two classes, got {classes}"
            )
        y2 = F.when(
            F.col(label).cast("string") == F.lit(str(classes[1])), 1.0
        ).otherwise(0.0)
        y1 = F.lit(1.0) - y2
        if measure == "auc":
            from .score import auc_grouped

            return auc_grouped(pred, "_mu", y2, group_cols).select(
                *group_cols,
                F.lit("auc").alias("measure"),
                F.col("auc").alias("value"),
                F.col("_auc_n").cast("long").alias("n"),
            )
        if measure == "mse":
            # the reference's two-term form over (p, 1-p) — R/score.R:29-41
            agg = F.avg((mu + y1 - 1.0) ** 2 + (mu - y2) ** 2)
        elif measure == "mae":
            agg = F.avg(F.abs(mu + y1 - 1.0) + F.abs(mu - y2))
        elif measure == "deviance":
            muc = F.least(F.greatest(mu, F.lit(1e-12)), F.lit(1.0 - 1e-12))
            agg = F.avg(
                -2.0 * (y2 * F.log(muc) + (1.0 - y2) * F.log(1.0 - muc))
            )
        else:
            agg = F.avg(
                F.when((mu > 0.5) != (y2 > 0.5), 1.0).otherwise(0.0)
            )
    else:
        raise ValueError(
            f"score_grouped: measure {measure!r} invalid for {family!r}"
        )
    return pred.groupBy(*group_cols).agg(
        F.lit(measure).alias("measure"),
        agg.alias("value"),
        F.count("*").alias("n"),
    )


def _score_grouped_multinomial(
    df: DataFrame,
    coefs: DataFrame,
    features: Sequence[str],
    label: str,
    group_cols: list[str],
    *,
    measure: str,
    path_idx: int | None,
    classes: Sequence[str] | None,
) -> DataFrame:
    if measure not in ("mse", "mae", "deviance", "misclass"):
        raise ValueError(
            f"score_grouped: measure {measure!r} invalid for 'multinomial'"
        )
    classes = _resolve_classes(coefs, classes, "score_grouped")
    pred = predict_grouped(
        df, coefs, features, group_cols,
        family="multinomial", path_idx=path_idx, type="response",
        out="_probs", classes=classes,
    ).filter(F.col("_probs").isNotNull())
    if measure in ("mse", "mae"):
        # per-class mean over the simplex (R/score.R:29-41 multinomial)
        per_class = None
        for i, cls in enumerate(classes):
            yk = F.when(
                F.col(label).cast("string") == F.lit(str(cls)), 1.0
            ).otherwise(0.0)
            pk = F.col("_probs")[i]
            term = (yk - pk) ** 2 if measure == "mse" else F.abs(yk - pk)
            per_class = term if per_class is None else per_class + term
        agg = F.avg(per_class / float(len(classes)))
    elif measure == "deviance":
        # p of the row's true class: a when-chain over the fixed class
        # list indexing the softmax array (1-based)
        p_true = None
        for i, cls in enumerate(classes):
            cond = F.col(label).cast("string") == F.lit(str(cls))
            p_true = (F.when if p_true is None else p_true.when)(
                cond, F.col("_probs")[i]
            )
        pc = F.least(F.greatest(p_true, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        agg = F.avg(-2.0 * F.log(pc))
    else:
        pos = F.array_position(F.col("_probs"), F.array_max(F.col("_probs")))
        cls_pred = None
        for i, cls in enumerate(classes):
            cls_pred = (F.when if cls_pred is None else cls_pred.when)(
                pos == F.lit(i + 1), F.lit(str(cls))
            )
        agg = F.avg(
            F.when(cls_pred != F.col(label).cast("string"), 1.0).otherwise(0.0)
        )
    return pred.groupBy(*group_cols).agg(
        F.lit(measure).alias("measure"),
        agg.alias("value"),
        F.count("*").alias("n"),
    )


def cv_fit_grouped(
    df: DataFrame,
    features: Sequence[str],
    label: str,
    family: str,
    group_cols: Sequence[str],
    *,
    n_folds: int = 3,
    fold_col: str | None = None,
    measure: str = "mse",
    q: float = 0.2,
    n_sigma: int = 100,
    lambda_min_ratio: float | None = None,
    order_col: str | None = None,
    max_group_rows: int = 2_000_000,
    tol_rel_gap: float = 1e-5,
) -> DataFrame:
    """Per-segment K-fold cross-validation: inside the SAME single
    applyInPandas shuffle as :func:`fit_grouped`, each group runs the
    trainOwl CV recipe in-core (``R/trainOwl.R:44-201`` per segment) —
    an initial full fit fixes the group's sigma grid, each fold refits
    the grid on the held-out complement and scores the fold, and the
    per-sigma mean/se aggregate picks the optimum. One shuffle tunes
    every segment's penalty level concurrently.

    ``fold_col``: an integer column whose value mod ``n_folds`` is the
    fold (deterministic, engine-portable — the same rule the CV oracle
    uses); default hashes the first group column... no default: required,
    to keep fold assignment explicit and reproducible.

    Returns one row per (group, sigma_idx):
    (group_cols..., sigma_idx, sigma, measure, mean, se, is_optimum).
    """
    import numpy as np
    import pandas as pd

    from ..core.ref_fit import numpy_path_fit

    if fold_col is None:
        raise ValueError("cv_fit_grouped: fold_col is required (an integer "
                         "column; fold = value % n_folds)")
    # the distributed CV's measure/family grid (ops.cv._OK_MEASURES)
    # plus the beyond-reference multinomial misclass
    ok_families = {
        "mse": ("gaussian", "poisson", "binomial", "multinomial"),
        "mae": ("gaussian", "poisson", "binomial", "multinomial"),
        "deviance": ("binomial", "multinomial"),
        "misclass": ("binomial", "multinomial"),
        "auc": ("binomial",),
    }
    if measure not in ok_families:
        raise ValueError(f"cv_fit_grouped: unknown measure {measure!r}")
    if family not in ok_families[measure]:
        raise ValueError(
            f"cv_fit_grouped: {measure!r} needs family in "
            f"{ok_families[measure]}, got {family!r}"
        )
    features = list(features)
    group_cols = list(group_cols)

    gfields = [df.schema[c] for c in group_cols]
    schema = StructType(
        [StructField(f.name, f.dataType, True) for f in gfields]
        + [
            StructField("sigma_idx", IntegerType()),
            StructField("sigma", DoubleType()),
            StructField("measure", StringType()),
            StructField("mean", DoubleType()),
            StructField("se", DoubleType()),
            StructField("is_optimum", BooleanType()),
        ]
    )

    cols = list(dict.fromkeys(
        group_cols + features + [label, fold_col]
        + ([order_col] if order_col else [])
    ))

    def _lp(X, B):
        return B[0, 0] + X @ B[1:, 0]

    def _rank_auc(p, y2):
        """Average-rank AUC with tie expectation — the in-core twin of
        ops.score.auc (same statistic, same tie handling)."""
        order = np.argsort(p, kind="mergesort")
        p_s, y_s = p[order], y2[order]
        _, idx = np.unique(p_s, return_index=True)
        n1_g = np.add.reduceat(y_s, idx)
        cnt_g = np.diff(np.append(idx, len(y_s)))
        n0_g = cnt_g - n1_g
        cum0_below = np.concatenate([[0.0], np.cumsum(n0_g)[:-1]])
        n1, n0 = y_s.sum(), len(y_s) - y_s.sum()
        return float((n1_g * (cum0_below + n0_g / 2.0)).sum() / (n1 * n0))

    def _score(X, y, B, classes):
        """Held-out score for one path point. ``classes`` is the GROUP's
        sorted class list, derived once from the full group's labels and
        threaded through every fold — never re-derived from a fold's own
        labels (a single-class held-out fold would silently flip the
        positive-class coding). Measure arithmetic mirrors
        ops.score.measure_from_pred (R/score.R semantics) per family."""
        if family in ("gaussian", "poisson"):
            mu = _lp(X, B)
            if family == "poisson":
                mu = np.exp(mu)
            err = np.asarray(y, dtype=np.float64) - mu
            return float((err * err).mean() if measure == "mse"
                         else np.abs(err).mean())
        ys = np.asarray([str(v) for v in y])
        if family == "binomial":
            y2 = (ys == classes[-1]).astype(float)
            p1 = 1.0 / (1.0 + np.exp(-_lp(X, B)))
            if measure == "mse":
                # the reference's two-term form over (p, 1-p)
                return float(((p1 + (1 - y2) - 1.0) ** 2
                              + (p1 - y2) ** 2).mean())
            if measure == "mae":
                return float((np.abs(p1 + (1 - y2) - 1.0)
                              + np.abs(p1 - y2)).mean())
            if measure == "auc":
                return _rank_auc(p1, y2)
            if measure == "misclass":
                return float(((p1 > 0.5) != (y2 > 0.5)).mean())
            p1 = np.clip(p1, 1e-12, 1.0 - 1e-12)
            return float((-2.0 * (y2 * np.log(p1)
                                  + (1.0 - y2) * np.log(1.0 - p1))).mean())
        # multinomial: stabilized softmax over (m-1) targets + implicit
        # last class, scored like score_grouped
        lps = B[0, :] + X @ B[1:, :]  # (n, m-1)
        lps = np.hstack([lps, np.zeros((len(lps), 1))])
        mx = lps.max(axis=1, keepdims=True)
        ex = np.exp(lps - mx)
        probs = ex / ex.sum(axis=1, keepdims=True)
        yidx = np.searchsorted(np.asarray(classes), ys)
        if measure in ("mse", "mae"):
            onehot = np.zeros_like(probs)
            onehot[np.arange(len(ys)), yidx] = 1.0
            diff = onehot - probs
            per = (diff ** 2 if measure == "mse" else np.abs(diff)).sum(axis=1)
            return float((per / probs.shape[1]).mean())
        if measure == "misclass":
            return float((probs.argmax(axis=1) != yidx).mean())
        p_true = np.clip(probs[np.arange(len(ys)), yidx], 1e-12, 1.0 - 1e-12)
        return float((-2.0 * np.log(p_true)).mean())

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        key = tuple(pdf.iloc[0][c] for c in group_cols)
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"cv_fit_grouped: group {key} has {len(pdf)} rows > "
                f"max_group_rows={max_group_rows}"
            )
        if order_col:
            pdf = pdf.sort_values(order_col, kind="mergesort")
        X = pdf[features].to_numpy(dtype=np.float64)
        y = pdf[label].to_numpy()
        folds = pdf[fold_col].to_numpy().astype(np.int64) % n_folds
        classes: list[str] = []
        if family in ("binomial", "multinomial"):
            ys = np.asarray([str(v) for v in y])
            classes = sorted(set(ys.tolist()))
            if family == "binomial" and len(classes) != 2:
                raise ValueError(
                    f"cv_fit_grouped: group {key}: binomial needs exactly "
                    f"two classes, got {classes}"
                )
            if family == "multinomial" and len(classes) < 3:
                raise ValueError(
                    f"cv_fit_grouped: group {key}: multinomial needs > 2 "
                    f"classes, got {classes}"
                )
        elif family == "poisson" and (y.astype(np.float64) < 0).any():
            raise ValueError(
                f"cv_fit_grouped: group {key}: negative responses in "
                "poisson model"
            )
        full = numpy_path_fit(
            X, y, family, q=q, n_sigma=n_sigma,
            lambda_min_ratio=lambda_min_ratio, tol_rel_gap=tol_rel_gap,
        )
        sig = full["sigma"]
        scores = np.empty((n_folds, len(sig)))
        for f in range(n_folds):
            tr = folds != f
            if tr.all() or not tr.any():
                raise ValueError(
                    f"cv_fit_grouped: group {key}: fold {f} is empty or "
                    "holds every row — check fold_col"
                )
            if classes:
                # every fold must see every class: >= 2 per class in the
                # training part (mirroring fit_grouped's check — the
                # refit is degenerate otherwise, and its fold-local class
                # coding would silently diverge from the group's) and
                # >= 1 per class held out (a single-class holdout makes
                # the fold's score a biased constant). Loud beats either.
                for part, side, lo in ((tr, "training", 2),
                                       (~tr, "held-out", 1)):
                    import collections

                    cnt = collections.Counter(ys[part].tolist())
                    bad = [c for c in classes if cnt.get(c, 0) < lo]
                    if bad:
                        raise ValueError(
                            f"cv_fit_grouped: group {key}: fold {f}'s "
                            f"{side} rows have < {lo} observation(s) of "
                            f"class(es) {bad} — use a stratified fold_col "
                            "or fewer folds for this segment"
                        )
            fit = numpy_path_fit(
                X[tr], y[tr], family, q=q, sigma=sig,
                tol_rel_gap=tol_rel_gap,
            )
            for si in range(len(sig)):
                scores[f, si] = _score(X[~tr], y[~tr], fit["betas"][si],
                                       classes)
        mean = scores.mean(axis=0)
        se = scores.std(axis=0, ddof=1) / np.sqrt(n_folds)
        # direction-aware optimum: every loss measure minimizes, auc
        # MAXIMIZES. Deliberate delta from the distributed twin, which
        # reference-exactly replicates trainOwl's which.min-on-everything
        # (R/trainOwl.R:165, see ops.cv._aggregate's note): the grouped
        # layer is greenfield, and cv_optimum_path feeds is_optimum
        # straight into scoring — argmin on auc would silently select
        # every segment's WORST model.
        best = int(np.argmax(mean) if measure == "auc" else np.argmin(mean))
        out: dict = {c: [v] * len(sig) for c, v in zip(group_cols, key)}
        out.update(
            sigma_idx=list(range(len(sig))),
            sigma=[float(s) for s in sig],
            measure=[measure] * len(sig),
            mean=[float(v) for v in mean],
            se=[float(v) for v in se],
            is_optimum=[si == best for si in range(len(sig))],
        )
        return pd.DataFrame(out)

    return df.select(*cols).groupBy(*group_cols).applyInPandas(_solve, schema)
