"""Deterministic sampling operators for repeatable training-data curation.

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines or cluster layouts; curation pipelines instead sample on a
content-derived hash so that (a) the same document always makes the same
cut regardless of where it lands, (b) the sample is exactly reproducible
in any engine with md5 (the DuckDB oracle runs the same predicate), and
(c) downsampling ratios can differ per stratum (language/source mixing —
the data-mixture knob of LLM corpus construction).

Zero shuffle: the whole operator is one codegen filter projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_unit(id_col: str):
    """Uniform-[0,1) deterministic hash of the id: first 8 hex digits of
    md5(id) over 2^32. Exact in any engine: 32-bit int, exact double."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash_unit(id) < fractions[stratum] (strata not
    in ``fractions`` use ``default_fraction``). Per-stratum sampled
    fraction converges to the requested rate; membership is stable under
    repartitioning, engine changes, and incremental reruns."""
    frac = F.lit(float(default_fraction))
    for key, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == key, F.lit(float(f))).otherwise(frac)
    return df.withColumn("_u", hash_unit(id_col)).filter(
        F.col("_u") < frac
    ).drop("_u")


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any named) split: each row gets
    the label whose cumulative-weight interval contains
    hash_unit(id || salt) — stable under repartitioning, reruns, engine
    changes, and corpus growth (a row's split never flips when other
    rows arrive; change ``salt`` for an independent re-split). Weights
    are normalized; label intervals follow sorted(label) order so the
    assignment is a pure function of (id, salt, weights).

    Zero shuffle — one md5 projection; the 100 TB split is free."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = _hash_unit_expr(F.col(id_col), F.lit(salt)) if salt else hash_unit(id_col)
    acc = 0.0
    expr = None
    labels = sorted(weights)
    for lab in labels[:-1]:
        acc += float(weights[lab]) / total
        expr = (
            F.when(u < acc, F.lit(lab))
            if expr is None
            else expr.when(u < acc, F.lit(lab))
        )
    last = F.lit(labels[-1])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))


def _hash_unit_expr(*cols):
    """Uniform-[0,1) hash of the ':'-joined column values (exact in any
    engine with md5 — the DuckDB oracle runs the same arithmetic)."""
    h = F.md5(F.concat_ws(":", *[c.cast("string") for c in cols]))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )


def mix_corpus(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Materialize a training mixture whose per-stratum weights may
    EXCEED 1 — the upsampling half of data mixing (:func:`stratified_sample`
    is the downsampling half). Weight w emits floor(w) full copies of
    every document plus the fractional remainder as a deterministic
    hash-threshold sample; each copy carries an ``epoch_col`` index so
    downstream shuffling/packing treats repeats as distinct rows (hash
    repeats on (id, epoch) — see :func:`shard_assign` — and they spread).

    w = 2.5 -> epochs {0, 1} always, epoch 2 iff
    hash(id:2) < 0.5; w = 0.25 -> plain 25% sample. Deterministic: the
    same corpus + weights yields byte-identical mixtures on any engine,
    partitioning, or rerun.

    Scale: one generator-explode projection, ZERO shuffle; output volume
    is exactly the mixture size (sum_s w_s * |stratum_s|), never an
    intermediate blow-up."""
    if float(default_weight) < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight!r}")
    bad = {k: v for k, v in weights.items() if float(v) < 0}
    if bad:
        raise ValueError(f"weights must be >= 0, got {bad!r}")
    w = F.lit(float(default_weight))
    for key, v in sorted(weights.items()):
        w = F.when(F.col(strata_col) == key, F.lit(float(v))).otherwise(w)
    out = (
        df.withColumn("_w", w)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.floor("_w").cast("int"))),
        )
        .filter(
            (F.col(epoch_col) < F.floor("_w").cast("int"))
            | (
                _hash_unit_expr(F.col(id_col), F.col(epoch_col))
                < F.col("_w") - F.floor("_w")
            )
        )
        .drop("_w")
    )
    return out


def shard_assign(
    df: DataFrame,
    id_cols,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    order_col: str = "order_key",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the writer
    primitive for training shards: ``shard`` = md5 bucket in
    [0, n_shards), ``order_col`` = the md5 hex digest (a uniform random
    but reproducible sort key). Writing
    ``df.repartition(n_shards, shard_col).sortWithinPartitions(order_col)``
    then yields a fully shuffled, byte-reproducible shard layout with NO
    global sort: shard sizes concentrate tightly at n/n_shards
    (binomial), and in-shard order is the hash order.

    ``id_cols`` may be a single column name or a list (pass
    ``[id, epoch]`` for a :func:`mix_corpus` output so upsampled copies
    of a document scatter across shards instead of clumping). ``salt``
    re-deals the entire layout — a new shuffle per training epoch from
    the same corpus."""
    if isinstance(id_cols, str):
        id_cols = [id_cols]
    h = F.md5(
        F.concat_ws(
            ":", *[F.col(c).cast("string") for c in id_cols], F.lit(salt)
        )
    )
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return df.withColumn(
        shard_col, F.pmod(bucket, F.lit(int(n_shards))).cast("int")
    ).withColumn(order_col, h)


def zorder_key(
    df: DataFrame,
    col_bounds: dict[str, tuple[float, float]],
    bits: int = 16,
    out: str = "zorder",
) -> DataFrame:
    """Z-order (Morton) interleave key over 2+ numeric columns — the
    multi-dimensional layout primitive: write the table sorted by this
    key (``repartitionByRange(out).sortWithinPartitions(out)``) and
    min/max footer stats make scans with predicates on ANY of the
    interleaved columns skip most files, not just the leading sort
    column.

    ``col_bounds``: {column: (lo, hi)} — each value is clamped to the
    bounds and scaled to a ``bits``-bit integer, then the per-column bits
    are interleaved LSB-first. Bounds are explicit (compute them once
    with an agg, or use domain knowledge) so the key is a deterministic
    pure-integer codegen expression — no sampling, no UDF, no shuffle;
    total bits = len(cols) * bits must fit a long (<= 62)."""
    cols = list(col_bounds)
    if len(cols) < 2:
        raise ValueError("zorder_key: need at least 2 columns")
    n = len(cols)
    if n * bits > 62:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} > 62 key bits"
        )
    cells = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = (float(x) for x in col_bounds[c])
        if not hi > lo:
            raise ValueError(f"zorder_key: bounds for {c!r} must have hi > lo")
        # clamp -> [0, 1] -> floor to [0, 2^bits)
        unit = (
            F.least(
                F.greatest(F.col(c).cast("double"), F.lit(lo)), F.lit(hi)
            ) - F.lit(lo)
        ) / F.lit(hi - lo)
        cells.append(
            F.least(F.floor(unit * F.lit(float(1 << bits))).cast("long"),
                    F.lit(top).cast("long"))
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, cell in enumerate(cells):
            key = key + F.shiftleft(
                F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return df.withColumn(out, key)


def stratified_topk(
    df: DataFrame, id_col: str, strata_col: str, k: int
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer if the stratum is smaller),
    selected as the k smallest id-hashes — the deterministic way to carve
    a fixed-size eval set per language/source: membership is stable under
    reruns and ingestion order, and adding documents later only evicts
    the largest-hash members.

    One shuffle (window partitioned by stratum). A pathologically large
    stratum makes its sort the straggler; for fraction-style downsampling
    at that scale use :func:`stratified_sample`, which is shuffle-free."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy("_u", id_col)
    return (
        df.withColumn("_u", hash_unit(id_col))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_u", "_rk")
    )
