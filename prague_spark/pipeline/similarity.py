"""Similarity search over embedding columns (`array<float>`).

Greenfield additions beyond the reference surface (SURVEY.md §7.9):

- brute-force cosine top-k: broadcast the (small) query set, dot products
  as JVM-side higher-order functions (`zip_with` + `aggregate`), per-query
  rank window. One scan of the corpus, no corpus shuffle — the baseline.
- IVF (inverted-file) top-k: k-means centroids trained driver-side on a
  sample, each corpus vector assigned to its nearest centroid once
  (cheap projection + tiny shuffle), queries probe only the ``nprobe``
  nearest cells — the standard sub-linear ANN layout at 100 TB scale.
- random-hyperplane LSH bucketing for cosine near-dup joins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _lit_vec(xs) -> "F.Column":
    """A literal double array as ONE split-cast string literal.

    ``F.array(*[F.lit(x) ...])`` (and ``F.lit(list)``) cost ~8 s of
    driver-side analysis at 2^14 elements — per-item py4j calls plus a
    CreateArray with that many children walked per analyzer rule. One
    string literal constant-folds to a bit-identical array (``repr``
    round-trips doubles exactly) in ~0.09 s, and executes faster than
    CreateArray too. Use for any literal vector whose length scales with
    a model dimension."""
    return F.split(
        F.lit(",".join(repr(float(x)) for x in xs)), ","
    ).cast("array<double>")


def _lit_mat(rows) -> "F.Column":
    """A literal double MATRIX (array<array<double>>) as ONE folded
    Literal via ``from_json``.

    The nested ``F.array(*[F.array(*[F.lit(x) ...]) ...])`` form costs
    one py4j round-trip per scalar to BUILD and an analyzer/optimizer
    walk over K*dim AST nodes on EVERY action — measured ~1 s of
    driver time per action for an 8x64 centroid table, ~3 s for the
    ivfpq probe/LUT trees, paid again by every run because each
    rebuilt DataFrame re-plans. ``from_json`` of one string literal
    builds in O(1) py4j calls and ConstantFolding collapses it to a
    single array Literal before codegen, so both the per-action
    planning cost and the plan size stop scaling with the model
    dimensions. Values round-trip bit-exactly (shortest-repr JSON
    doubles); finite values only — JSON has no NaN/Inf, and every
    centroid/codebook table here is finite by construction."""
    import json

    payload = json.dumps([[float(x) for x in r] for r in rows])
    return F.from_json(F.lit(payload), "array<array<double>>")


def _norm(a):
    return F.sqrt(_dot(a, a))


def _norm_safe(a):
    """Norm floored at 1e-12 — the denominator form every operator here
    divides by. A dead/padded all-zero vector would otherwise be a HARD
    JOB FAILURE under ANSI mode (Spark 4 default: DIVIDE_BY_ZERO), or a
    NaN that sorts above every real score with ANSI off. Identical
    doubles for any nonzero vector, so the SQL oracles (which divide by
    the raw sqrt) keep hash-matching; zero vectors score ~0 and rank
    last — the literal-query twins' max(|q|, 1e-12) convention."""
    return F.greatest(_norm(a), F.lit(1e-12))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm_safe(a) * _norm_safe(b))


def _exact_rerank_scores(cand: DataFrame, id_col: str, vec_col: str,
                         queries: list[tuple[int, list[float]]]) -> DataFrame:
    """Exact cosine of each shortlist candidate against ITS OWN query:
    literal maps query_id -> (vector, norm) + one ``element_at`` lookup
    per row, so the intermediate is O(|candidates|) — never the
    O(Q x |candidates|) all-query explode-then-filter (quadratic in Q
    with ~tens of thousands of queries). Same arithmetic as the inlined
    per-query literals: the looked-up array feeds the identical
    zip_with/aggregate fold and the norm is the same double literal."""
    qids = F.array(*[F.lit(int(qid)) for qid, _ in queries])
    # one folded literal per table (see _lit_mat/_lit_vec): the map
    # values must not re-cost |Q| x dim AST nodes per action
    qvecs = F.map_from_arrays(qids, _lit_mat([qv for _, qv in queries]))
    qnorms = F.map_from_arrays(
        qids,
        _lit_vec([max(float(np.linalg.norm(qv)), 1e-12)
                  for _, qv in queries]),
    )
    score = _dot(F.col(vec_col), F.element_at(qvecs, F.col("query_id"))) / (
        _norm_safe(F.col(vec_col)) * F.element_at(qnorms, F.col("query_id"))
    )
    return cand.select("query_id", id_col, score.alias("score"))


def cosine_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, vector) pairs, broadcast as literal expressions
    — the plan is a single corpus scan + per-query aggregation-free rank.
    Returns (query_id, id, cosine, rank <= k).

    Plan width grows linearly in |Q| (one literal vector + dot per
    query); this is the EXACT small-query-set oracle — a large query
    set wants an index: :func:`ivf_knn_join` / :func:`ivfpq_knn_join`
    take queries as ROWS with constant plan width."""
    vec = F.col(vec_col)
    # the query vectors as ONE folded literal table (element_at per
    # query) instead of |Q| x dim AST nodes re-analyzed per action
    qmat = _lit_mat([qv for _, qv in queries])
    per_query = []
    for qi, (qid, qv) in enumerate(queries):
        qlit = F.element_at(qmat, qi + 1)
        per_query.append(
            F.struct(
                F.lit(int(qid)).alias("query_id"),
                (
                    _dot(vec, qlit)
                    / (_norm_safe(vec) * F.lit(max(float(np.linalg.norm(qv)), 1e-12)))
                ).alias("cosine"),
            )
        )
    exploded = corpus.select(
        F.col(id_col), F.explode(F.array(*per_query)).alias("q")
    ).select(id_col, "q.query_id", "q.cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF: coarse quantizer + probed search
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side mini k-means on a corpus sample (normalized vectors, so
    euclidean k-means ~ spherical k-means for cosine)."""
    pdf = (
        corpus.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_rows)
        .toPandas()
    )
    X = np.asarray(np.vstack(pdf[vec_col].to_numpy()), dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        for c in range(C.shape[0]):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def assign_ivf_cells(
    corpus: DataFrame, vec_col: str, centroids: np.ndarray, out: str = "cell"
) -> DataFrame:
    """Nearest-centroid cell id per vector, as pure column expressions
    (argmax over a literal centroid array — no UDF, no shuffle).

    The argmax is ONE array of raw centroid dots probed with
    array_position(sims, array_max(sims)) — 1-based first match, so
    ties break to the lowest cell id, matching the when-chain this
    replaces UP TO ROUNDING: dropping the per-row norm division is
    argmax-invariant in exact arithmetic, but in floats it can
    create/remove knife-edge exact ties, so a vector that tied under
    the old normalized sims may route to a different (equally-nearest)
    cell now. Consequence: an IVF layout written with the pre-change
    assignment should be REBUILT, not appended to, across this change —
    fresh assignments of the same vector can disagree with the stored
    cell on tie rows. Two deliberate leannesses: the
    per-row norm division is dropped (a positive per-row constant
    cannot change which dot is largest, modulo the tie caveat above),
    and the dot subtrees appear
    ~2x in the expression instead of ~(n+1)x (greatest + an n-branch
    when-chain re-inlined every sim) — at 100 TB the assignment is the
    hot codegen projection under every gate/append, and the old form's
    n_centroids-fold expression blowup cost multi-second driver
    analysis/compile per plan (measured 4-5x wall on the SemDeDup
    self-join at 8x64)."""
    vec = F.col(vec_col)
    # the assign_pq_codes form: the centroid table is ONE nested array
    # literal and the dots are ONE transform lambda over it, so the
    # fold expression exists once regardless of n_centroids (literals
    # are data, not per-centroid expression subtrees) — the plan stays
    # O(dim) in expression count even at embed_centroids=1024
    cents = _lit_mat(centroids)
    # the sims array is let-bound (single-element-transform form) before
    # the argmax: array_position + array_max are two references, and an
    # inlined sims would embed the K-dot tree twice in the plan
    sims = F.transform(cents, lambda cv: _dot(vec, cv))
    argmax = F.get(
        F.transform(
            F.array(sims),
            lambda sm: (
                F.array_position(sm, F.array_max(sm)) - F.lit(1)
            ).cast("int"),
        ),
        0,
    )
    return corpus.withColumn(out, argmax)


def ivf_topk(
    corpus_with_cells: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    cell_col: str = "cell",
    max_queries: int | None = 64,
) -> DataFrame:
    """Probed ANN search: for each query only the ``nprobe`` closest cells
    are scanned (partition-pruned when the corpus is written partitioned by
    cell). Returns the same schema as ``cosine_topk``.

    The plan unions one probed slice PER QUERY (literal plan growth in
    ``len(queries)``) — right for a handful of ad-hoc queries against a
    pruned layout; a large query SET belongs in :func:`ivf_knn_join`,
    whose query side is ROWS (constant plan width in |Q|). That routing
    is ENFORCED: more than ``max_queries`` queries (default 64) are
    re-dispatched through :func:`ivf_knn_join` (same output schema and
    tie-breaks; cosines may differ in the last float bits because the
    query norm folds into the plan instead of NumPy) rather than
    building a thousand-branch union plan. ``max_queries=None`` disables
    the route for callers who explicitly want the literal form."""
    if max_queries is not None and len(queries) > int(max_queries):
        spark = corpus_with_cells.sparkSession
        qdf = spark.createDataFrame(
            [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
            "query_id bigint, qvec array<double>",
        )
        return ivf_knn_join(
            qdf, corpus_with_cells, centroids, k=k, nprobe=nprobe,
            query_id_col="query_id", corpus_id_col=id_col,
            corpus_vec_col=vec_col, cell_col=cell_col,
        )
    Cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    results = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        probe_cells = np.argsort(-(Cn @ qn))[:nprobe].tolist()
        sub = corpus_with_cells.filter(F.col(cell_col).isin(probe_cells))
        results.append(cosine_topk(sub, id_col, vec_col, [(qid, qv)], k))
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def ivf_knn_candidates(
    queries: DataFrame,
    corpus_idx: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "vec",
    cell_col: str = "cell",
    broadcast_queries: bool = True,
) -> DataFrame:
    """The candidate generator under :func:`ivf_knn_join` — probe-cell
    explode on the query side, cell EQUI-join against the indexed
    corpus, one exact cosine per candidate — WITHOUT the final rank
    window, so it runs on a STREAMING query frame too (stream-static
    equi-join; the twin is ``streaming.similarity.knn_join_stream``).
    Returns (query_id, corpus_id, cosine) — every probed candidate."""
    qv = F.col(query_vec_col)
    # norm floor mirrors the literal-query twins' max(|q|, 1e-12): an
    # all-zero query row would otherwise emit NaN cosines, and NaN sorts
    # ABOVE every double — garbage at rank 1. Same double for any real
    # vector, so existing oracles are unchanged.
    qn = F.greatest(_norm(qv), F.lit(1e-12))
    C = np.asarray(centroids, dtype=np.float64)
    # ONE folded centroid/norm literal + an index-lambda transform
    # (same dots, same divide — bit-identical scores) instead of K
    # per-centroid literal trees rebuilt and re-analyzed per action
    cmat = _lit_mat(C)
    cnrm = _lit_vec([float(np.linalg.norm(c)) for c in C])
    entries = F.transform(
        cmat,
        lambda c, i: F.struct(
            (-(_dot(qv, c) / (qn * F.element_at(cnrm, i + 1)))).alias(
                "negsim"
            ),
            i.alias("ci"),
        ),
    )
    # struct sort = (negsim asc, ci asc) = cosine desc with cell-id ties
    probe_cells = F.transform(
        F.slice(F.array_sort(entries), 1, int(nprobe)),
        lambda s: s["ci"],
    )
    qx = queries.select(
        F.col(query_id_col),
        qv.alias("_qv"),
        qn.alias("_qn"),
        F.explode(probe_cells).alias(cell_col),
    )
    if broadcast_queries:
        from pyspark.sql.functions import broadcast as _bc

        qx = _bc(qx)
    cvec = F.col(corpus_vec_col)
    # corpus norm floored too: a dead/padded all-zero corpus row must
    # score ~0 (rank last), never NaN (rank FIRST under DESC)
    cn = F.greatest(_norm(cvec), F.lit(1e-12))
    return corpus_idx.join(qx, cell_col).select(
        F.col(query_id_col),
        F.col(corpus_id_col),
        (_dot(cvec, F.col("_qv")) / (cn * F.col("_qn"))).alias("cosine"),
    )


def ivf_knn_join(
    queries: DataFrame,
    corpus_idx: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "vec",
    cell_col: str = "cell",
    broadcast_queries: bool = True,
) -> DataFrame:
    """k-NN JOIN: approximate top-k corpus neighbors for EVERY row of a
    query DataFrame — the many-queries form of :func:`ivf_topk`, which
    takes queries as literal expressions and therefore stops scaling at
    a few hundred (plan width grows per query; a million-row query table
    cannot be a plan). Here both sides stay DataFrames:

    1. each query row computes its cosine to the literal centroid table
       (pure codegen) and explodes its ``nprobe`` best cells — ties on a
       centroid ranked by cell id, deterministically;
    2. an EQUI-JOIN on the cell column matches queries to exactly the
       corpus partitions they probe (broadcast the query side while it
       fits — default — else a shuffle join that AQE skew-splits);
    3. one exact cosine per candidate + a per-query rank window.

    Candidate volume is the IVF bound sum_q |probed cells of q| — never
    the |Q| x |corpus| cross product; with the corpus written
    ``partitionBy(cell)`` the join prunes at the scan. Returns
    (query_id, corpus_id, cosine, rank <= k)."""
    if queries.isStreaming or corpus_idx.isStreaming:
        raise ValueError("ivf_knn_join: batch DataFrames only")
    cand = ivf_knn_candidates(
        queries, corpus_idx, centroids, nprobe=nprobe,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        corpus_id_col=corpus_id_col, corpus_vec_col=corpus_vec_col,
        cell_col=cell_col, broadcast_queries=broadcast_queries,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(corpus_id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, corpus_id_col, "cosine", "rank")
    )


def write_ivf_index(
    corpus: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    path: str,
    cell_col: str = "cell",
    save_model: bool = True,
) -> None:
    """Materialize the IVF layout: corpus parquet partitioned by cell id.

    Probing then reads ONLY the nprobe matching partitions (Spark
    partition pruning on the directory structure) — at 100 TB a top-k
    query touches nprobe/n_cells of the data instead of scanning it all.
    ``save_model`` (default) persists the centroids as an underscore-
    prefixed sidecar inside the directory (restore with
    :func:`load_ivfpq_model` on ``{path}/_ivfpq_model``; codebooks come
    back None for this one-level index)."""
    assign_ivf_cells(corpus, vec_col, centroids, out=cell_col).write.mode(
        "overwrite"
    ).partitionBy(cell_col).parquet(path)
    if save_model:
        import os

        save_ivfpq_model(
            corpus.sparkSession, os.path.join(path, "_ivfpq_model"),
            centroids, None,
        )


def read_ivf_index(spark, path: str) -> DataFrame:
    """Load a written IVF index; filters on the cell column prune
    partitions (verify with .explain: PartitionFilters)."""
    return spark.read.parquet(path)


def append_ivf_index(
    corpus: DataFrame,
    vec_col: str,
    path: str,
    cell_col: str = "cell",
    check_overlap: bool | str = False,
) -> None:
    """Grow a written :func:`write_ivf_index` layout with a NEW shard
    using the index's own FROZEN centroids (the model sidecar): the
    one-level analogue of :func:`append_ivfpq_index`, and the
    roll-forward of the SemDeDup embedding tier — assign the shard's
    cells with the stored constants (pure codegen, no shuffle) and
    append only its files into their cell directories. Because the
    centroids are frozen, the grown layout is EQUIVALENT to rebuilding
    from the union with the same constants (pinned in tests) at
    O(shard) cost, and partition-pruned probes/gates keep reading only
    matching cells of the grown corpus.

    Guards mirror :func:`append_ivfpq_index`: a missing sidecar fails
    loud (appending with retrained centroids would split identical
    vectors across incompatible cell spaces); a PQ sidecar means the
    layout is an IVF-PQ index — use :func:`append_ivfpq_index`; column
    names AND types must match the written layout (the partition
    column exempt: directory-name encoded). Distribution drift of an
    append-only corpus degrades cell balance gracefully — retrain +
    rebuild deliberately, as with the two-level index.

    NOTE: ids are NOT overlap-checked against the layout by default
    (that would cost an index-wide scan per append — the in-place
    form's whole point is O(shard)); re-appending an id silently
    duplicates its row, which doubles its pairs in a SemDeDup gate and
    its k-NN hits. Append gate-keepers only, or use
    ``curate.extend_curation_artifacts``, whose successor-directory
    rewrite pays the scan anyway and so DOES fail loud on overlap.
    Callers who can afford one column-pruned semi-join per append can
    opt in with ``check_overlap``: pass the id column's name (or
    ``True`` when the layout's only non-vector data column is the id —
    the canonical ``(id, vec)`` shape) and a shard carrying any id
    already in the layout raises instead of silently duplicating."""
    import os

    spark = corpus.sparkSession
    model_path = os.path.join(path, "_ivfpq_model")
    try:
        centroids, codebooks = load_ivfpq_model(spark, model_path)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(
            f"append_ivf_index: no readable model sidecar at "
            f"{model_path!r} — appending with retrained centroids would "
            "make old and new cell assignments incompatible; was the "
            "index written with save_model=True?"
        ) from e
    if codebooks is not None:
        raise ValueError(
            f"append_ivf_index: the sidecar at {model_path!r} carries "
            "PQ codebooks — this is an IVF-PQ layout; grow it with "
            "append_ivfpq_index"
        )
    written = spark.read.parquet(path).schema
    existing = {f.name for f in written.fields}
    want_cols = set(corpus.columns) | {cell_col}
    if want_cols != existing:
        raise ValueError(
            f"append_ivf_index: shard would write columns "
            f"{sorted(want_cols)} but the written layout has "
            f"{sorted(existing)} — project the shard to the layout's "
            "columns first"
        )
    out = assign_ivf_cells(corpus, vec_col, centroids, out=cell_col)
    want_t = {f.name: f.dataType for f in written.fields}
    got_t = {f.name: f.dataType for f in out.schema.fields}
    mismatched = sorted(
        n for n in want_t
        if n != cell_col and got_t.get(n) != want_t[n]
    )
    if mismatched:
        detail = ", ".join(
            f"{n}: index={want_t[n].simpleString()} "
            f"shard={got_t[n].simpleString()}"
            for n in mismatched
        )
        raise ValueError(
            f"append_ivf_index: shard column type(s) differ from the "
            f"written layout ({detail}) — appending would write "
            "mixed-schema files; cast the shard to the layout's types "
            "first"
        )
    if check_overlap:
        if check_overlap is True:
            candidates = sorted(existing - {cell_col, vec_col})
            if len(candidates) != 1:
                raise ValueError(
                    "append_ivf_index: check_overlap=True cannot infer "
                    f"the id column — the layout's non-vector data "
                    f"columns are {candidates}; pass the id column's "
                    "name as check_overlap instead"
                )
            id_col = candidates[0]
        else:
            id_col = check_overlap
            if id_col not in existing:
                raise ValueError(
                    f"append_ivf_index: check_overlap column "
                    f"{id_col!r} is not in the written layout "
                    f"({sorted(existing)})"
                )
        # the extend_curation_artifacts overlap discipline, opt-in:
        # one column-pruned semi-join count over the layout's id column
        n_overlap = (
            corpus.select(F.col(id_col)).distinct()
            .join(spark.read.parquet(path).select(id_col), id_col,
                  "left_semi")
            .count()
        )
        if n_overlap:
            raise ValueError(
                f"append_ivf_index: {n_overlap} shard id(s) are already "
                "in the layout — re-appending duplicates their rows "
                "(doubling their SemDeDup pairs and k-NN hits); append "
                "NEW docs only"
            )
    out.write.mode("append").partitionBy(cell_col).parquet(path)


# ---------------------------------------------------------------------------
# PQ: product quantization + asymmetric-distance (ADC) search
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    n_subvectors: int = 8,
    n_codes: int = 16,
    sample_rows: int = 10_000,
    iters: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side product-quantization training: split each (normalized)
    vector into ``n_subvectors`` contiguous blocks and k-means each block
    independently on a corpus sample. Returns codebooks shaped
    (n_subvectors, n_codes, dim/n_subvectors).

    PQ compresses a d-dim float vector to ``n_subvectors`` small ints —
    at 100 TB that is the difference between an index that fits in
    executor memory and one that doesn't (64 floats -> 8 bytes at
    n_codes<=256). Training is a driver artifact like the IVF centroids:
    O(sample) work, broadcast as literals afterwards."""
    pdf = (
        corpus.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_rows)
        .toPandas()
    )
    X = np.asarray(np.vstack(pdf[vec_col].to_numpy()), dtype=np.float64)
    return pq_kmeans(X, n_subvectors, n_codes, iters=iters, seed=seed)


def pq_kmeans(
    X: np.ndarray,
    n_subvectors: int,
    n_codes: int,
    iters: int = 15,
    seed: int = 42,
    normalize: bool = True,
) -> np.ndarray:
    """The pure-NumPy PQ training core (deterministic given X and seed):
    normalize rows (skip for residual inputs, which are not unit-norm by
    construction), then independent k-means per contiguous block. Shared
    by train_pq_codebooks / train_ivfpq and the registry's
    pinned-codebook oracle."""
    X = np.asarray(X, dtype=np.float64)
    if normalize:
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n, d = X.shape
    if d % n_subvectors:
        raise ValueError(
            f"pq_kmeans: dim {d} not divisible by n_subvectors={n_subvectors}"
        )
    dsub = d // n_subvectors
    rng = np.random.default_rng(seed)
    books = np.empty((n_subvectors, n_codes, dsub))
    for m in range(n_subvectors):
        Xm = X[:, m * dsub:(m + 1) * dsub]
        C = Xm[rng.choice(n, size=min(n_codes, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xm[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(C.shape[0]):
                members = Xm[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[m] = C
    return books


def assign_pq_codes(
    df: DataFrame,
    vec_col: str,
    codebooks: np.ndarray,
    out: str = "pq_code",
    normalize: bool = True,
) -> DataFrame:
    """Per-row PQ codes as PURE column expressions (``array<int>``,
    length n_subvectors): for each block, the nearest codebook row by
    squared euclidean — argmax of (x.c - |c|^2/2), a literal-dot
    when-chain exactly like assign_ivf_cells. No UDF, no shuffle; the
    expression count is n_subvectors*n_codes (keep n_codes modest, e.g.
    16-64, for codegen — past that, precompute the codes at write time).

    ``normalize``: code the L2-normalized vector (cosine regime, matches
    train_pq_codebooks)."""
    M, K, dsub = codebooks.shape
    vec = F.col(vec_col)
    # Two deliberate plan-size choices (a naive K x M when-chain of
    # inlined dot folds costs ~40 s of driver-side ANALYSIS and >10 MiB
    # task binaries at K=16):
    # 1. the normalized vector is a staged temp column, so the norm fold
    #    exists once, not inside every score;
    # 2. each block's K scores are ONE transform over a struct-literal
    #    codebook (vector + precomputed |c|^2/2), and the argmax is
    #    array_position(scores, array_max(scores)) — first-match on the
    #    exact score, the same tie-break as a when-chain.
    nv = f"_pq_nv_{out}"
    if normalize:
        nrm = _norm_safe(vec)
        df = df.withColumn(nv, F.transform(vec, lambda x: x / nrm))
    else:
        df = df.withColumn(nv, vec)
    codes = []
    for m in range(M):
        block = F.slice(F.col(nv), m * dsub + 1, dsub)
        # folded literal codebook + half-norm tables (zip_with replaces
        # the struct array — same K scores, bit-identical arithmetic)
        cbm = _lit_mat(codebooks[m])
        hnm = _lit_vec([float(np.dot(c, c) / 2.0) for c in codebooks[m]])
        scores = F.zip_with(cbm, hnm, lambda cv, hn: _dot(block, cv) - hn)
        # let-bind scores before the argmax (see assign_ivf_cells): an
        # inlined scores would embed the K-dot subvector tree twice
        codes.append(
            F.get(
                F.transform(
                    F.array(scores),
                    lambda sc: (
                        F.array_position(sc, F.array_max(sc)) - 1
                    ).cast("int"),
                ),
                0,
            )
        )
    return df.withColumn(out, F.array(*codes)).drop(nv)


def reconstruct_pq(
    df: DataFrame,
    code_col: str,
    codebooks: np.ndarray,
    out: str = "recon_vec",
    centroids: np.ndarray | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """Decode PQ codes back to approximate vectors, as PURE column
    expressions: per block, one ``element_at`` on the literal codebook
    table, concatenated with ``flatten`` — no UDF, no shuffle, so a
    corpus stored as 8-byte codes re-materializes approximate floats at
    scan speed. With ``centroids`` the codes are treated as IVF-PQ
    RESIDUAL codes (``assign_ivfpq``): the assigned cell's centroid adds
    back per element, reconstructing normalized(v) ~ centroid[cell] +
    decode(residual codes).

    The decode path every compressed consumer needs — feed the result
    to :func:`ivf_knn_join` / :func:`cosine_topk` to run float
    operators over a codes-only corpus."""
    M, K, dsub = np.asarray(codebooks).shape
    code = F.col(code_col)
    blocks = [
        F.element_at(
            _lit_mat(codebooks[m]),
            F.element_at(code, m + 1) + F.lit(1),
        )
        for m in range(M)
    ]
    recon = F.flatten(F.array(*blocks))
    if centroids is not None:
        cents = _lit_mat(centroids)
        recon = F.zip_with(
            recon,
            F.element_at(cents, F.col(cell_col) + 1),
            lambda r, c: r + c,
        )
    return df.withColumn(out, recon)


def pq_adc_topk(
    corpus_with_codes: DataFrame,
    id_col: str,
    code_col: str,
    codebooks: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    rerank_vec_col: str | None = None,
    shortlist: int = 50,
    max_queries: int | None = 64,
) -> DataFrame:
    """Asymmetric-distance top-k: per query, a lookup table
    lut[m][j] = q_m . c_{m,j} is computed driver-side (M x K floats) and
    the per-row score is sum_m lut[m][code_m] — M ``element_at`` lookups
    on literal arrays, zero UDF, one corpus scan for ALL queries.

    With ``rerank_vec_col`` set, the ADC ranking only builds a
    ``shortlist`` of candidates per query and the final top-k is exact
    cosine over the shortlist (the standard two-stage PQ search: the
    compressed index prunes, full vectors re-rank). Returns
    (query_id, id, score, rank): score is the ADC approximation, or the
    exact cosine when re-ranking.

    Each query adds its own M*K literals to the plan (linear growth in
    |Q|), so more than ``max_queries`` queries (default 64) FAIL LOUD —
    flat PQ has no row-sided twin; for a large query set, add a coarse
    level (:func:`train_ivfpq` + :func:`assign_ivfpq`) and call
    :func:`ivfpq_knn_join`, whose query side is ROWS. Batch smaller
    sets, or pass ``max_queries=None`` to accept the plan cost."""
    if max_queries is not None and len(queries) > int(max_queries):
        raise ValueError(
            f"pq_adc_topk: {len(queries)} queries > max_queries="
            f"{max_queries} — each query adds an M*K-literal lookup "
            "table to the plan. Batch the queries, or build an IVF-PQ "
            "index (train_ivfpq/assign_ivfpq) and use ivfpq_knn_join "
            "(row-sided queries, constant plan width), or pass "
            "max_queries=None to accept the plan cost."
        )
    M, K, dsub = codebooks.shape
    code = F.col(code_col)
    per_query = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        luts = [qn[m * dsub:(m + 1) * dsub] @ codebooks[m].T for m in range(M)]
        score = None
        for m in range(M):
            lut = _lit_vec(luts[m])
            term = F.element_at(lut, F.element_at(code, m + 1) + F.lit(1))
            score = term if score is None else score + term
        per_query.append(
            F.struct(F.lit(int(qid)).alias("query_id"), score.alias("score"))
        )
    keep = [id_col] + ([rerank_vec_col] if rerank_vec_col else [])
    exploded = corpus_with_codes.select(
        *keep, F.explode(F.array(*per_query)).alias("q")
    ).select(*keep, "q.query_id", "q.score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    ranked = exploded.withColumn("rank", F.row_number().over(w))
    if not rerank_vec_col:
        return ranked.filter(F.col("rank") <= k).select(
            "query_id", id_col, "score", "rank"
        )
    # two-stage: ADC shortlist -> exact cosine re-rank, O(Q x shortlist)
    cand = ranked.filter(F.col("rank") <= shortlist).drop("rank", "score")
    exact = _exact_rerank_scores(cand, id_col, rerank_vec_col, queries)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + product-quantized residuals (IndexIVFPQ)
# ---------------------------------------------------------------------------

def train_ivfpq(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 8,
    n_subvectors: int = 8,
    n_codes: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the two-level IVF-PQ index on one corpus sample: spherical
    k-means coarse centroids, then PQ codebooks on the coarse RESIDUALS
    (normalized vector minus its assigned centroid — residuals carry far
    less variance than raw vectors, so the same code budget quantizes
    them much more finely; the standard IndexIVFPQ recipe). Returns
    (centroids (C, d), codebooks (M, K, d/M))."""
    pdf = (
        corpus.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_rows)
        .toPandas()
    )
    X = np.asarray(np.vstack(pdf[vec_col].to_numpy()), dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    resid = X - C[np.argmax(X @ C.T, axis=1)]
    books = pq_kmeans(resid, n_subvectors, n_codes, iters=iters, seed=seed,
                      normalize=False)
    return C, books


def assign_ivfpq(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    cell_col: str = "cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """The IVF-PQ index columns, all pure codegen: coarse ``cell`` (the
    assign_ivf_cells argmax), then PQ codes of the residual
    normalized(vec) - centroid[cell] (one element_at on the literal
    centroid table + a zip_with subtraction; codes via assign_pq_codes
    with normalize=False — residuals are not unit vectors). Write the
    result partitioned by cell and an ANN query reads nprobe partitions
    of 8-byte codes instead of the full float corpus."""
    vec = F.col(vec_col)
    df = assign_ivf_cells(df, vec_col, centroids, out=cell_col)
    cents = _lit_mat(centroids)
    nrm = _norm_safe(vec)
    resid = F.zip_with(
        F.transform(vec, lambda x: x / nrm),
        F.element_at(cents, F.col(cell_col) + 1),
        lambda x, c: x - c,
    )
    rcol = f"_ivfpq_resid_{code_col}"
    df = df.withColumn(rcol, resid)
    return assign_pq_codes(
        df, rcol, codebooks, out=code_col, normalize=False
    ).drop(rcol)


def ivfpq_topk(
    corpus_idx: DataFrame,
    id_col: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    cell_col: str = "cell",
    code_col: str = "pq_code",
    rerank_vec_col: str | None = None,
    shortlist: int = 50,
    max_queries: int | None = 64,
) -> DataFrame:
    """Probed compressed search over an assign_ivfpq index: per query,
    only the ``nprobe`` nearest cells are scanned (partition pruning on a
    cell-partitioned layout) and each candidate is scored WITHOUT its
    float vector — score = q.centroid[cell] (a literal lookup) + the
    residual ADC sum (M element_at lookups), approximating the cosine
    q.v_hat. With ``rerank_vec_col``, an exact cosine re-rank of the
    ADC ``shortlist`` finishes the standard two-stage search.

    Each query adds its OWN M*K-literal lookup table to the plan, so a
    large query set belongs in :func:`ivfpq_knn_join` (query side =
    ROWS, constant plan width in |Q|, same scoring per its candidates'
    docstring). Enforced like :func:`ivf_topk`'s guard: more than
    ``max_queries`` queries (default 64) re-dispatch through
    :func:`ivfpq_knn_join` (same output schema and tie-breaks);
    ``max_queries=None`` keeps the literal form."""
    if max_queries is not None and len(queries) > int(max_queries):
        spark = corpus_idx.sparkSession
        qdf = spark.createDataFrame(
            [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
            "query_id bigint, qvec array<double>",
        )
        return ivfpq_knn_join(
            qdf, corpus_idx, centroids, codebooks, k=k, nprobe=nprobe,
            query_id_col="query_id", corpus_id_col=id_col,
            cell_col=cell_col, code_col=code_col,
            rerank_vec_col=rerank_vec_col, shortlist=shortlist,
        )
    M, K, dsub = codebooks.shape
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    code = F.col(code_col)
    # ONE scan for all queries: per row, an array of (query_id, score)
    # structs filtered to the queries whose probe set contains this
    # row's cell, then explode + one rank window. (A per-query plan
    # would re-analyze the scoring tree len(queries) times.)
    per_query = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        probes = np.argsort(-(Cn @ qn))[:nprobe].tolist()
        celldot = _lit_vec(centroids @ qn)
        score = F.element_at(celldot, F.col(cell_col) + 1)
        for m in range(M):
            lut = qn[m * dsub:(m + 1) * dsub] @ codebooks[m].T
            term = F.element_at(
                _lit_vec(lut),
                F.element_at(code, m + 1) + F.lit(1),
            )
            score = score + term
        per_query.append(
            F.struct(
                F.lit(int(qid)).alias("query_id"),
                score.alias("score"),
                F.col(cell_col).isin(probes).alias("probed"),
            )
        )
    keep = [id_col] + ([rerank_vec_col] if rerank_vec_col else [])
    exploded = corpus_idx.select(
        *keep,
        F.explode(
            F.filter(F.array(*per_query), lambda s: s["probed"])
        ).alias("q"),
    ).select(*keep, "q.query_id", "q.score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    ranked = exploded.withColumn("rank", F.row_number().over(w))
    if not rerank_vec_col:
        return ranked.filter(F.col("rank") <= k).select(
            "query_id", id_col, "score", "rank"
        )
    cand = ranked.filter(F.col("rank") <= shortlist).drop("rank", "score")
    exact = _exact_rerank_scores(cand, id_col, rerank_vec_col, queries)
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def write_ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    cell_col: str = "cell",
    code_col: str = "pq_code",
    keep_vec: bool = False,
    save_model: bool = True,
) -> None:
    """Materialize the compressed index layout: (id, cell, codes[, vec])
    parquet PARTITIONED BY cell. The two-level analogue of
    :func:`write_ivf_index` — a probed search (:func:`ivfpq_topk`) or a
    compressed k-NN join (:func:`ivfpq_knn_join`) over the written
    layout reads only the nprobe matching partitions of 8-byte codes,
    nprobe/n_cells of an already ~100x-compressed corpus.
    ``keep_vec=False`` (default) drops the float vectors — the
    codes-only layout; re-rank via ``rerank_codes=True`` or
    :func:`reconstruct_pq`.

    ``save_model`` (default) also persists the centroids + codebooks as
    an underscore-prefixed sidecar INSIDE the index directory (ignored
    by parquet scans of the index itself), so a later session restores
    the whole searchable index with :func:`read_ivfpq_index` — no
    retraining, no hand-rolled np.save."""
    idx = assign_ivfpq(
        corpus, vec_col, centroids, codebooks,
        cell_col=cell_col, code_col=code_col,
    )
    cols = [id_col, cell_col, code_col] + ([vec_col] if keep_vec else [])
    idx.select(*cols).write.mode("overwrite").partitionBy(cell_col).parquet(
        path
    )
    if save_model:
        # AFTER the index write: mode("overwrite") above clears the dir
        import os

        save_ivfpq_model(
            corpus.sparkSession, os.path.join(path, "_ivfpq_model"),
            centroids, codebooks,
        )


def append_ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    cell_col: str = "cell",
    code_col: str = "pq_code",
) -> None:
    """Grow a written :func:`write_ivfpq_index` layout with a NEW shard
    of vectors using the index's own FROZEN constants: restore
    centroids + codebooks from the model sidecar, encode the shard
    (the same pure-codegen :func:`assign_ivfpq` pass as the original
    build), and APPEND its rows into the cell-partitioned parquet.
    Because the model is frozen, the grown index is EQUIVALENT to
    rebuilding from (old corpus ∪ shard) with the same constants —
    pinned bit-exactly in tests — at O(shard) cost: one assignment scan
    plus an append of only the shard's files into their cell
    directories. No retraining, no corpus rewrite, and partition-pruned
    probes keep reading nprobe/n_cells of the GROWN corpus: the
    per-crawl-snapshot shape of a production ANN index. The model
    sidecar is untouched (underscore-prefixed, invisible to scans).

    Appending shifts the data distribution away from the constants the
    original sample trained — recall on the appended region degrades
    gracefully (assignment stays exact for the frozen model) but a
    corpus that has drifted far deserves a retrain + rewrite; that
    trade is the caller's, this function only keeps the encode
    consistent. The layout's columns are schema-validated first: the
    shard keeps vectors iff the written index kept them — a silent
    keep_vec mismatch would leave half the index un-rerankable."""
    import os

    spark = corpus.sparkSession
    model_path = os.path.join(path, "_ivfpq_model")
    try:
        centroids, codebooks = load_ivfpq_model(spark, model_path)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(
            f"append_ivfpq_index: no readable model sidecar at "
            f"{model_path!r} — appending with retrained constants would "
            "make the old and new codes mutually un-decodable; was the "
            "index written with save_model=True?"
        ) from e
    if codebooks is None:
        raise ValueError(
            f"append_ivfpq_index: the sidecar at {model_path!r} has no "
            "codebooks (an IVF-only model) — it cannot encode PQ codes"
        )
    written = spark.read.parquet(path).schema
    existing = {f.name for f in written.fields}
    keep_vec = vec_col in existing
    cols = [id_col, cell_col, code_col] + ([vec_col] if keep_vec else [])
    if set(cols) != existing:
        raise ValueError(
            f"append_ivfpq_index: shard would write columns "
            f"{sorted(cols)} but the written layout has "
            f"{sorted(existing)} — id/cell/code column names must match "
            "the original write_ivfpq_index call"
        )
    idx = assign_ivfpq(
        corpus, vec_col, centroids, codebooks,
        cell_col=cell_col, code_col=code_col,
    )
    out = idx.select(*cols)
    # types too, not just names: appending e.g. a string-id shard into a
    # long-id layout writes mixed-schema files that only fail (or
    # silently coerce) at a later read of the index. The partition
    # column is exempt — its values round-trip through directory names,
    # so its read-back type is inference policy, not a layout property.
    want_t = {f.name: f.dataType for f in written.fields}
    got_t = {f.name: f.dataType for f in out.schema.fields}
    mismatched = sorted(
        n for n in want_t
        if n != cell_col and got_t.get(n) != want_t[n]
    )
    if mismatched:
        detail = ", ".join(
            f"{n}: index={want_t[n].simpleString()} "
            f"shard={got_t[n].simpleString()}"
            for n in mismatched
        )
        raise ValueError(
            f"append_ivfpq_index: shard column type(s) differ from the "
            f"written layout ({detail}) — appending would write "
            "mixed-schema files that break or coerce at a later read; "
            "cast the shard to the layout's types first"
        )
    out.write.mode("append").partitionBy(cell_col).parquet(path)


def save_ivfpq_model(spark, path: str, centroids, codebooks=None) -> None:
    """Persist the ANN index's DRIVER constants — coarse centroids and
    (optionally) PQ codebooks — as a small parquet, so a LATER session
    can probe a written index without retraining (the gap
    :func:`write_ivfpq_index` alone left: the codes parquet is useless
    without the constants that decode it). One row per vector:
    (kind, i, j, vals) with kind 'centroid' (i = cell id, j = 0) or
    'codebook' (i = block m, j = code id). Doubles round-trip exactly
    through parquet, so probes over a restored model are bit-identical."""
    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2 or not C.size:
        raise ValueError(
            f"save_ivfpq_model: centroids must be a non-empty 2-D array, "
            f"got shape {C.shape}"
        )
    rows = [
        ("centroid", int(i), 0, [float(x) for x in C[i]])
        for i in range(C.shape[0])
    ]
    if codebooks is not None:
        books = np.asarray(codebooks, dtype=np.float64)
        if books.ndim != 3 or not books.size:
            raise ValueError(
                f"save_ivfpq_model: codebooks must be a 3-D (M, K, dsub) "
                f"array, got shape {books.shape}"
            )
        M, K, dsub = books.shape
        if M * dsub != C.shape[1]:
            raise ValueError(
                f"save_ivfpq_model: codebooks reconstruct dim {M}*{dsub}="
                f"{M * dsub} but centroids have dim {C.shape[1]}"
            )
        rows += [
            ("codebook", int(m), int(j), [float(x) for x in books[m, j]])
            for m in range(M)
            for j in range(K)
        ]
    spark.createDataFrame(
        rows, "kind string, i int, j int, vals array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_ivfpq_model(spark, path: str):
    """Restore :func:`save_ivfpq_model` constants. Returns
    ``(centroids, codebooks)`` — ``codebooks`` is None for an IVF-only
    model. Shape-validates on load (contiguous ids, uniform dims): a
    truncated or hand-mangled sidecar must fail here, not as silent
    garbage scores."""
    rows = spark.read.parquet(path).collect()
    cents = {(r["i"]): list(r["vals"]) for r in rows if r["kind"] == "centroid"}
    if not cents or sorted(cents) != list(range(len(cents))):
        raise ValueError(
            f"load_ivfpq_model: {path!r} has non-contiguous or missing "
            f"centroid ids {sorted(cents)[:8]}..."
        )
    dims = {len(v) for v in cents.values()}
    if len(dims) != 1:
        raise ValueError(
            f"load_ivfpq_model: centroid dims are not uniform: {sorted(dims)}"
        )
    C = np.asarray([cents[i] for i in range(len(cents))], dtype=np.float64)
    book_rows = [r for r in rows if r["kind"] == "codebook"]
    if not book_rows:
        return C, None
    keys = {(r["i"], r["j"]) for r in book_rows}
    M = 1 + max(k[0] for k in keys)
    K = 1 + max(k[1] for k in keys)
    if len(keys) != M * K:
        raise ValueError(
            f"load_ivfpq_model: codebook grid is ragged — expected "
            f"{M}x{K}={M * K} rows, got {len(keys)}"
        )
    bdims = {len(r["vals"]) for r in book_rows}
    if len(bdims) != 1:
        raise ValueError(
            f"load_ivfpq_model: codebook dims are not uniform: {sorted(bdims)}"
        )
    dsub = bdims.pop()
    if M * dsub != C.shape[1]:
        raise ValueError(
            f"load_ivfpq_model: codebooks reconstruct dim {M}*{dsub}="
            f"{M * dsub} but centroids have dim {C.shape[1]}"
        )
    books = np.empty((M, K, dsub))
    for r in book_rows:
        books[int(r["i"]), int(r["j"])] = r["vals"]
    return C, books


def read_ivfpq_index(spark, path: str):
    """Load a :func:`write_ivfpq_index` layout AND its model sidecar in
    one call: returns ``(index_df, centroids, codebooks)`` ready for
    :func:`ivfpq_topk` / :func:`ivfpq_knn_join`. Fails loud when the
    sidecar is absent (an index written before round 10, or with
    ``save_model=False`` — load the constants from wherever they were
    kept and use ``spark.read.parquet`` directly)."""
    import os

    model_path = os.path.join(path, "_ivfpq_model")
    try:
        C, books = load_ivfpq_model(spark, model_path)
    except Exception as e:
        raise ValueError(
            f"read_ivfpq_index: no readable model sidecar at "
            f"{model_path!r} — was the index written with "
            f"save_model=True?"
        ) from e
    return spark.read.parquet(path), C, books


def ivfpq_knn_candidates(
    queries: DataFrame,
    corpus_idx: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_id_col: str = "vec_id",
    cell_col: str = "cell",
    code_col: str = "pq_code",
    keep_cols: "Sequence[str] | None" = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """The candidate generator under :func:`ivfpq_knn_join`: every
    probed (query, candidate) pair scored by residual ADC over the PQ
    codes column — no float corpus vector is ever touched. Query-side
    work is all per-row codegen over the LITERAL index constants:

    1. stage the normalized query once (``_qnv``), rank the literal
       centroid table by cosine and explode the ``nprobe`` best cells,
       carrying each probed cell's ``q . centroid[cell]`` dot (the term
       the ADC score starts from — exactly :func:`ivfpq_topk`'s
       ``celldot`` lookup, computed per query ROW instead of per query
       literal);
    2. build the residual lookup table ``lut[m][j] = q_m . codebook[m,j]``
       as ONE flat array column of M*K doubles (:func:`pq_adc_topk`
       computes the same numbers driver-side with numpy; a DataFrame of
       queries computes them as codegen folds — plan width constant in
       |Q|);
    3. cell EQUI-join against the (cell, codes) index; per candidate the
       score is ``celldot + sum_m lut[m*K + code_m]`` — M array lookups,
       zero UDF, and the candidate volume is the IVF bound
       sum_q |probed cells of q|.

    ``keep_cols``: extra corpus columns to carry through (e.g. the float
    vector / the code columns for a re-rank stage). Returns
    (query_id, corpus_id, *keep_cols, _qv, _qn, score)."""
    C = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    M, K, dsub = books.shape
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    qv = F.col(query_vec_col)
    # norm floor = ivfpq_topk's max(|q|, 1e-12): a zero query must score
    # ~0 (and rank last), never NaN (which sorts first under DESC)
    qx = queries.select(
        F.col(query_id_col), qv.alias("_qv"),
        F.greatest(_norm(qv), F.lit(1e-12)).alias("_qn"),
    ).withColumn(
        # staged once: the norm fold must not re-inline into every
        # centroid / codebook dot below (the assign_pq_codes lesson)
        "_qnv", F.transform(F.col("_qv"), lambda x: x / F.col("_qn"))
    )
    qnv = F.col("_qnv")
    # probe ranking by cosine to the numpy-normalized centroid literals
    # (ivfpq_topk's argsort over Cn @ qn); celldot keeps the RAW-centroid
    # dot its ADC score opens with (centroids @ qn). The centroid and
    # codebook tables are ONE folded literal each (_lit_mat) with an
    # index-lambda transform — same dots in the same order, but the plan
    # no longer carries K*dim + M*K*dsub AST nodes re-analyzed per
    # action (~3 s of driver time per run at the bench shapes).
    cmat = _lit_mat(C)
    cnmat = _lit_mat(Cn)
    entries = F.transform(
        cnmat,
        lambda cn, i: F.struct(
            (-_dot(qnv, cn)).alias("negsim"),
            i.alias("ci"),
            _dot(qnv, F.element_at(cmat, i + 1)).alias("celldot"),
        ),
    )
    probes = F.slice(F.array_sort(entries), 1, int(nprobe))
    # flat (M*K, dsub) codebook table, m-major like the flatten it
    # replaces: lut[m*K + j] = q_m . codebook[m, j]
    bmat = _lit_mat(books.reshape(M * K, dsub))
    lut = F.transform(
        bmat,
        lambda cb, j: _dot(
            F.slice(
                qnv,
                (j / F.lit(int(K))).cast("int") * F.lit(int(dsub)) + 1,
                int(dsub),
            ),
            cb,
        ),
    )
    qx = (
        qx.withColumn("_lut", lut)
        .withColumn("_pc", F.explode(probes))
        .select(
            F.col(query_id_col),
            "_qv",
            "_qn",
            "_lut",
            F.col("_pc.ci").alias(cell_col),
            F.col("_pc.celldot").alias("_celldot"),
        )
    )
    if broadcast_queries:
        from pyspark.sql.functions import broadcast as _bc

        qx = _bc(qx)
    code = F.col(code_col)
    score = F.col("_celldot")
    for m in range(M):
        score = score + F.element_at(
            F.col("_lut"), F.lit(m * K) + F.element_at(code, m + 1) + F.lit(1)
        )
    return corpus_idx.join(qx, cell_col).select(
        F.col(query_id_col),
        F.col(corpus_id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("_qv"),
        F.col("_qn"),
        score.alias("score"),
    )


def ivfpq_knn_join(
    queries: DataFrame,
    corpus_idx: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_id_col: str = "vec_id",
    cell_col: str = "cell",
    code_col: str = "pq_code",
    rerank_vec_col: str | None = None,
    rerank_codes: bool = False,
    shortlist: int = 50,
    broadcast_queries: bool = True,
) -> DataFrame:
    """COMPRESSED k-NN JOIN: approximate top-k corpus neighbors for
    every row of a query DataFrame, scored by residual ADC over the PQ
    ``code_col`` — the form a 100 TB codes-only corpus needs.
    :func:`ivf_knn_join` requires the float vectors on every candidate;
    :func:`ivfpq_topk` takes queries as literal expressions (plan width
    grows per query). This operator is the missing cell of that grid:
    queries stay a DataFrame (millions of rows fine), candidates never
    decode — see :func:`ivfpq_knn_candidates` for the plan shape.

    Re-ranking the per-query ADC ``shortlist`` with exact cosine (the
    standard two-stage search) has two forms:

    - ``rerank_vec_col``: the corpus retains float vectors — exact
      cosine against the carried query vector;
    - ``rerank_codes=True``: codes-only corpus — the shortlist (and
      ONLY the shortlist, O(Q x shortlist) rows) is decoded with
      :func:`reconstruct_pq` (+ the cell centroid) and scored against
      the query; the approximation error is the PQ quantization error.

    Returns (query_id, corpus_id, score, rank <= k): ``score`` is the
    ADC approximation, or the (reconstructed-)exact cosine when
    re-ranking."""
    if queries.isStreaming or corpus_idx.isStreaming:
        raise ValueError("ivfpq_knn_join: batch DataFrames only")
    if rerank_vec_col and rerank_codes:
        raise ValueError(
            "ivfpq_knn_join: rerank_vec_col and rerank_codes are exclusive"
        )
    keep = []
    if rerank_vec_col:
        keep = [rerank_vec_col]
    elif rerank_codes:
        keep = [cell_col, code_col]
    cand = ivfpq_knn_candidates(
        queries, corpus_idx, centroids, codebooks, nprobe=nprobe,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        corpus_id_col=corpus_id_col, cell_col=cell_col, code_col=code_col,
        keep_cols=keep, broadcast_queries=broadcast_queries,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(corpus_id_col).asc()
    )
    ranked = cand.withColumn("rank", F.row_number().over(w))
    if not (rerank_vec_col or rerank_codes):
        return ranked.filter(F.col("rank") <= k).select(
            query_id_col, corpus_id_col, "score", "rank"
        )
    short = ranked.filter(F.col("rank") <= int(shortlist)).drop(
        "rank", "score"
    )
    if rerank_vec_col:
        cvec = F.col(rerank_vec_col)
    else:
        short = reconstruct_pq(
            short, code_col, codebooks, out="_rv",
            centroids=centroids, cell_col=cell_col,
        )
        cvec = F.col("_rv")
    exact = short.select(
        F.col(query_id_col),
        F.col(corpus_id_col),
        (
            _dot(cvec, F.col("_qv"))
            / (F.greatest(_norm(cvec), F.lit(1e-12)) * F.col("_qn"))
        ).alias("score"),
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, corpus_id_col, "score", "rank")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 16,
    dim: int | None = None,
    seed: int = 42,
    out: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane signature for cosine LSH: bucket id packs the sign
    bits of ``n_planes`` fixed random projections. Vectors in the same
    bucket are near-duplicate candidates (join key, no pairwise scan).

    ``n_planes`` is capped at 63: the bucket id packs one sign bit per
    plane as ``2**i`` into a SIGNED 64-bit long, so planes 1..63 use
    bits 0..62 and sum to at most ``2**63 - 1`` (Long.MaxValue); a 64th
    plane would need ``F.lit(2**63)``, which fails analysis with an
    opaque overflow. 63 bits of blocking is already astronomically
    finer than any useful bucket granularity — band multiple
    independent signatures instead."""
    if not 1 <= n_planes <= 63:
        raise ValueError(
            f"hyperplane_lsh_buckets: n_planes={n_planes} must be in "
            "1..63 — the bucket id packs one sign bit per plane into a "
            "signed 64-bit long, whose 63 value bits fit planes 1..63 "
            "(use n_bands of smaller signatures for more planes)"
        )
    if dim is None:
        first = df.select(F.size(vec_col)).first()
        dim = int(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    vec = F.col(vec_col)
    # the whole plane table is ONE folded literal (_lit_mat) and the
    # sign-bit pack is one index-lambda transform + integer-exact sum
    # (shiftleft(1L, i) == 2**i), so the plan carries O(1) literal nodes
    # instead of n_planes dot trees — the banded LSH caller builds many
    # of these per query and was paying the analysis per band per action
    terms = F.transform(
        _lit_mat(planes),
        lambda pl, i: F.when(
            _dot(vec, pl) > 0,
            # call_function: the F.shiftleft wrapper types numBits as a
            # Python int and rejects the index column
            F.call_function("shiftleft", F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long")),
    )
    bucket = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, t: acc + t
    )
    return df.withColumn(out, bucket)
