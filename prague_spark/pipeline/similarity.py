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


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


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
    Returns (query_id, id, cosine, rank <= k)."""
    vec = F.col(vec_col)
    per_query = []
    for qid, qv in queries:
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        per_query.append(
            F.struct(
                F.lit(int(qid)).alias("query_id"),
                (
                    _dot(vec, qlit) / (_norm(vec) * F.lit(float(np.linalg.norm(qv))))
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
    (argmax over a literal centroid array — no UDF, no shuffle)."""
    vec = F.col(vec_col)
    sims = [
        _dot(vec, F.array(*[F.lit(float(x)) for x in c])) / _norm(vec)
        for c in centroids
    ]
    best = F.greatest(*sims)
    cell = None
    for i, s in enumerate(sims):
        cond = s == best
        cell = F.when(cond, F.lit(i)) if cell is None else cell.when(cond, F.lit(i))
    return corpus.withColumn(out, cell)


def ivf_topk(
    corpus_with_cells: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    cell_col: str = "cell",
) -> DataFrame:
    """Probed ANN search: for each query only the ``nprobe`` closest cells
    are scanned (partition-pruned when the corpus is written partitioned by
    cell). Returns the same schema as ``cosine_topk``."""
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


def write_ivf_index(
    corpus: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    path: str,
    cell_col: str = "cell",
) -> None:
    """Materialize the IVF layout: corpus parquet partitioned by cell id.

    Probing then reads ONLY the nprobe matching partitions (Spark
    partition pruning on the directory structure) — at 100 TB a top-k
    query touches nprobe/n_cells of the data instead of scanning it all."""
    assign_ivf_cells(corpus, vec_col, centroids, out=cell_col).write.mode(
        "overwrite"
    ).partitionBy(cell_col).parquet(path)


def read_ivf_index(spark, path: str) -> DataFrame:
    """Load a written IVF index; filters on the cell column prune
    partitions (verify with .explain: PartitionFilters)."""
    return spark.read.parquet(path)


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
    bucket are near-duplicate candidates (join key, no pairwise scan)."""
    if dim is None:
        first = df.select(F.size(vec_col)).first()
        dim = int(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    vec = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for i, pl in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(float(x)) for x in pl]))
        bucket = bucket + F.when(proj > 0, F.lit(int(2**i)).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out, bucket)
