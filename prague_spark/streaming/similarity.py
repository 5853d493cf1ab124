"""Streaming ANN: a stream of query vectors probing a STATIC IVF-indexed
corpus — the online-retrieval / at-ingest near-dup-check twin of
``pipeline.similarity.ivf_topk`` (same coarse quantizer, same probed-cell
pruning), mirroring the stream-static design of ``streaming.dedup``:
every per-row step is a pure column expression or an equi-join against a
static frame, so Structured Streaming runs it STATELESSLY in append mode
with zero state store.

Greenfield (no reference counterpart — the reference is an in-core GLM
library); the batch/stream parity contract is pinned in
``tests/test_streaming.py``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def ivf_candidates_stream(
    queries: DataFrame,
    qid_col: str,
    qvec_col: str,
    corpus_with_cells: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    nprobe: int = 4,
    cell_col: str = "cell",
) -> DataFrame:
    """Probed ANN candidates for a STREAM of query vectors against a
    static IVF corpus: each arriving query explodes into its ``nprobe``
    nearest cells and stream-static equi-joins
    the corpus on the cell id — only nprobe/n_cells of the corpus is
    scanned per query, exactly the batch ``ivf_topk`` pruning. A corpus
    vector belongs to ONE cell, so every (query, candidate) pair is
    emitted exactly once — no per-band duplication caveat.

    Output: append-mode (query_id, id, cosine) candidate rows. All of a
    query's candidates co-arrive in its micro-batch, so exact top-k is a
    per-batch window in the sink:

        def sink(batch_df, _):
            w = Window.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col(id_col))
            batch_df.withColumn("rank", F.row_number().over(w)) \\
                .filter(F.col("rank") <= k)...

    Persist ``corpus_with_cells`` — every micro-batch probes it.

    Implemented as the batch k-NN join's candidate generator
    (``pipeline.similarity.ivf_knn_candidates``) — ONE expression tree
    serves ivf_knn_join, knn_join_stream, and this legacy-signature
    wrapper, so there is a single probe-ranking/cosine arithmetic to
    keep in sync."""
    from ..pipeline.similarity import ivf_knn_candidates

    return ivf_knn_candidates(
        queries.select(
            F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("_qsv")
        ),
        # project to exactly the three consumed columns: extra corpus
        # columns named like the query side's internals (query_id, _qv)
        # would otherwise make the join's references ambiguous
        corpus_with_cells.select(id_col, vec_col, cell_col),
        centroids,
        nprobe=nprobe,
        query_id_col="query_id",
        query_vec_col="_qsv",
        corpus_id_col=id_col,
        corpus_vec_col=vec_col,
        cell_col=cell_col,
        broadcast_queries=False,
    )


def knn_join_stream(
    queries: DataFrame,
    corpus_idx: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "vec",
    cell_col: str = "cell",
) -> DataFrame:
    """The streaming twin of ``pipeline.similarity.ivf_knn_join``: a
    STREAM of query rows k-NN-joined against a static IVF-indexed
    corpus. Same candidate plan as the batch operator — it IS the batch
    operator's :func:`~prague_spark.pipeline.similarity.
    ivf_knn_candidates` (probe-cell explode, stream-static cell
    EQUI-join, exact cosine), identical expressions, so batch/stream
    parity is structural. Stateless append mode: no watermark, no state
    store.

    Output: (query_id, corpus_id, cosine) candidate rows. All of a
    query's candidates co-arrive in its micro-batch, so exact top-k is
    a per-batch rank window in the sink (:func:`topk_batch`):

        cands.writeStream.foreachBatch(
            lambda b, _: sink(topk_batch(b, k=10))).start()

    Persist ``corpus_idx`` — every micro-batch probes it."""
    from ..pipeline.similarity import ivf_knn_candidates

    return ivf_knn_candidates(
        queries, corpus_idx, centroids, nprobe=nprobe,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        corpus_id_col=corpus_id_col, corpus_vec_col=corpus_vec_col,
        cell_col=cell_col,
        # the query side is the stream: broadcasting a streaming frame
        # is not planable; the static corpus side broadcasts per batch
        # when small under AQE
        broadcast_queries=False,
    )


def knnpq_join_stream(
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
    keep_cols: "list[str] | None" = None,
) -> DataFrame:
    """The streaming twin of ``pipeline.similarity.ivfpq_knn_join``'s
    candidate stage: a STREAM of query rows residual-ADC-scored against
    a static CODES-ONLY IVF-PQ corpus — no float corpus vector touched,
    so the static side an online retrieval service keeps resident is
    the ~100x-compressed index. Every per-row step (normalize, probe
    ranking, the M*K lookup-table folds) is a pure projection and the
    join is stream-static on the cell id: stateless append mode,
    identical expressions to the batch operator
    (:func:`~prague_spark.pipeline.similarity.ivfpq_knn_candidates`).

    Output: (query_id, corpus_id, *keep_cols, score) ADC candidates;
    exact top-k is a per-batch window in the sink — :func:`topk_batch`
    with ``score_col='score'``. For a sink-side decode re-rank, pass
    ``keep_cols=[cell_col, code_col]`` so ``reconstruct_pq`` has the
    columns it needs on the k survivors.

    Persist ``corpus_idx`` — every micro-batch probes it."""
    from ..pipeline.similarity import ivfpq_knn_candidates

    keep = list(keep_cols or [])
    return ivfpq_knn_candidates(
        queries, corpus_idx, centroids, codebooks, nprobe=nprobe,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        corpus_id_col=corpus_id_col, cell_col=cell_col, code_col=code_col,
        keep_cols=keep, broadcast_queries=False,
    ).select(query_id_col, corpus_id_col, *keep, "score")


def topk_batch(
    batch_df: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    score_col: str = "cosine",
) -> DataFrame:
    """Per-micro-batch exact top-k over :func:`knn_join_stream` /
    :func:`knnpq_join_stream` candidates — the rank window the batch
    join appends, applied inside ``foreachBatch`` where windows are
    legal. Same (score desc, id asc) tie-break as the batch operators.
    ALL input columns survive (plus ``rank``), so carried ``keep_cols``
    — e.g. the codes for a sink-side decode re-rank — stay available on
    the k survivors."""
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col(score_col).desc(), F.col(corpus_id_col).asc()
    )
    return batch_df.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
