"""Streaming deduplication: bounded-state exact dedup and stateless
MinHash signatures for a document stream.

Batch dedup (pipeline.dedup) assumes the full corpus is visible; a
streaming ingest pipeline instead sees documents arrive continuously and
must bound its state. Two building blocks:

- exact dedup via ``dropDuplicatesWithinWatermark`` on the content hash:
  Spark keeps one state row per distinct key only until the event-time
  watermark passes it, so state is bounded by the duplicate-arrival
  horizon (a duplicate arriving later than the watermark delay is
  re-emitted — the documented, deliberately bounded semantic);
- MinHash signatures as a pure stateless projection: the per-document
  signature needs no aggregation state at all when computed as
  ``array_min`` over the token hash array, so it runs at source
  parallelism and feeds any downstream batch LSH banding job.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..pipeline.dedup import MERSENNE, _minhash_params, _token_int_expr
from ..pipeline.text import tokens_expr


def exact_dedup_stream(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen exact deduplication of a document stream, keyed on
    md5(text), with state evicted once the watermark passes — the
    bounded-state streaming analogue of ``pipeline.dedup.exact_dedup``."""
    keyed = stream_df.withColumn("_content_md5", F.md5(F.col(text_col)))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["_content_md5"]
    )


def minhash_signature_expr(
    text: Column, num_hashes: int = 32, seed: int = 42
) -> Column:
    """MinHash signature as ONE stateless array expression (no explode,
    no aggregation): h_i = min over distinct tokens of
    (a_i * md5_32(token) + b_i) mod (2^31 - 1). Identical numbers to the
    batch ``pipeline.dedup.minhash_signatures`` (same hash family, same
    md5-derived token ints), but usable in any streaming projection.

    The md5-token-int array is let-bound (single-element-transform
    form, the expression-hygiene rule — see text.ngrams_expr) before
    the per-lane min-hash arithmetic: inlined, each of the
    ``num_hashes`` lanes would re-tokenize and re-md5 the whole
    document, a num_hashes-fold amplification of the row's only
    expensive work."""
    a, b = _minhash_params(num_hashes, seed)

    def _lanes(xv):
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        xv,
                        lambda x: (F.lit(int(a[i])) * x + F.lit(int(b[i])))
                        % F.lit(MERSENNE),
                    )
                ).cast("long")
                for i in range(num_hashes)
            ]
        )

    toks = F.array_distinct(tokens_expr(text))
    xs = F.transform(toks, _token_int_expr)
    return F.get(F.transform(F.array(xs), _lanes), 0)


def minhash_signatures_stream(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Per-document MinHash signatures on a stream (stateless projection;
    see minhash_signature_expr). Token-less documents (null/empty/
    whitespace-only text) are dropped, matching the batch
    ``pipeline.dedup.minhash_signatures`` — without the filter their
    all-NULL signatures would collide into one giant bogus LSH bucket
    downstream."""
    out = stream_df.select(
        F.col(id_col),
        minhash_signature_expr(
            F.col(text_col), num_hashes=num_hashes, seed=seed
        ).alias("signature"),
    )
    return out.filter(F.col("signature")[0].isNotNull())


def minhash_lsh_candidates_stream(
    stream_signatures: DataFrame,
    corpus_index: DataFrame,
    id_col: str,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Incremental LSH dedup: candidate pairs between NEW (streaming)
    documents and an already-indexed static corpus.

    ``stream_signatures``: streaming (id, signature) rows — the output of
    :func:`minhash_signatures_stream`. ``corpus_index``: the static corpus
    as (doc, band, key) rows from ``pipeline.dedup.lsh_band_keys`` applied
    to the corpus signatures (persist it — every micro-batch probes it);
    building both sides from the SAME ``lsh_band_keys`` projection
    guarantees stream and corpus band keys can never drift.

    The stream side explodes each new document into its band keys (pure
    projection) and inner-joins the static index on (band, key) — a
    stream-static equi-join, which Structured Streaming executes
    STATELESSLY, so this runs unbounded with zero state store. A pair
    colliding in several bands is emitted once per band: stream-global
    dropDuplicates would need unbounded state, so de-dupe per micro-batch
    in the sink (foreachBatch) if exactly-once pairs are needed.

    Output: (id_new, id_corpus) candidate rows, append-mode compatible."""
    from ..pipeline.dedup import lsh_band_keys

    new_banded = lsh_band_keys(
        stream_signatures, id_col, bands=bands, rows_per_band=rows_per_band
    )
    return (
        new_banded.alias("s")
        .join(
            corpus_index.alias("c"),
            (F.col("s.band") == F.col("c.band"))
            & (F.col("s.key") == F.col("c.key"))
            & (F.col("s.doc") != F.col("c.doc")),
        )
        .select(
            F.col("s.doc").alias("id_new"),
            F.col("c.doc").alias("id_corpus"),
        )
    )


def contamination_stream(
    stream_df: DataFrame,
    eval_index: dict,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Incremental train/eval decontamination: probe STREAMING training
    documents against a driver-collected eval-set index — the streaming
    twin of ``pipeline.dedup.contamination`` with identical per-document
    output (``id, n_shared, max_eval_df, contamination``; only
    contaminated docs are emitted).

    ``eval_index``: ``{wmin: eval_doc_count}`` — the collapsed index from
    ``pipeline.dedup.eval_minima_index(...)`` collected to the driver.
    Real decontamination eval sets are benchmark suites, so the collapsed
    index is small by construction (the batch path already relies on it
    being broadcast-sized); it ships to executors once as a broadcast
    read-only dict.

    The probe is a pure per-row projection (winnowing minima are computed
    by the same staged column expressions as the batch side, then looked
    up in the dict inside ONE Arrow-batched pandas UDF) — no shuffle, no
    state store, so the stream runs unbounded in append mode at source
    parallelism."""
    from ..pipeline.text import _winnow_stage

    idx = {int(m): int(c) for m, c in dict(eval_index).items()}

    @F.pandas_udf("array<bigint>")
    def _probe(wsets: pd.Series) -> pd.Series:
        out = []
        for ws in wsets:
            n = 0
            mx = 0
            for m in ws:
                d = idx.get(int(m))
                if d is not None:
                    n += 1
                    if d > mx:
                        mx = d
            out.append([n, mx])
        return pd.Series(out)

    stage = _winnow_stage(stream_df, text_col, k, w).withColumn(
        "_hit", _probe(F.col("_wset"))
    )
    return stage.filter(F.col("_hit")[0] > 0).select(
        F.col(id_col),
        F.col("_hit")[0].alias("n_shared"),
        F.col("_hit")[1].alias("max_eval_df"),
        F.round(F.col("_hit")[0] / F.size("_wset"), 6).alias("contamination"),
    )
