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
    md5-derived token ints), but usable in any streaming projection."""
    a, b = _minhash_params(num_hashes, seed)
    toks = F.array_distinct(tokens_expr(text))
    xs = F.transform(toks, _token_int_expr)
    return F.array(
        *[
            F.array_min(
                F.transform(
                    xs,
                    lambda x: (F.lit(int(a[i])) * x + F.lit(int(b[i])))
                    % F.lit(MERSENNE),
                )
            ).cast("long")
            for i in range(num_hashes)
        ]
    )


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
