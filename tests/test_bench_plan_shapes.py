"""Plan-shape pins for the expensive BENCH-ONLY configurations.

tests/test_plan_shapes.py pins all 50 registry queries, but bench.py
deliberately times PURE operator configurations that are not registry
queries (merged oracle slices would inflate a bench entry — the round-6
lesson). A shuffle / Python-stage / nested-loop regression in one of
those bench-only paths would previously surface only as a silent
BENCH_r{N} uptick; these pins fail CI instead.

Covered = the most expensive BENCH_r07 entries with a DataFrame plan:
banded embedding LSH, PQ and IVF-PQ two-stage search, bigram-LM
scoring, BM25, hybrid RRF, decontamination, hashing vectorizer. The
four fit_* heavyweights are driver-orchestrated multi-job loops, not
one plan — their scale budget is pinned as scans-per-path-point in
tests/test_sparse_invariance.py instead.

Budgets are the measured shapes at the bench configs (sf-independent);
py_stages must be 0 everywhere (all-JVM paths) and nested-loop or
cartesian joins are forbidden outright.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prague_spark.pipeline import dedup, similarity
from prague_spark.plan_audit import assert_scale_shape


@pytest.fixture(autouse=True)
def _uncached(spark):
    # audit UNCACHED plans (an InMemoryRelation left by another test
    # swaps full-width cached scans in for pruned parquet reads)
    spark.catalog.clearCache()
    yield


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
    )


@pytest.fixture(scope="module")
def queries3(emb):
    qrows = emb.limit(3).select("vec_id", "vec").collect()
    return [(int(r["vec_id"]), [float(x) for x in r["vec"]]) for r in qrows]


def test_banded_lsh_bench_shape(emb):
    # bench's dedup_embedding_lsh_banded config: planted near-dups,
    # threshold 0.7, 8 planes x 8 bands. All equi-joins: the band
    # self-join + exact verify must never degrade to a nested-loop or
    # cartesian pair scan, and the whole path stays JVM-side.
    pert = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(vec, (x, i) -> x + 0.25d * "
            "element_at(vec, int(pmod(i + 1, size(vec))) + 1))"
        ).alias("vec"),
    )
    both = emb.select("vec_id", "vec").unionByName(pert)
    out = dedup.embedding_cosine_pairs(
        both, "vec_id", "vec", threshold=0.7, n_planes=8, n_bands=8
    )
    # r14: the band signatures and exact verify are MapInArrow batches
    # (guide §4 — bit-identical outputs, ~4x the per-row HOF throughput
    # at 10x+ scale; see plans/r14). The pin now forbids only the
    # row-pickled BatchEvalPython form. There are exactly TWO Arrow
    # passes at runtime (one signature pass — pinned/cached — and one
    # verify pass); the string-level py_stages counter reads higher
    # because the cached signature subtree prints its lineage once per
    # consuming branch (the documented plan-TEXT double counting).
    a = assert_scale_shape(out, max_shuffles=5, max_py_row_stages=0,
                           max_read_width=3)
    assert a.py_stages > 0  # the Arrow route is actually engaged


def test_pq_topk_bench_shape(emb, queries3):
    # bench's sim_pq_topk: codes + ADC shortlist + exact re-rank. ONE
    # scan, ONE shuffle (the rank window), zero Python — the re-rank's
    # map-lookup form must not reintroduce a per-candidate explode join.
    books = similarity.train_pq_codebooks(
        emb, "vec", n_subvectors=8, n_codes=16, sample_rows=2000
    )
    coded = similarity.assign_pq_codes(emb, "vec", books)
    out = similarity.pq_adc_topk(
        coded, "vec_id", "pq_code", books, queries3, k=10,
        rerank_vec_col="vec", shortlist=100,
    )
    a = assert_scale_shape(out, max_shuffles=1, max_py_stages=0,
                           max_read_width=3)
    assert a.scans <= 1


def test_ivfpq_topk_bench_shape(emb, queries3):
    # bench's sim_ivfpq_topk: probed two-level search, same budget
    C, books = similarity.train_ivfpq(
        emb, "vec", n_centroids=8, n_subvectors=8, n_codes=16,
        sample_rows=2000,
    )
    idx = similarity.assign_ivfpq(emb, "vec", C, books)
    out = similarity.ivfpq_topk(
        idx, "vec_id", C, books, queries3, k=10, nprobe=4,
        rerank_vec_col="vec", shortlist=100,
    )
    a = assert_scale_shape(out, max_shuffles=1, max_py_stages=0,
                           max_read_width=3)
    assert a.scans <= 1


def test_lm_score_bench_shape(docs):
    # bench's text_lm_score: bigram-LM train + stupid-backoff scoring —
    # vocab-bounded equi-joins, bounded shuffles, zero Python
    from prague_spark.pipeline.text import bigram_lm_index, lm_logprob

    uni, big, total = bigram_lm_index(docs, "text")
    out = lm_logprob(docs, "doc_id", "text", uni, big, total)
    assert_scale_shape(out, max_shuffles=5, max_py_stages=0,
                       max_read_width=5)


def test_bm25_and_rrf_bench_shapes(docs, emb, queries3):
    # bench's text_bm25 + sim_hybrid_rrf: postings + isin-pruned scoring,
    # then RRF fusion of two top-k streams (fusion adds rank windows on
    # top-k-sized inputs, never a data-sized shuffle beyond them)
    from prague_spark.pipeline.search import (
        bm25_search, build_postings, corpus_stats_from_docs, rrf_fuse,
    )

    n, avgdl = corpus_stats_from_docs(docs, "text")
    post = build_postings(docs, "doc_id", "text")
    out = bm25_search(
        post, [(0, "table scan merge"), (1, "window sort hash")],
        k=10, n_docs=n, avgdl=avgdl,
    )
    assert_scale_shape(out, max_shuffles=6, max_py_stages=0,
                       max_read_width=5)
    lex = bm25_search(post, [(0, "table scan merge")], k=20,
                      n_docs=n, avgdl=avgdl)
    sem = similarity.cosine_topk(
        emb, "vec_id", "vec", [(0, queries3[0][1])], k=20
    ).withColumnRenamed("vec_id", "doc_id")
    fused = rrf_fuse([lex, sem.select("query_id", "doc_id", "rank")], topk=10)
    assert_scale_shape(fused, max_shuffles=9, max_py_stages=0,
                       max_read_width=5)


def test_decontaminate_bench_shape(docs):
    # bench's text_decontaminate: winnowing-minima inverted index join —
    # the eval side collapses to one row per distinct minimum before the
    # join, so the plan is equi-join + aggs, never a pairwise scan
    tr = docs.filter(F.col("source") != "src0")
    ev = docs.filter(F.col("source") == "src0")
    out = dedup.contamination(tr, ev, "doc_id", "text")
    assert_scale_shape(out, max_shuffles=3, max_py_stages=0,
                       max_read_width=5)


def test_embedding_cells_bench_shape(emb):
    # bench's dedup_embedding_cells config: 16 trained centroids,
    # planted near-dups, threshold 0.9. Assignment is a zero-shuffle
    # codegen projection; the within-cell self-join must stay an
    # EQUI-join (broadcast here, shuffle at scale — never nested-loop),
    # and the whole path is JVM-side.
    C = similarity.train_ivf_centroids(emb, "vec", n_centroids=16, iters=5)
    pert = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(vec, x -> x * 1.001d)").alias("vec"),
    )
    both = emb.select("vec_id", "vec").unionByName(pert)
    out = dedup.embedding_cell_pairs(both, "vec_id", "vec", C, threshold=0.9)
    assert_scale_shape(out, max_shuffles=2, max_py_stages=0,
                       max_read_width=2)


def test_knn_join_bench_shapes(emb):
    # bench's sim_knn_join + sim_ivfpq_knn_join configs: 200 query ROWS,
    # nprobe=2 — probe-cell explode + cell equi-join + one rank window.
    # Both joins must keep constant plan width in |Q| and zero Python;
    # the compressed form additionally re-ranks a decoded shortlist
    # without adding shuffles.
    C8 = similarity.train_ivf_centroids(emb, "vec", n_centroids=8, iters=5)
    idx = similarity.assign_ivf_cells(emb, "vec", C8)
    qdf = emb.limit(200).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    out = similarity.ivf_knn_join(qdf, idx, C8, k=10, nprobe=2)
    assert_scale_shape(out, max_shuffles=2, max_py_stages=0,
                       max_read_width=2)

    C, books = similarity.train_ivfpq(
        emb, "vec", n_centroids=8, n_subvectors=8, n_codes=16,
        sample_rows=2000,
    )
    pidx = similarity.assign_ivfpq(emb, "vec", C, books)
    out2 = similarity.ivfpq_knn_join(
        qdf, pidx.select("vec_id", "cell", "pq_code"), C, books,
        k=10, nprobe=2, rerank_codes=True, shortlist=50,
    )
    assert_scale_shape(out2, max_shuffles=2, max_py_stages=0,
                       max_read_width=2)


def test_hashvec_bench_shape(docs):
    # bench's docs_hashvec: raw text -> fit_sparse-ready triplets in ONE
    # shuffle (the no-vocabulary 100 TB vectorizer)
    from prague_spark.pipeline.vectorize import hashing_vectorizer

    out = hashing_vectorizer(docs, "doc_id", "text", n_features=2**15)
    assert_scale_shape(out, max_shuffles=1, max_py_stages=0,
                       max_read_width=5)


def test_duplicate_spans_bench_shape(docs):
    # bench's dedup_spans config (k=5): ONE gram-hash aggregation, a
    # semi-join back, two per-doc windows — the shuffles are the
    # problem's lower bound; the path is all-JVM and never pairwise
    out = dedup.duplicate_spans(docs, "doc_id", "text", k=5)
    assert_scale_shape(out, max_shuffles=4, max_py_stages=0,
                       max_read_width=2)


def test_incremental_gate_bench_shapes(docs, spark, tmp_path):
    # bench's incremental-tier entries (round 11): every gate is
    # O(shard) — the index side enters as a pruned scan (plus a pushed
    # predicate where applicable), never a corpus re-aggregation, and
    # the whole tier stays JVM-side. Measured at the bench configs:
    # exact gate = 1 shuffle (per-hash shard window) + 1 broadcast;
    # span gate = 1 shuffle (island windows share one sort) + 1
    # broadcast; the roll-forward frame = 1 shuffle (the union hash
    # agg); the CC fold's returned union = 2 shuffles over checkpointed
    # label frames.
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)

    p_x = str(tmp_path / "cx")
    dedup.write_content_index(corpus, p_x, "doc_id", "text")
    idx_x = spark.read.parquet(p_x)
    gate_x = dedup.exact_dedup_against(
        shard, idx_x, "doc_id", "text", unique_index=True
    )
    assert_scale_shape(gate_x, max_shuffles=2, max_py_stages=0,
                       max_read_width=3)

    p_s = str(tmp_path / "sx")
    dedup.write_span_index(corpus, p_s, "doc_id", "text", k=5, min_count=1)
    idx_s = spark.read.parquet(p_s)
    gate_s = dedup.duplicate_spans_against(
        shard, idx_s, "doc_id", "text", k=5
    )
    assert_scale_shape(gate_s, max_shuffles=2, max_py_stages=0,
                       max_read_width=3)

    ext = dedup._content_index_rows(idx_x, shard, "doc_id", "text")
    assert_scale_shape(ext, max_shuffles=2, max_py_stages=0,
                       max_read_width=3)

    kw = dict(num_hashes=8, shingle_n=1, seed=42, bands=2, rows_per_band=2)
    p_m = str(tmp_path / "mh")
    dedup.write_minhash_index(corpus, p_m, "doc_id", "text", **kw)
    idx_m = spark.read.parquet(p_m)
    prior = dedup.connected_components(
        dedup.minhash_lsh_candidates(
            dedup.minhash_signatures(corpus, "doc_id", "text",
                                     num_hashes=8, shingle_n=1),
            "doc_id", bands=2, rows_per_band=2,
        )
    )
    new = dedup.minhash_candidates_against(
        shard, idx_m, "doc_id", "text", **kw
    ).localCheckpoint(eager=True)
    fold = dedup.connected_components_against(prior, new)
    assert_scale_shape(fold, max_shuffles=3, max_py_stages=0)


def test_roll_forward_bench_shapes(docs, spark, tmp_path):
    # bench's round-12 roll-forward entries: both extends stay
    # O(index rows + shard) with zero Python stages. The minhash
    # roll-forward = shard signature agg + band-row union + the
    # bucket_n RECOUNT join (the skew cap's pushed predicate must stay
    # exact over the union); the span roll-forward = shard gram agg +
    # one union re-sum.
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)

    kw = dict(num_hashes=8, shingle_n=1, seed=42, bands=2, rows_per_band=2)
    p_m = str(tmp_path / "mh")
    dedup.write_minhash_index(corpus, p_m, "doc_id", "text", **kw)
    rows_m = dedup._minhash_index_rows(
        spark.read.parquet(p_m), shard, "doc_id", "text", **kw
    )
    assert_scale_shape(rows_m, max_shuffles=5, max_py_stages=0,
                       max_read_width=5)
    # the r14 INCREMENTAL count route (auto past
    # MINHASH_INCREMENTAL_BYTES): its only aggregations are the shard
    # delta and the O(touched) distinct; the string-level shuffle
    # counter reads higher because the pinned shard/delta subtrees
    # print their lineage once per consuming branch (the documented
    # plan-TEXT double counting) — pin the scale-relevant parts instead:
    # zero Python stages, and the stored-index scans stay column-pruned
    rows_i = dedup._minhash_index_rows(
        spark.read.parquet(p_m), shard, "doc_id", "text",
        incremental=True, **kw
    )
    assert_scale_shape(rows_i, max_py_stages=0, max_read_width=5)

    p_s = str(tmp_path / "sp")
    dedup.write_span_index(corpus, p_s, "doc_id", "text", k=5, min_count=1)
    rows_s = dedup._span_index_rows(
        spark.read.parquet(p_s), shard, "doc_id", "text", k=5
    )
    assert_scale_shape(rows_s, max_shuffles=2, max_py_stages=0,
                       max_read_width=3)


def test_select_keepers_bench_shape(docs, spark, tmp_path):
    # bench's curate_select_keepers: the composed keep policy is one
    # semi-join per active criterion over shard-sized frames (exact
    # keepers + the span dup-fraction gate) — all-JVM, no corpus work
    from prague_spark.pipeline.curate import (
        CurationConfig, build_curation_artifacts, gate_shard,
        select_keepers,
    )

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)
    art = str(tmp_path / "art")
    cfg = CurationConfig(
        span_k=5, lang_col="lang",
        minhash=dict(num_hashes=8, shingle_n=1, seed=42, bands=2,
                     rows_per_band=2),
    )
    build_curation_artifacts(corpus, art, "doc_id", "text", cfg)
    gates = gate_shard(shard, art, "doc_id", "text", cfg)
    keep = select_keepers(shard, gates, "doc_id", "text",
                          max_dup_token_frac=0.5)
    assert_scale_shape(keep, max_shuffles=4, max_py_stages=0,
                       max_read_width=5)


def test_embedding_curate_bench_shapes(emb, spark, tmp_path):
    # bench's round-12 vector-tier entries: the composed embedding gate
    # is frozen-centroid assignment (pure codegen) + a cell equi-join
    # against the partitioned layout + exact cosine — no corpus-wide
    # aggregation, zero Python stages; the append roll-forward's
    # written frame is a ZERO-shuffle codegen projection.
    from prague_spark.pipeline.curate import (
        CurationConfig, build_curation_artifacts, gate_shard,
    )

    vec = emb.select("vec_id", "vec")
    corpus = vec.filter(F.col("vec_id") % 5 != 0)
    held = vec.filter(F.col("vec_id") % 5 == 0)
    shard = held.unionByName(
        held.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.expr("transform(vec, x -> x * 1.001d)").alias("vec"),
        )
    )
    art = str(tmp_path / "art")
    cfg = CurationConfig(tiers=("embedding",), vec_col="vec",
                         embed_centroids=8)
    build_curation_artifacts(corpus, art, "vec_id", "vec", cfg)
    gate = gate_shard(shard, art, "vec_id", "vec", cfg)["embedding"]
    assert_scale_shape(gate, max_shuffles=2, max_py_stages=0)

    from prague_spark.pipeline import similarity

    C = similarity.load_ivfpq_model(
        spark, f"{art}/ivf_index/_ivfpq_model"
    )[0]
    asg = similarity.assign_ivf_cells(shard, "vec", C)
    assert_scale_shape(asg, max_shuffles=0, max_py_stages=0)


def test_curate_extend_artifacts_bench_shape(docs, spark, tmp_path):
    # bench's curate_extend_artifacts plan counters (round 13): the
    # composed snapshot closure's written frames — exact/minhash/spans
    # rows builders over the stored indexes + keepers, plus the frozen
    # cutoffs passthrough — hash-reduced to one column each and
    # unioned. The union adds NO shuffle of its own, so the budget is
    # the SUM of the per-tier roll-forward pins (2 + 3 + 1 + 0 at this
    # config = 6); zero Python anywhere. A structural regression in any
    # tier of the closure now fails here AND moves the bench counters.
    from prague_spark.pipeline.curate import (
        CurationConfig, _carried_params, _path, build_curation_artifacts,
        gate_shard, select_keepers,
    )

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)
    art = str(tmp_path / "art")
    cfg = CurationConfig(
        span_k=5, lang_col="lang",
        minhash=dict(num_hashes=8, shingle_n=1, seed=42, bands=2,
                     rows_per_band=2),
    )
    build_curation_artifacts(corpus, art, "doc_id", "text", cfg)
    gates = gate_shard(shard, art, "doc_id", "text", cfg)
    keep = select_keepers(
        shard, gates, "doc_id", "text", max_dup_token_frac=0.5
    ).localCheckpoint(eager=True)

    ex_idx = spark.read.parquet(_path(art, "exact"))
    mh_idx = spark.read.parquet(_path(art, "minhash"))
    sp_idx = spark.read.parquet(_path(art, "spans"))
    co_idx = spark.read.parquet(_path(art, "cutoffs"))
    frames = {
        "exact": dedup._content_index_rows(
            ex_idx.select("content_md5", "canonical_id", "n_copies"),
            keep, "doc_id", "text",
        ),
        "minhash": dedup._minhash_index_rows(
            mh_idx, keep, "doc_id", "text",
            **_carried_params(mh_idx, dedup._MINHASH_INDEX_PARAMS,
                              cfg.minhash),
        ),
        "spans": dedup._span_index_rows(
            sp_idx, keep, "doc_id", "text",
            **_carried_params(sp_idx, ("k",), {"k": cfg.span_k}),
        ),
        "cutoffs": co_idx,
    }
    out = None
    for tier, fdf in frames.items():
        slim = fdf.select(
            F.lit(tier).alias("tier"),
            F.hash(*[F.col(c) for c in fdf.columns]).alias("h"),
        )
        out = slim if out is None else out.unionByName(slim)
    assert_scale_shape(out, max_shuffles=6, max_py_stages=0)


def test_dsir_bench_shapes(docs):
    # bench's dsir_select config: counts are one explode + ONE groupBy
    # each; the literal-fold scoring is a ZERO-shuffle codegen
    # projection (the property that makes whole-corpus scoring one scan
    # at 100 TB); selection is a TakeOrdered, never a global sort.
    from prague_spark.pipeline.dsir import (
        dsir_gumbel_select, dsir_logweights, dsir_ngram_counts,
    )

    cnt = dsir_ngram_counts(docs, "text", n_buckets=2**14)
    assert_scale_shape(cnt, max_shuffles=1, max_py_stages=0,
                       max_read_width=2)
    table = [0.001 * (i % 7) for i in range(2**14)]
    scored = dsir_logweights(docs, "doc_id", "text", table)
    assert_scale_shape(scored, max_shuffles=0, max_py_stages=0)
    sel = dsir_gumbel_select(scored, "doc_id", "dsir_logw", 1000)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]
    assert_scale_shape(sel, max_shuffles=0, max_py_stages=0)
