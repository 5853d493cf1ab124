"""Structured Streaming tests: the batch operators applied under
readStream with watermarks, drained to a memory sink. Verifies the
streaming claims in prague_spark.streaming are real, not schema-only."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

# slow: every streaming twin drains a real query — deselect with -m 'not slow' for the
# mid-round loop; the full suite gates commit milestones
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    # events.ts has been TIMESTAMP(NANOS) in some testdata generations
    # and TIMESTAMP(MICROS) in others; rewrite a micros copy so
    # readStream needs no legacy flag either way (prague_spark.queries
    # load() carries the same dual handling).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) loads as TIMESTAMP_NTZ,
    # which withWatermark rejects — event time must be TIMESTAMP
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    d = tempfile.mkdtemp(prefix="prague_stream_")
    df.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_windowed_agg_stream_matches_batch(spark, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    expected = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in batch_df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(events_stream_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert got == expected


def test_predict_grouped_stream_parity(spark, lineitem):
    """Per-segment scoring on a stream equals the batch predict_grouped
    row for row (stream-static broadcast join, stateless) — gaussian
    link AND the multinomial softmax argmax class."""
    import prague_spark as ps
    from prague_spark.streaming import predict_grouped_stream

    li = lineitem.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_discount", "l_extendedprice",
    ).withColumn("_rid", F.xxhash64("l_orderkey", "l_linenumber"))
    feats = ["l_quantity", "l_discount"]
    cg = ps.fit_grouped(
        li, feats, "l_extendedprice", "gaussian", ["l_returnflag"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()
    cm = ps.fit_grouped(
        li, feats, "l_returnflag", "multinomial", ["l_linestatus"],
        n_sigma=3, lambda_min_ratio=0.1, order_col="_rid",
    ).cache()

    d = tempfile.mkdtemp(prefix="prague_grouped_stream_")
    li.drop("_rid").coalesce(2).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)

    scored = predict_grouped_stream(
        stream, cg, feats, ["l_returnflag"], family="gaussian",
        type="link", out="lp",
    )
    scored = predict_grouped_stream(
        scored, cm, feats, ["l_linestatus"], family="multinomial",
        type="class", out="cls",
    )
    assert scored.isStreaming
    q = (
        scored.select("l_orderkey", "l_linenumber", "lp", "cls")
        .writeStream.format("memory").queryName("grp_scored")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_orderkey"], r["l_linenumber"]): (r["lp"], r["cls"])
        for r in spark.sql("SELECT * FROM grp_scored").collect()
    }
    batch = ps.predict_grouped(
        spark.read.parquet(d), cg, feats, ["l_returnflag"],
        family="gaussian", type="link", out="lp",
    )
    batch = ps.predict_grouped(
        batch, cm, feats, ["l_linestatus"], family="multinomial",
        type="class", out="cls",
    )
    exp = {
        (r["l_orderkey"], r["l_linenumber"]): (r["lp"], r["cls"])
        for r in batch.select("l_orderkey", "l_linenumber", "lp", "cls").collect()
    }
    assert got == exp  # identical literals -> bit-identical scores
    # a streaming coef frame is rejected loud
    with pytest.raises(ValueError, match="batch DataFrame"):
        predict_grouped_stream(
            stream, stream, feats, ["l_returnflag"]
        )
    cg.unpersist()
    cm.unpersist()


def test_score_stream_stateless(spark, lineitem, events_stream_dir):
    import prague_spark as ps
    from prague_spark.streaming import score_stream

    model = ps.fit(
        lineitem, ["l_quantity", "l_discount"], "l_extendedprice",
        "gaussian", n_sigma=3,
    )
    d = tempfile.mkdtemp(prefix="prague_stream_li_")
    lineitem.select("l_orderkey", "l_quantity", "l_discount", "l_extendedprice") \
        .coalesce(2).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    scored = score_stream(stream, model, type="response", out="pred")
    assert scored.isStreaming
    q = (
        scored.writeStream.format("memory")
        .queryName("scored")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql(
        "SELECT count(*) AS n, count(pred) AS np FROM scored"
    ).first()
    assert row["n"] == lineitem.count() and row["np"] == row["n"]


def test_stateful_running_stats_across_batches(spark, sf_dir):
    """applyInPandasWithState: state must carry across micro-batches —
    two files, maxFilesPerTrigger=1 forces two batches; the final emitted
    totals must equal the batch-computed global stats."""
    import numpy as np

    from prague_spark.streaming.stateful import running_stats_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "value", "event_id"
    )
    d = tempfile.mkdtemp(prefix="prague_stateful_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/p0")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{d}/p1")
    # single dir with both files
    import glob as _glob
    import shutil

    sdir = tempfile.mkdtemp(prefix="prague_stateful_in_")
    for i, f in enumerate(sorted(_glob.glob(f"{d}/p*/part-*.parquet"))):
        shutil.copy(f, f"{sdir}/{i:04d}.parquet")

    schema = ev.select("user_id", "value").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    out = running_stats_stream(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM running_stats").collect()
    # at least one key must have been emitted in BOTH batches (state carried)
    from collections import Counter

    per_key = Counter(r["key"] for r in rows)
    assert max(per_key.values()) >= 2
    # final emission per key == exact global stats
    final = {}
    for r in rows:
        if r["key"] not in final or r["n"] > final[r["key"]]["n"]:
            final[r["key"]] = {"n": r["n"], "mean": r["mean"], "var": r["var"]}
    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
        )
        .collect()
    }
    for k, got in final.items():
        assert got["n"] == want[k]["n"]
        assert got["mean"] == pytest.approx(want[k]["mean"], rel=1e-9)
        assert got["var"] == pytest.approx(want[k]["var"], rel=1e-6)


def test_sessionize_stream_matches_batch(spark, events_stream_dir):
    """session_window under readStream (complete mode + watermark; session
    windows reject update mode) must reproduce the batch sessionization —
    the canonical stateful-streaming operator of the events surface
    (queries.q_events_sessionize)."""
    batch_df = spark.read.parquet(events_stream_dir)
    expected = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in batch_df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(events_stream_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "streaming query did not finish in 120s"
        got = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sess_agg").collect()
        }
        assert got == expected
    finally:
        q.stop()


def test_streaming_minhash_matches_batch(spark, sf_dir):
    """The stateless minhash projection on a stream must produce the
    exact signatures of the batch explode+groupBy implementation."""
    from prague_spark.pipeline.dedup import minhash_signatures
    from prague_spark.streaming.dedup import minhash_signatures_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = tempfile.mkdtemp(prefix="prague_mh_stream_")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)
    out = minhash_signatures_stream(stream, "doc_id", "text", num_hashes=8)
    q = (
        out.writeStream.format("memory")
        .queryName("mh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["doc_id"]: list(r["signature"])
        for r in spark.sql("SELECT * FROM mh_stream").collect()
    }
    want = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(docs, "doc_id", "text", num_hashes=8,
                                    shingle_n=1).collect()
    }
    assert got == want


def test_streaming_exact_dedup_bounded_state(spark):
    """dropDuplicatesWithinWatermark on the content hash: duplicates
    inside the watermark horizon are dropped; each distinct text is
    emitted exactly once when all data is within the horizon."""
    from prague_spark.streaming.dedup import exact_dedup_stream

    rows = [
        (1, "alpha beta", "2024-01-01 00:00:00"),
        (2, "alpha beta", "2024-01-01 00:00:30"),   # dup within horizon
        (3, "gamma delta", "2024-01-01 00:01:00"),
        (4, "alpha beta", "2024-01-01 00:01:30"),   # dup within horizon
        (5, "gamma delta", "2024-01-01 00:02:00"),  # dup within horizon
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = tempfile.mkdtemp(prefix="prague_dedup_stream_")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    out = exact_dedup_stream(stream, "text", "ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("SELECT text FROM dedup_stream").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["alpha beta", "gamma delta"]


def test_streaming_lsh_banding_matches_batch(spark, sf_dir):
    """Stream-static LSH banding: candidates between streamed NEW docs and
    the indexed static corpus must equal (as a set) the batch banding
    job's cross pairs over the same signatures."""
    from prague_spark.pipeline.dedup import lsh_band_keys, minhash_lsh_candidates
    from prague_spark.streaming.dedup import (
        minhash_lsh_candidates_stream, minhash_signature_expr,
        minhash_signatures_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    corpus = docs.filter(F.col("source") != "src0")
    new = docs.filter(F.col("source") == "src0")
    assert new.count() > 0 and corpus.count() > 0

    # corpus index: SAME signature family as the stream, pre-banded
    corpus_sigs = corpus.select(
        "doc_id",
        minhash_signature_expr(F.col("text"), num_hashes=16).alias("signature"),
    ).filter(F.col("signature")[0].isNotNull())
    corpus_index = lsh_band_keys(
        corpus_sigs, "doc_id", bands=8, rows_per_band=2
    ).persist()

    d = tempfile.mkdtemp(prefix="prague_lsh_stream_")
    new.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(new.schema).parquet(d)
    cands = minhash_lsh_candidates_stream(
        minhash_signatures_stream(stream, "doc_id", "text", num_hashes=16),
        corpus_index, "doc_id", bands=8, rows_per_band=2,
    )
    q = (
        cands.writeStream.format("memory")
        .queryName("lsh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["id_new"], r["id_corpus"])
        for r in spark.sql("SELECT * FROM lsh_stream").collect()
    }

    # batch reference: same signatures over the union, banded self-join,
    # restricted to (new x corpus) pairs in either orientation
    all_sigs = docs.select(
        "doc_id",
        minhash_signature_expr(F.col("text"), num_hashes=16).alias("signature"),
    ).filter(F.col("signature")[0].isNotNull())
    batch_pairs = minhash_lsh_candidates(
        all_sigs, "doc_id", bands=8, rows_per_band=2
    )
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    want = set()
    for r in batch_pairs.collect():
        a, b = r["id_a"], r["id_b"]
        if a in new_ids and b in corpus_ids:
            want.add((a, b))
        elif b in new_ids and a in corpus_ids:
            want.add((b, a))
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise collisions


def test_streaming_contamination_matches_batch(spark, sf_dir):
    """The streaming decontamination probe (broadcast eval-index dict +
    Arrow-batched lookup) must reproduce the batch contamination rows
    exactly on the shared fixture."""
    from prague_spark.pipeline.dedup import contamination, eval_minima_index
    from prague_spark.streaming.dedup import contamination_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    train = docs.filter(F.col("source") != "src0")
    evl = docs.filter(F.col("source") == "src0")

    idx = {
        int(r["wmin"]): int(r["_eval_df"])
        for r in eval_minima_index(evl, "doc_id", "text").collect()
    }
    d = tempfile.mkdtemp(prefix="prague_contam_stream_")
    train.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(train.schema).parquet(d)
    q = (
        contamination_stream(stream, idx, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("contam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["doc_id"], r["n_shared"], r["max_eval_df"], r["contamination"])
        for r in spark.sql("SELECT * FROM contam_stream").collect()
    }
    want = {
        (r["doc_id"], r["n_shared"], r["max_eval_df"], r["contamination"])
        for r in contamination(train, evl, "doc_id", "text").collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise overlaps


def test_streaming_ivf_probe_matches_batch_topk(spark, sf_dir):
    """Stream-static IVF probe: streamed query vectors against the static
    cell-assigned corpus must reproduce batch ivf_topk exactly — same
    probed cells, same candidates, and (after the documented per-batch
    rank in the sink) the same top-k rows."""
    import numpy as np

    from prague_spark.pipeline.similarity import (
        assign_ivf_cells, ivf_topk, train_ivf_centroids,
    )
    from prague_spark.streaming.similarity import ivf_candidates_stream

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumnRenamed("embedding", "vec").limit(300)
    )
    C = train_ivf_centroids(emb, "vec", n_centroids=8, iters=5)
    corpus = assign_ivf_cells(emb, "vec", C).persist()

    qrows = emb.orderBy("vec_id").limit(4).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["vec"]]) for r in qrows]
    expected = {
        (r["query_id"], r["vec_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_topk(
            corpus, "vec_id", "vec", C, queries, k=5, nprobe=3
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="prague_ivf_stream_")
    spark.createDataFrame(
        queries, "query_id long, qvec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "query_id long, qvec array<double>"
    ).parquet(d)
    cands = ivf_candidates_stream(
        stream, "query_id", "qvec", corpus, "vec_id", "vec", C, nprobe=3
    )
    q = (
        cands.writeStream.format("memory")
        .queryName("ivf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got_cands = spark.sql("select * from ivf_stream").collect()
    # the documented sink-side rank (all of a query's candidates co-arrive)
    by_q: dict = {}
    for r in got_cands:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    got = set()
    for qid, cs in by_q.items():
        cs.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, cos) in enumerate(cs[:5], start=1):
            got.add((qid, vid, round(cos, 9), rank))
    assert got == expected
    corpus.unpersist()


def test_streaming_knn_join_matches_batch(spark, sf_dir):
    """knn_join_stream: a streamed query frame k-NN-joined against the
    static IVF index reproduces batch ivf_knn_join row for row — the
    candidate plan is literally shared (ivf_knn_candidates), and the
    sink-side topk_batch applies the identical rank window."""
    from prague_spark.pipeline.similarity import (
        assign_ivf_cells, ivf_knn_join, train_ivf_centroids,
    )
    from prague_spark.streaming.similarity import knn_join_stream, topk_batch

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # double up front: the stream side reads the query parquet back
        # as array<double>, so the batch twin must fold the same type
        .withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
        .select("vec_id", "vec").limit(300)
    )
    C = train_ivf_centroids(emb, "vec", n_centroids=8, iters=5)
    corpus = assign_ivf_cells(emb, "vec", C).persist()

    qdf = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    expected = {
        (r["query_id"], r["vec_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_knn_join(qdf, corpus, C, k=5, nprobe=3).collect()
    }

    d = tempfile.mkdtemp(prefix="prague_knn_stream_")
    qdf.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "query_id long, qvec array<double>"
    ).parquet(d)
    cands = knn_join_stream(stream, corpus, C, nprobe=3)
    collected = []
    q = (
        cands.writeStream.foreachBatch(
            lambda b, _: collected.extend(topk_batch(b, k=5).collect())
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["query_id"], r["vec_id"], round(r["cosine"], 9), r["rank"])
        for r in collected
    }
    assert got == expected
    corpus.unpersist()


def test_streaming_knnpq_join_matches_batch(spark, sf_dir):
    """knnpq_join_stream: streamed queries residual-ADC-scored against
    the static codes-only IVF-PQ index reproduce batch ivfpq_knn_join
    (no rerank) row for row — shared candidate expressions + the same
    sink-side rank window."""
    from prague_spark.pipeline.similarity import (
        assign_ivfpq, ivfpq_knn_join, train_ivfpq,
    )
    from prague_spark.streaming.similarity import knnpq_join_stream, topk_batch

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
        .select("vec_id", "vec").limit(300)
    )
    C, books = train_ivfpq(
        emb, "vec", n_centroids=8, n_subvectors=8, n_codes=16,
        sample_rows=300,
    )
    corpus = assign_ivfpq(emb, "vec", C, books).select(
        "vec_id", "cell", "pq_code"
    ).persist()

    qdf = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    expected = {
        (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
        for r in ivfpq_knn_join(qdf, corpus, C, books, k=5, nprobe=3).collect()
    }

    d = tempfile.mkdtemp(prefix="prague_knnpq_stream_")
    qdf.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(
        "query_id long, qvec array<double>"
    ).parquet(d)
    cands = knnpq_join_stream(stream, corpus, C, books, nprobe=3)
    collected = []
    q = (
        cands.writeStream.foreachBatch(
            lambda b, _: collected.extend(
                topk_batch(b, k=5, score_col="score").collect()
            )
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["query_id"], r["vec_id"], round(r["score"], 9), r["rank"])
        for r in collected
    }
    assert got == expected
    corpus.unpersist()


def test_streaming_boilerplate_strip_matches_batch(spark):
    """The projection-based strip runs unchanged under readStream and
    matches the batch join-based strip_boilerplate row for row."""
    from prague_spark.pipeline import text as text_ops

    banner = "subscribe to our newsletter"
    rows = [
        (1, f"{banner}\nkeep this line\nand this"),
        (2, f"other body\n  SUBSCRIBE TO OUR NEWSLETTER  "),
        (3, banner),
        (4, "untouched document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = text_ops.boilerplate_lines(docs, "text", min_docs=2)
    hashes = [r["line_hash"] for r in idx.collect()]

    expected = {
        r["doc_id"]: r["clean_text"]
        for r in text_ops.strip_boilerplate(docs, "doc_id", "text", idx).collect()
    }

    d = tempfile.mkdtemp(prefix="prague_bp_stream_")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    q = (
        text_ops.strip_boilerplate_projection(stream, "text", hashes)
        .select("doc_id", "clean_text")
        .writeStream.format("memory")
        .queryName("bp_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["doc_id"]: r["clean_text"]
        for r in spark.sql("select * from bp_stream").collect()
    }
    assert got == expected


def test_streaming_rollup_matches_batch(spark, events_stream_dir):
    """time_rollup_stream (per-grain tumbling windows, watermark-
    evictable state) must reproduce the batch time_rollup exactly for
    fixed-duration grains — epoch-aligned windows == date_trunc."""
    from prague_spark.ops.rollup import time_rollup
    from prague_spark.streaming.rollup import time_rollup_stream

    batch_df = spark.read.parquet(events_stream_dir)
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ]
    expected = {
        (r["grain"], r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in time_rollup(
            batch_df, "ts", grains=("hour", "day"), keys=("event_type",),
            aggs=aggs,
        ).collect()
    }

    streams = time_rollup_stream(
        spark.readStream.schema(batch_df.schema).parquet(events_stream_dir),
        "ts", grains=("hour", "day"), keys=("event_type",), aggs=aggs,
    )
    got = {}
    for g, sdf in streams.items():
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"roll_{g}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120), f"{g} stream did not finish"
            for r in spark.sql(f"SELECT * FROM roll_{g}").collect():
                got[(r["grain"], r["bucket"], r["event_type"])] = (
                    r["n"], r["sum_value"],
                )
        finally:
            q.stop()
    assert got == expected


def test_streaming_rollup_rejects_calendar_grain(spark, events_stream_dir):
    from prague_spark.streaming.rollup import time_rollup_stream

    batch_df = spark.read.parquet(events_stream_dir)
    sdf = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
    with pytest.raises(ValueError, match="no fixed duration"):
        time_rollup_stream(sdf, "ts", grains=("month",))


def test_streaming_calendar_rollup_matches_batch(spark, events_stream_dir, tmp_path):
    """calendar_rollup_sink (foreachBatch incremental merge) over
    time-split micro-batches must land on the batch time_rollup EXACTLY
    for the calendar grains (week, month) tumbling windows cannot
    express — and replaying a batch_id must be a no-op (no
    double-count)."""
    from prague_spark.ops.rollup import time_rollup
    from prague_spark.streaming.rollup import (
        calendar_rollup_sink, read_rollup_state,
    )

    batch_df = spark.read.parquet(events_stream_dir)
    expected = {
        (r["grain"], r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in time_rollup(
            batch_df, "ts", grains=("week", "month"), keys=("event_type",),
            aggs=[
                F.count("*").cast("long").alias("n"),
                F.sum("value").alias("sum_value"),
            ],
        ).collect()
    }

    # two time-ordered halves -> at least two foreachBatch invocations
    med = batch_df.withColumn(
        "_tu", F.unix_micros(F.col("ts").cast("timestamp"))
    ).approxQuantile("_tu", [0.5], 0.0)[0]
    tu = F.unix_micros(F.col("ts").cast("timestamp"))
    d = str(tmp_path / "halves")
    batch_df.filter(tu <= med).coalesce(1).write.parquet(f"{d}/a=0")
    batch_df.filter(tu > med).coalesce(1).write.parquet(f"{d}/a=1")

    state = str(tmp_path / "rollup_state")
    sink = calendar_rollup_sink(
        "ts", state, grains=("week", "month"), keys=("event_type",),
        sum_cols=("value",),
    )
    sdf = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/a=*")
    )
    q = sdf.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(120), "calendar rollup stream did not finish"
    finally:
        q.stop()

    def _state():
        return {
            (r["grain"], r["bucket"], r["event_type"]): (
                r["n"], r["sum_value"],
            )
            for r in read_rollup_state(spark, state).collect()
        }

    got = _state()
    assert set(got) == set(expected)
    for k, (n, sv) in expected.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(sv, rel=1e-9), k
    # at-least-once replay: re-merging an already-seen batch_id is a no-op
    sink(batch_df.limit(50), 0)
    assert _state() == got

    # crash-atomicity: simulate dying BETWEEN the versioned state write
    # and the pointer flip — an orphan v_<id> directory exists but
    # CURRENT still names the old state. The redelivered batch must
    # re-merge from the OLD state (no double count), flip atomically,
    # and garbage-collect the orphan.
    import os

    extra = batch_df.limit(30)
    inc_exp = {
        (r["grain"], r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in time_rollup(
            extra, "ts", grains=("week", "month"), keys=("event_type",),
            aggs=[
                F.count("*").cast("long").alias("n"),
                F.sum("value").alias("sum_value"),
            ],
        ).collect()
    }
    # orphan: a half-committed merge of batch 7 (state written, no flip)
    read_rollup_state(spark, state).limit(1).write.parquet(f"{state}/v_7")
    sink(extra, 7)  # redelivery after the simulated crash
    after = _state()
    for k, (n, sv) in inc_exp.items():
        base_n, base_sv = got.get(k, (0, 0.0))
        assert after[k][0] == base_n + n, k
        assert after[k][1] == pytest.approx(base_sv + sv, rel=1e-9), k
    versions = {p for p in os.listdir(state) if p.startswith("v_")}
    # the new state plus ONE superseded generation (read grace for lazy
    # plans resolved against the old CURRENT); older orphans GC'd
    assert "v_7" in versions and len(versions) == 2
    with open(f"{state}/CURRENT") as f:
        assert f.read().strip() == "v_7"
    # and a re-redelivery of the now-committed batch is a no-op again
    sink(extra, 7)
    assert _state() == after
    # a reader holding the PRE-FLIP state keeps working for one batch
    pre = read_rollup_state(spark, state)
    sink(batch_df.limit(10), 8)  # flips to v_8, keeps v_7
    assert pre.count() > 0  # v_7 still on disk
    versions = {p for p in os.listdir(state) if p.startswith("v_")}
    assert versions == {"v_7", "v_8"}


def test_streaming_bm25_matches_batch(spark, sf_dir, tmp_path):
    """bm25_contributions_stream (stateless stream-static joins) +
    the documented per-batch groupBy/top-k sink must reproduce the
    batch bm25_search exactly on real documents."""
    from pyspark.sql import Window

    from prague_spark.pipeline.search import (
        bm25_search, build_postings, corpus_stats_from_docs,
    )
    from prague_spark.streaming.search import (
        bm25_contributions_stream, term_idf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs, avgdl = corpus_stats_from_docs(docs, "text")
    post = build_postings(docs, "doc_id", "text").cache()
    queries = [(0, "table scan merge"), (1, "window sort hash")]
    expected = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_search(
            post, queries, k=5, n_docs=n_docs, avgdl=avgdl
        ).collect()
    }

    qdir = str(tmp_path / "queries")
    spark.createDataFrame(
        queries, "query_id bigint, qtext string"
    ).coalesce(1).write.parquet(qdir)
    qstream = spark.readStream.schema(
        "query_id bigint, qtext string"
    ).parquet(qdir)
    contrib = bm25_contributions_stream(
        qstream, "query_id", "qtext", post, term_idf(post, n_docs), avgdl
    )
    got = {}

    def sink(batch_df, _):
        s = batch_df.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id")
        )
        for r in (
            s.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect()
        ):
            got[(r["query_id"], r["doc_id"])] = (r["score"], r["rank"])

    q = (
        contrib.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "bm25 stream did not finish"
    finally:
        q.stop()
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][1] == expected[k][1]
        assert got[k][0] == pytest.approx(expected[k][0], rel=1e-12)


def test_streaming_chunk_text_matches_batch(spark, sf_dir, tmp_path):
    """chunk_text is a pure projection + explode, so the SAME call runs
    under readStream with no watermark/state — pin exact row parity."""
    from prague_spark.pipeline.text import chunk_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    d = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(d)
    batch = spark.read.parquet(d)
    expected = {
        (r["doc_id"], r["chunk_id"]): (r["chunk"], r["chunk_len"])
        for r in chunk_text(batch, "doc_id", "text", size=16, overlap=4).collect()
    }
    sdf = spark.readStream.schema(batch.schema).parquet(d)
    out = chunk_text(sdf, "doc_id", "text", size=16, overlap=4)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("chunk_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "chunk stream did not finish"
        got = {
            (r["doc_id"], r["chunk_id"]): (r["chunk"], r["chunk_len"])
            for r in spark.sql("SELECT * FROM chunk_stream").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_funnel_matches_batch(spark, events_stream_dir, tmp_path):
    """funnel_stream (applyInPandasWithState, 3-number state per key)
    over time-split files fed one per trigger must land on the batch
    funnel's exact per-user depth — proving state carries across
    micro-batches, not just within one."""
    from prague_spark.ops.funnel import funnel
    from prague_spark.streaming.funnel import funnel_stream

    batch_df = spark.read.parquet(events_stream_dir)
    steps = ["view", "click", "purchase"]
    expected = {
        r["user_id"]: (r["depth"], r["t1_us"])
        for r in funnel(
            batch_df, "user_id", "ts", "event_type", steps, within=86400.0
        ).collect()
    }

    # two time-ordered halves -> two micro-batches
    med = batch_df.withColumn("_tu", F.unix_micros(F.col("ts").cast("timestamp"))).approxQuantile("_tu", [0.5], 0.0)[0]
    tu = F.unix_micros(F.col("ts").cast("timestamp"))
    d = str(tmp_path / "halves")
    batch_df.filter(tu <= med).coalesce(1).write.parquet(f"{d}/a=0")
    batch_df.filter(tu > med).coalesce(1).write.parquet(f"{d}/a=1")
    sdf = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/a=*")
    )
    out = funnel_stream(sdf, "user_id", "ts", "event_type", steps,
                        within=86400.0)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "funnel stream did not finish"
        rows = spark.sql("SELECT * FROM funnel_stream_t").collect()
    finally:
        q.stop()
    # depth is monotone; the max-depth emission per key is the final state
    got: dict = {}
    for r in rows:
        cur = got.get(r["key"])
        if cur is None or r["depth"] >= cur[0]:
            got[r["key"]] = (r["depth"], r["t1_us"])
    # key-universe delta (see streaming.funnel docstring): the stream
    # filters non-step events before the state shuffle, so a key with
    # zero step events emits nothing — absence == depth 0
    assert set(got) <= set(expected)
    for k, v in expected.items():
        assert got.get(k, (0, None)) == v, (k, got.get(k), v)
    # state really carried: at least one key must have emitted twice
    from collections import Counter

    assert Counter(r["key"] for r in rows).most_common(1)[0][1] >= 2


def test_streaming_pq_codes_match_batch(spark, sf_dir, tmp_path):
    """assign_pq_codes is a pure (codegen) projection over literal
    codebooks — the SAME call runs under readStream; pin exact code
    parity on real embeddings. The PQ write path at scale is exactly
    this: code vectors as they stream in, store the 8-byte codes."""
    from pyspark.sql import functions as F

    from prague_spark.pipeline import similarity

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
        .limit(200)
        .select("vec_id", "vec")
    )
    d = str(tmp_path / "emb")
    emb.coalesce(1).write.parquet(d)
    batch = spark.read.parquet(d)
    books = similarity.train_pq_codebooks(
        batch, "vec", n_subvectors=8, n_codes=16, sample_rows=200
    )
    expected = {
        r["vec_id"]: tuple(r["pq_code"])
        for r in similarity.assign_pq_codes(batch, "vec", books).collect()
    }
    sdf = spark.readStream.schema(batch.schema).parquet(d)
    out = similarity.assign_pq_codes(sdf, "vec", books).select("vec_id", "pq_code")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("pq_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
        got = {
            r["vec_id"]: tuple(r["pq_code"])
            for r in spark.sql("SELECT * FROM pq_stream").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_ivfpq_assign_matches_batch(spark, sf_dir, tmp_path):
    """assign_ivfpq (cell + residual PQ codes) is a pure codegen
    projection over literal centroids/codebooks — the SAME call runs
    under readStream; pin exact (cell, codes) parity. Indexing on ingest
    IS the at-scale IVF-PQ write path."""
    from pyspark.sql import functions as F

    from prague_spark.pipeline import similarity

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
        .limit(200)
        .select("vec_id", "vec")
    )
    d = str(tmp_path / "emb")
    emb.coalesce(1).write.parquet(d)
    batch = spark.read.parquet(d)
    C, books = similarity.train_ivfpq(
        batch, "vec", n_centroids=4, n_subvectors=8, n_codes=16,
        sample_rows=200,
    )
    expected = {
        r["vec_id"]: (r["cell"], tuple(r["pq_code"]))
        for r in similarity.assign_ivfpq(batch, "vec", C, books).collect()
    }
    sdf = spark.readStream.schema(batch.schema).parquet(d)
    out = similarity.assign_ivfpq(sdf, "vec", C, books).select(
        "vec_id", "cell", "pq_code"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ivfpq_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
        got = {
            r["vec_id"]: (r["cell"], tuple(r["pq_code"]))
            for r in spark.sql("SELECT * FROM ivfpq_stream").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_gopher_flags_match_batch(spark, sf_dir, tmp_path):
    """gopher_quality_flags is a pure projection — the SAME call runs
    under readStream; pin exact flag parity on real documents."""
    from prague_spark.pipeline.text import gopher_quality_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    d = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(d)
    batch = spark.read.parquet(d)
    cols = ["gq_words_ok", "gq_word_len_ok", "gq_alpha_ok",
            "gq_rep_ok", "gq_stop_ok", "gq_keep"]
    expected = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in gopher_quality_flags(batch, "text", min_words=20)
        .select("doc_id", *cols).collect()
    }
    sdf = spark.readStream.schema(batch.schema).parquet(d)
    out = gopher_quality_flags(sdf, "text", min_words=20).select(
        "doc_id", *cols
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("gq_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
        got = {
            r["doc_id"]: tuple(r[c] for c in cols)
            for r in spark.sql("SELECT * FROM gq_stream").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    """quality_gate_stream (foreachBatch over the batch scorer) must
    reproduce score_quality's probabilities and keep flags exactly:
    the score closes over one document, so micro-batch boundaries
    cannot move it."""
    from prague_spark.pipeline.quality_model import (
        score_quality, train_quality_filter,
    )
    from prague_spark.streaming.scoring import quality_gate_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "good").otherwise("bad").alias("ql"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" lucid cogent lucid")),
        ).otherwise(
            F.concat(F.col("text"), F.lit(" spammy junky spammy")),
        ).alias("text"),
    ).cache()
    qf = train_quality_filter(
        labeled, "doc_id", "text", "ql",
        n_features=2**12, n_sigma=4, lambda_min_ratio=0.1,
    )
    expected = {
        r["doc_id"]: (r["q_prob"], r["q_prob_keep"])
        for r in score_quality(
            labeled, qf, "doc_id", "text", keep_threshold=0.5
        ).collect()
    }

    ddir = str(tmp_path / "qdocs")
    # several files -> several micro-batches with maxFilesPerTrigger
    labeled.select("doc_id", "text").repartition(3).write.parquet(ddir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(ddir)
    )
    got = {}
    batches = []

    def sink(scored_df, batch_id):
        batches.append(batch_id)
        for r in scored_df.collect():
            got[r["doc_id"]] = (r["q_prob"], r["q_prob_keep"])

    fn = quality_gate_stream(qf, "doc_id", "text", sink, keep_threshold=0.5)
    q = stream.writeStream.foreachBatch(fn).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(180), "quality gate stream did not finish"
    finally:
        q.stop()
    assert len(batches) > 1          # parity held ACROSS micro-batches
    assert set(got) == set(expected)
    for d in expected:
        assert got[d][1] == expected[d][1]
        assert got[d][0] == pytest.approx(expected[d][0], rel=1e-9)
    labeled.unpersist()


def test_streaming_dsir_scoring_matches_batch(spark, sf_dir, tmp_path):
    """dsir_logweights(method='literal') is a zero-shuffle codegen
    projection, so the SAME call runs under readStream with no
    watermark/state — pin exact weight parity (bit-exact: identical
    fold over identical literals)."""
    from prague_spark.pipeline.dsir import dsir_logweights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = [0.001 * ((7 * i) % 23 - 11) for i in range(1024)]
    expected = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_logweights(docs, "doc_id", "text", table)
        .select("doc_id", "dsir_logw").collect()
    }
    ddir = str(tmp_path / "dsir_docs")
    docs.select("doc_id", "text").repartition(2).write.parquet(ddir)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(ddir)
    scored = dsir_logweights(stream, "doc_id", "text", table)
    got = {}

    def sink(batch_df, _):
        for r in batch_df.select("doc_id", "dsir_logw").collect():
            got[r["doc_id"]] = r["dsir_logw"]

    q = scored.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(120), "dsir stream did not finish"
    finally:
        q.stop()
    assert got == expected          # exact equality, not approx


def test_streaming_minhash_gate_matches_batch(spark, sf_dir, tmp_path):
    """The incremental near-dup gate on a STREAM: foreachBatch over
    minhash_candidates_against(include_shard_pairs=False) against a
    static write_minhash_index — shard-vs-index pairs are per-document,
    so micro-batch boundaries cannot change them; exact parity with the
    one batch-side gate. (Shard-vs-shard pairs are deliberately batch-
    LOCAL on a stream: new-vs-new pairs across micro-batches need the
    shard unioned into the index, the documented incremental recipe.)"""
    from prague_spark.pipeline import dedup

    kw = dict(num_hashes=4, shingle_n=1, seed=42, bands=2, rows_per_band=2)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "mh_idx_stream")
    dedup.write_minhash_index(corpus, path, "doc_id", "text", **kw)
    idx = spark.read.parquet(path).cache()
    expected = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_candidates_against(
            shard, idx, "doc_id", "text", include_shard_pairs=False, **kw
        ).collect()
    }
    assert expected  # the fixture must actually produce cross pairs
    sdir = str(tmp_path / "mh_shard_docs")
    shard.select("doc_id", "text").repartition(2).write.parquet(sdir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    got = set()
    batches = []

    def sink(batch_df, epoch_id):
        batches.append(epoch_id)
        pairs = dedup.minhash_candidates_against(
            batch_df, idx, "doc_id", "text",
            include_shard_pairs=False, **kw
        )
        got.update((r.id_a, r.id_b) for r in pairs.collect())

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    assert len(batches) > 1          # parity held ACROSS micro-batches
    assert got == expected
    idx.unpersist()


def test_streaming_exact_gate_bare_join_append_mode(spark, sf_dir, tmp_path):
    """The exact-tier gate runs DIRECTLY on a streaming shard in append
    mode when it is a bare stream-static join
    (include_shard_dups=False + unique_index=True against one
    write_content_index build) — no foreachBatch — and emits exactly
    the batch gate's rows across micro-batches."""
    from prague_spark.pipeline import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    # plant an exact copy of a corpus doc so the stream provably HITS
    # the index (the sf0.001 split has no natural cross-split dups)
    max_id = int(docs.agg(F.max("doc_id")).first()[0])
    planted = corpus.orderBy("doc_id").limit(1).select(
        F.lit(max_id + 1).cast("bigint").alias("doc_id"), "text"
    )
    shard = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "text"
    ).unionByName(planted)
    idx_p = str(tmp_path / "xidx_stream")
    sh_p = str(tmp_path / "xshard_docs")
    dedup.write_content_index(corpus, idx_p, "doc_id", "text")
    idx = spark.read.parquet(idx_p)
    shard.select("doc_id", "text").repartition(2).write.parquet(sh_p)
    expected = {
        (r["doc_id"], r["content_md5"], r["dup_of"])
        for r in dedup.exact_dedup_against(
            shard, idx, "doc_id", "text",
            include_shard_dups=False, unique_index=True,
        ).collect()
    }
    assert any(v is not None for _, _, v in expected)  # real index hits
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(sh_p)
    )
    out = dedup.exact_dedup_against(
        stream, idx, "doc_id", "text",
        include_shard_dups=False, unique_index=True,
    )
    q = (
        out.writeStream.format("memory").queryName("xgate_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(180)
        # the parity must hold ACROSS micro-batches, so more than one
        # non-empty batch must actually have run (repartition(2) +
        # maxFilesPerTrigger=1 — pin it, don't assume it)
        n_batches = sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0
        )
        assert n_batches > 1, f"only {n_batches} non-empty micro-batch(es)"
    finally:
        q.stop()
    got = {
        (r["doc_id"], r["content_md5"], r["dup_of"])
        for r in spark.sql("SELECT * FROM xgate_stream").collect()
    }
    assert got == expected


def test_streaming_cluster_fold_matches_one_shot(spark, sf_dir, tmp_path):
    """Rolling duplicate-cluster maintenance on a STREAM: each
    micro-batch's incremental gate pairs fold into the assignment with
    connected_components_against; after the stream drains, the state
    equals the one-shot closure over every pair seen — micro-batch
    boundaries cannot change the final clusters."""
    from prague_spark.pipeline import dedup

    kw = dict(num_hashes=4, shingle_n=1, seed=42, bands=2, rows_per_band=2)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)
    idx_p = str(tmp_path / "mh_idx_fold")
    sh_p = str(tmp_path / "fold_shard_docs")
    dedup.write_minhash_index(corpus, idx_p, "doc_id", "text", **kw)
    idx = spark.read.parquet(idx_p).cache()
    shard.select("doc_id", "text").repartition(3).write.parquet(sh_p)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(sh_p)
    )
    state = {"assign": None}
    seen_pairs = set()
    n_batches = []

    def sink(batch_df, epoch_id):
        n_batches.append(epoch_id)
        pairs = dedup.minhash_candidates_against(
            batch_df, idx, "doc_id", "text", **kw
        )
        rows = [(r.id_a, r.id_b) for r in pairs.collect()]
        seen_pairs.update(rows)
        if not rows:
            return
        pair_df = spark.createDataFrame(rows, "id_a bigint, id_b bigint")
        if state["assign"] is None:
            state["assign"] = dedup.connected_components(pair_df)
        else:
            state["assign"] = dedup.connected_components_against(
                state["assign"], pair_df
            )

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    assert len(n_batches) > 1 and seen_pairs
    got = {
        (r["node"], r["cluster_id"]) for r in state["assign"].collect()
    }
    want = {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components(
            spark.createDataFrame(sorted(seen_pairs), "id_a bigint, id_b bigint")
        ).collect()
    }
    assert got == want
    idx.unpersist()


def test_streaming_composed_gate_sink(spark, sf_dir, tmp_path):
    """curate.streaming_gate_sink: the composed gate's foreachBatch twin
    gates every micro-batch against the frozen artifact directory and
    folds the cluster state forward across batches — starting FROM the
    persisted cluster-state artifact, ending at exactly the labels a
    single fold of all seen pairs into that prior produces (micro-batch
    boundaries cannot move the final state)."""
    from prague_spark.pipeline import dedup
    from prague_spark.pipeline.curate import (
        CurationConfig, build_curation_artifacts, streaming_gate_sink,
    )

    kw = dict(num_hashes=4, shingle_n=1, seed=42, bands=2, rows_per_band=2)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    shard = docs.filter(F.col("doc_id") % 5 == 0)
    art = str(tmp_path / "art")
    cfg = CurationConfig(
        minhash=kw, span_k=5, span_min_count=1,
        quality_buckets=3, lang_col="lang", cluster_state=True,
    )
    build_curation_artifacts(corpus, art, "doc_id", "text", cfg)

    sdir = str(tmp_path / "stream_shard")
    shard.select("doc_id", "text", "lang").repartition(3).write.parquet(sdir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    seen_pairs = set()
    batch_keys = []
    keeper_union = set()

    def on_batch(gates, batch_df, epoch_id):
        batch_keys.append(sorted(gates))
        seen_pairs.update(
            (r.id_a, r.id_b) for r in gates["minhash"].collect()
        )
        keeper_union.update(
            r["doc_id"]
            for r in gates["exact"].filter(F.col("dup_of").isNull()).collect()
        )

    fn = streaming_gate_sink(art, "doc_id", "text", on_batch, cfg)
    q = stream.writeStream.foreachBatch(fn).trigger(availableNow=True).start()
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    assert len(batch_keys) > 1 and seen_pairs
    assert all(
        k == ["cluster_state", "cutoffs", "exact", "minhash", "spans"]
        for k in batch_keys
    )
    # batch-local exact keepers can only over-keep relative to the
    # whole-shard gate (within-shard dups split across batches), never
    # under-keep — and every whole-shard keeper survives some batch
    whole = {
        r["doc_id"]
        for r in dedup.exact_dedup_against(
            shard, spark.read.parquet(f"{art}/content_index"),
            "doc_id", "text", unique_index=True,
        ).filter(F.col("dup_of").isNull()).collect()
    }
    assert whole <= keeper_union

    # final state == one fold of ALL seen pairs into the prior artifact
    got = {(r["node"], r["cluster_id"])
           for r in fn.state["assign"].collect()}
    prior = dedup.read_assignment(spark, f"{art}/cluster_state")
    want = {
        (r["node"], r["cluster_id"])
        for r in dedup.connected_components_against(
            prior,
            spark.createDataFrame(sorted(seen_pairs),
                                  "id_a bigint, id_b bigint"),
        ).collect()
    }
    assert got == want
