"""The README's corpus-curation recipe, executed end to end on the real
documents fixture — in BOTH deployment shapes:

1. the one-shot recipe (exact dedup -> MinHash/LSH near-dup clustering
   with quality-based keepers -> Gopher gate -> train/eval
   decontamination -> held-out split -> mixture upsampling -> sequence
   packing -> shard layout -> parquet round-trip), and
2. the frozen-artifact incremental shape every real pipeline runs per
   crawl snapshot: build every expensive artifact (content index,
   MinHash band-bucket index, span gram index, quantile cutoffs,
   quality-filter model) ONCE on a reference corpus, persist them, then
   gate a disjoint new shard using ONLY the loaded artifacts — with a
   plan-level proof that the shard pass never scans the corpus.

Every stage is an already-oracled operator; this pins that they COMPOSE
(schemas line up, invariants hold stage to stage, and the whole pipe is
deterministic across reruns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prague_spark.pipeline import dedup, text
from prague_spark.pipeline.sample import mix_corpus, shard_assign, split_assign

# slow: the full-recipe + frozen-artifact e2e runs minutes — deselect with -m 'not slow' for the
# mid-round loop; the full suite gates commit milestones
pytestmark = pytest.mark.slow


def _run_pipe(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    evals = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    corpus = docs.filter(F.col("source") != "src0")

    # 1. exact dedup (keeps min doc_id per byte-identical text; semi-join
    # restores the full rows)
    survivors = dedup.exact_dedup(corpus, "text", "doc_id")
    uniq = corpus.join(survivors.select("doc_id"), "doc_id", "semi").cache()

    # 2. near-dup clusters -> quality keeper per cluster
    sigs = dedup.minhash_signatures(uniq, "doc_id", "text", num_hashes=32)
    cands = dedup.minhash_lsh_candidates(sigs, "doc_id", bands=8,
                                         rows_per_band=4)
    cc = dedup.connected_components(cands)
    scored = text.quality_score(uniq, "text")
    keep = dedup.canonical_by_score(cc, scored, "doc_id", "q_score")
    clean = uniq.join(
        cc.selectExpr("node AS doc_id"), "doc_id", "left_anti"
    ).unionByName(uniq.join(keep.select("doc_id"), "doc_id", "semi"))

    # 2b. rule gate — thresholds sized for the short synthetic word-bag
    # docs (vocabulary contains almost no Gopher stopwords and repeats
    # 2-grams freely; the published defaults would drop everything, and
    # the point here is the composition, not the gate's selectivity)
    clean = text.gopher_quality_flags(
        clean, "text", min_words=5, min_stop_hits=0, max_rep_2gram=0.9,
        min_avg_word_len=1.0, max_avg_word_len=20.0,
    ).filter(F.col("gq_keep"))

    # 2c. exact-substring span gate (round-9 tier): documents that are
    # mostly recurring k-gram runs are template spam — the gate drops
    # them by duplicated-token fraction (the strip variant is pinned in
    # test_pipeline; the fixture's word bags make stripping destructive)
    spans = dedup.duplicate_spans(clean, "doc_id", "text", k=5)
    stats = dedup.span_dup_stats(clean, spans, "doc_id", "text")
    clean = stats.filter(F.col("dup_token_frac") <= 0.9).drop(
        "dup_token_frac"
    )

    # 3. decontaminate vs the eval slice. Threshold 0.8, not the 0.5 a
    # real web corpus would use: the synthetic word-bag docs share one
    # small vocabulary with the src0 eval slice, so winnowing overlap is
    # pervasive (median contamination ~0.69 at sf0.01, measured BEFORE
    # the 2c span gate — the gate removes few docs, so the shape holds)
    # and 0.5 would leave a ~4-doc tail that no longer exercises the
    # downstream stages. 0.8 removes a small real set and keeps the
    # population.
    _CONTAM = 0.8
    bad = dedup.contamination(clean, evals, "doc_id", "text").filter(
        F.col("contamination") >= _CONTAM
    )
    clean = clean.join(bad.select("doc_id"), "doc_id", "left_anti").cache()

    # 3c. DSIR selection toward the English target distribution
    # (round-9 tier): a gentle 85% keep — the point is the composition,
    # and the deterministic Gumbel draw replays exactly
    from prague_spark.pipeline.dsir import (
        dsir_gumbel_select, dsir_log_ratio, dsir_logweights,
        dsir_ngram_counts,
    )

    _B = 1024
    ratio = dsir_log_ratio(
        dsir_ngram_counts(clean.filter(F.col("lang") == "en"), "text",
                          n_buckets=_B),
        dsir_ngram_counts(clean, "text", n_buckets=_B),
        n_buckets=_B,
    )
    weighted = dsir_logweights(clean, "doc_id", "text", ratio)
    n_keep = int(clean.count() * 0.85)
    clean = dsir_gumbel_select(
        weighted, "doc_id", "dsir_logw", n_keep
    ).drop("dsir_logw").cache()

    # 3d. CCNet-style quality terciles per language (round-9 tier) —
    # the bucket travels as a column; downstream stages are unaffected
    scored_q = text.quality_score(clean, "text")
    bucketed = text.score_buckets(
        scored_q, "q_score", by=["lang"], n_buckets=3, out="q_bucket",
    )
    clean = bucketed.drop(
        *[c for c in bucketed.columns
          if c.startswith("q_") and c != "q_bucket"]
    )

    # 3b. held-out split before mixing
    split = split_assign(clean, "doc_id", {"train": 0.9, "val": 0.1})
    train = split.filter(F.col("split") == "train")

    # 4. mixture upsampling (en twice) + packing
    mix = mix_corpus(train, "doc_id", "lang", {"en": 2.0}, 1.0)
    mix = mix.withColumn("copy_id", F.col("doc_id") * 4 + F.col("epoch"))
    chunks = text.pack_chunks(mix, "copy_id", "text", capacity=64,
                              n_shards=4)

    # 5. shard layout
    shards = shard_assign(chunks, ["copy_id", "pack_id"], n_shards=8)
    return docs, uniq, cc, clean, split, train, mix, shards


def test_curation_recipe_end_to_end(spark, sf_dir, tmp_path):
    docs, uniq, cc, clean, split, train, mix, shards = _run_pipe(spark, sf_dir)
    n_corpus = docs.filter(F.col("source") != "src0").count()

    # dedup stages only ever shrink, and cluster math balances exactly:
    # survivors = uniq - members + clusters
    n_uniq = uniq.count()
    assert 0 < n_uniq <= n_corpus
    n_members = cc.count()
    n_clusters = cc.select("cluster_id").distinct().count()
    post_near = uniq.join(
        cc.selectExpr("node AS doc_id"), "doc_id", "left_anti"
    ).count() + n_clusters
    assert post_near == n_uniq - n_members + n_clusters

    # a meaningful population must survive — the e2e point is that the
    # stages COMPOSE, which a handful-of-docs tail doesn't exercise
    n_clean = clean.count()
    assert 0 < n_clean <= post_near
    assert n_clean >= 100, f"degenerate composition: only {n_clean} docs survived"

    # decontamination converged: nothing above threshold remains
    evals = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    again = dedup.contamination(clean, evals, "doc_id", "text").filter(
        F.col("contamination") >= 0.8
    )
    assert again.count() == 0

    # span gate converged: no surviving doc is >90% recurring k-grams
    sp = dedup.duplicate_spans(clean, "doc_id", "text", k=5)
    frac = dedup.span_dup_stats(clean, sp, "doc_id", "text")
    assert frac.filter(F.col("dup_token_frac") > 0.9).count() == 0

    # quality terciles: every survivor carries a valid bucket
    assert clean.filter(
        ~F.col("q_bucket").isin(1, 2, 3) | F.col("q_bucket").isNull()
    ).count() == 0

    # split partitions clean exactly
    by_split = {r["split"]: r["n"] for r in
                split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == n_clean
    assert set(by_split) <= {"train", "val"}

    # mixture: en appears exactly twice per kept train doc, others once
    n_train_en = train.filter(F.col("lang") == "en").count()
    n_train = train.count()
    assert mix.count() == n_train + n_train_en

    # shard layout: bounded shard ids, deterministic order key, and the
    # parquet round-trip preserves every pack span. The spread check is
    # DETERMINISTIC: recompute the expected shard of every key from the
    # md5 rule shard_assign implements (it is separately oracle-gated)
    # and require the written layout to land on exactly that set — no
    # probabilistic "k keys into n shards" coverage assertion.
    assert shards.filter((F.col("shard") < 0) | (F.col("shard") >= 8)).count() == 0
    recomputed = F.pmod(
        F.conv(F.substring(F.md5(
            F.concat_ws(":", F.col("copy_id").cast("string"),
                        F.col("pack_id").cast("string"), F.lit(""))
        ), 1, 8), 16, 10).cast("long"),
        F.lit(8),
    ).cast("int")
    # every key's shard equals the rule's value - not a coverage guess
    assert shards.filter(F.col("shard") != recomputed).count() == 0
    expected_shards = {
        r["s"] for r in
        shards.select(recomputed.alias("s")).distinct().collect()
    }
    out = str(tmp_path / "train_shards")
    (shards.repartition(8, "shard").sortWithinPartitions("order_key")
     .write.partitionBy("shard").parquet(out))
    back = spark.read.parquet(out)
    assert back.count() == shards.count()
    assert {r["shard"] for r in back.select("shard").distinct().collect()} \
        == expected_shards

    # whole-pipe determinism: a rerun lands on the identical survivor
    # set and shard assignment
    _, _, _, clean2, _, _, _, shards2 = _run_pipe(spark, sf_dir)
    a = {r["doc_id"] for r in clean.select("doc_id").collect()}
    b = {r["doc_id"] for r in clean2.select("doc_id").collect()}
    assert a == b
    sa = {(r["copy_id"], r["pack_id"]): r["shard"] for r in shards.collect()}
    sb = {(r["copy_id"], r["pack_id"]): r["shard"] for r in shards2.collect()}
    assert sa == sb
    uniq.unpersist()
    clean.unpersist()

# ---------------------------------------------------------------------------
# Frozen-artifact deployment: build once, gate every shard incrementally
# ---------------------------------------------------------------------------

def _scan_paths(df):
    """Every file location the executed plan would scan (locations are
    metadata-truncated by default, so raise the cap for the explain)."""
    import re

    conf = df.sparkSession.conf
    key = "spark.sql.maxMetadataStringLength"
    prev = conf.get(key, None)
    conf.set(key, "10000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)
    return set(re.findall(r"file:[^\s\],]+", plan))


def test_frozen_artifact_deployment_end_to_end(spark, sf_dir, tmp_path):
    """The incremental deployment shape, end to end: every artifact the
    curation layer can persist is built on a REFERENCE CORPUS, written
    to disk, and a disjoint NEW SHARD is gated using only the loaded
    artifacts. Pins three things the per-gate tests can't:

    - the artifacts COMPOSE through a disk round-trip (a fresh-session
      shape: nothing from the build phase is reused in-memory);
    - the shard pass does ZERO corpus-wide work — every FileScan in
      every gate's executed plan reads an artifact or the shard itself,
      never the corpus parquet (per-gate union parity vs the one-shot
      operators is pinned in test_pipeline; the exact tier re-proves it
      here against an independent DuckDB oracle on the union);
    - planted duplicates behave deterministically through every tier:
      exact copies are flagged with the corpus canonical, near-dup
      candidates pair them, a copied token run is span-flagged with
      exact coverage, and a genuinely fresh document sails through.
    """
    import duckdb

    from dataclasses import replace

    from prague_spark.pipeline.curate import (
        CurationConfig, build_curation_artifacts, gate_shard,
    )
    from prague_spark.pipeline.quality_model import (
        save_quality_filter, score_quality, train_quality_filter,
    )
    from prague_spark.plan_audit import assert_scale_shape

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("source") != "src1").select(
        "doc_id", "text", "lang"
    )
    base_shard = docs.filter(F.col("source") == "src1").select(
        "doc_id", "text", "lang"
    )
    max_id = int(docs.agg(F.max("doc_id")).first()[0])
    plant_src = (
        corpus.filter(F.size(F.split("text", r"\s+")) >= 12)
        .orderBy("doc_id").limit(2).collect()
    )
    t0, l0 = plant_src[0]["text"], plant_src[0]["lang"]
    t1, l1 = plant_src[1]["text"], plant_src[1]["lang"]
    span_text = " ".join(t0.split()[:8]) + " xqzuniq1 xqzuniq2"
    fresh_text = ("xqzfresh0 xqzfresh1 xqzfresh2 xqzfresh3 "
                  "xqzfresh4 xqzfresh5")
    plants = [
        (max_id + 1, t0, l0),          # exact copy of a corpus doc
        (max_id + 2, t1, l1),          # exact copy of another
        (max_id + 3, span_text, l0),   # leading 8-token run copied
        (max_id + 4, fresh_text, l0),  # genuinely new content
        (max_id + 5, fresh_text, l0),  # ... duplicated WITHIN the shard
    ]
    shard = base_shard.unionByName(
        spark.createDataFrame(plants, "doc_id bigint, text string, lang string")
    )
    shard_path = str(tmp_path / "shard")
    shard.write.parquet(shard_path)

    # ---- build phase: every artifact, from the corpus only, through
    # the composed config-driven recipe (the per-operator calls it wraps
    # are pinned individually in test_pipeline) ----------
    MH = dict(num_hashes=16, shingle_n=1, seed=42, bands=4, rows_per_band=4)
    art = str(tmp_path / "artifacts")
    cfg = CurationConfig(
        tiers=("exact", "minhash", "spans", "cutoffs"),
        minhash=MH, span_k=5, span_min_count=1,
        quality_buckets=3, lang_col="lang", cluster_state=True,
    )
    paths = build_curation_artifacts(corpus, art, "doc_id", "text", cfg)
    assert set(paths) == {"exact", "minhash", "spans", "cutoffs",
                          "cluster_state"}
    p_x = paths["exact"]
    p_q = art + "/qfilter"
    cuts_mem = spark.read.parquet(paths["cutoffs"])
    labeled = corpus.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "good").otherwise("bad").alias("ql"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" lucid cogent lucid")),
        ).otherwise(
            F.concat(F.col("text"), F.lit(" spammy junky spammy")),
        ).alias("text"),
    )
    qf = train_quality_filter(
        labeled, "doc_id", "text", "ql",
        n_features=2**12, n_sigma=4, lambda_min_ratio=0.1,
    )
    save_quality_filter(spark, qf, p_q)
    # expectations computed NOW with the in-memory artifacts, so the
    # deployment pass below must reproduce them from disk alone
    exp_q = {
        r["doc_id"]: r["q_prob"]
        for r in score_quality(shard, qf, "doc_id", "text").collect()
    }
    exp_bucket = {
        r["doc_id"]: r["q_bucket"]
        for r in text.apply_cutoffs(
            text.quality_score(shard, "text"), "q_score", cuts_mem,
            by=["lang"], out="q_bucket",
        ).collect()
    }
    exp_canon = {
        r["text"]: r["canon"]
        for r in corpus.filter(F.col("text").isin(t0, t1))
        .groupBy("text").agg(F.min("doc_id").alias("canon")).collect()
    }

    # ---- deployment phase: loaded artifacts only, one gate call ------
    shard2 = spark.read.parquet(shard_path)
    gates = gate_shard(
        shard2, art, "doc_id", "text",
        replace(cfg, tiers=cfg.tiers + ("quality_filter",)),
    )
    gate_x = gates["exact"]
    pairs = gates["minhash"]
    spans = gates["spans"]
    bucketed = gates["cutoffs"]
    scored = gates["quality_filter"]
    merged_cc = gates["cluster_state"]

    # plan-level zero-corpus-work proof: every scan of every gate reads
    # under tmp_path (an artifact or the shard), never the corpus file
    for df in (gate_x, pairs, spans, bucketed, scored):
        paths = _scan_paths(df)
        assert paths, "no FileScan found — the location regex went stale"
        assert all(str(tmp_path) in p for p in paths), paths
        assert not any("documents.parquet" in p for p in paths), paths
    assert_scale_shape(gate_x, max_py_stages=0)
    assert_scale_shape(pairs, max_py_stages=0)
    assert_scale_shape(spans, max_py_stages=0)
    # frozen cutoffs are a pure broadcast-join projection: NO shuffle
    assert_scale_shape(bucketed, max_shuffles=0, max_py_stages=0)
    assert_scale_shape(scored, max_py_stages=0)

    # exact tier: planted copies resolve to the corpus canonical; the
    # fresh pair resolves within the shard
    xg = {r["doc_id"]: r["dup_of"] for r in gate_x.collect()}
    assert xg[max_id + 1] == exp_canon[t0]
    assert xg[max_id + 2] == exp_canon[t1]
    assert xg[max_id + 4] is None
    assert xg[max_id + 5] == max_id + 4
    # ... and the whole keeper set matches an independent DuckDB oracle
    # of the one-shot rule on (corpus ∪ shard): keep a shard doc iff its
    # content is new AND it is the shard's min id for that content
    want_keep = {
        r[0] for r in duckdb.sql(f"""
            WITH corpus AS (
                SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
                WHERE source <> 'src1'
            ), shard AS (
                SELECT * FROM read_parquet('{shard_path}/*.parquet')
            )
            SELECT s.doc_id FROM shard s
            WHERE md5(s.text) NOT IN (SELECT md5(text) FROM corpus)
              AND s.doc_id = (SELECT min(t.doc_id) FROM shard t
                              WHERE md5(t.text) = md5(s.text))
        """).fetchall()
    }
    assert {d for d, v in xg.items() if v is None} == want_keep

    # near-dup tier: exact copies signature-collide in every band, so
    # their pairs are deterministic; the within-shard pair shows too
    pr = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (plant_src[0]["doc_id"], max_id + 1) in pr
    assert (plant_src[1]["doc_id"], max_id + 2) in pr
    assert (max_id + 4, max_id + 5) in pr
    assert not any(a == b for a, b in pr)

    # span tier: the copied 8-token run is flagged with EXACT coverage
    # (4 k=5 grams -> one merged island over tokens 0..7; the unique
    # suffix stays uncovered), and the fresh doc is never flagged
    sp = {}
    for r in spans.collect():
        sp.setdefault(r["doc_id"], set()).add((r["span_start"], r["span_end"]))
    assert sp[max_id + 3] == {(0, 7)}
    assert max_id + 4 not in sp and max_id + 5 not in sp

    # frozen cutoffs + loaded quality filter replay the in-memory
    # artifacts exactly (identical literals through the parquet trip)
    got_bucket = {r["doc_id"]: r["q_bucket"] for r in bucketed.collect()}
    assert got_bucket == exp_bucket
    assert all(got_bucket[max_id + i] in (1, 2, 3) for i in range(1, 6))
    got_q = {r["doc_id"]: r["q_prob"] for r in scored.collect()}
    assert got_q == exp_q

    # the funnel composes: survivors of all gates keep the fresh keeper
    # and drop every planted duplicate
    flagged_span = {
        d for d, ss in sp.items()
        if any(e - s + 1 >= 8 for s, e in ss)  # mostly-copied docs
    }
    survivors = {
        d for d, v in xg.items()
        if v is None and d not in flagged_span
    }
    assert max_id + 4 in survivors
    assert not {max_id + 1, max_id + 2, max_id + 3, max_id + 5} & survivors

    # cluster state folded forward THROUGH DISK by the gate call: the
    # prior assignment was written as the build's cluster-state
    # artifact, re-loaded (validated) with the other artifacts, and the
    # shard's candidate pairs merged in — every planted exact copy
    # lands in its original's cluster
    lbl = {r["node"]: r["cluster_id"] for r in merged_cc.collect()}
    assert lbl[max_id + 1] == lbl[plant_src[0]["doc_id"]]
    assert lbl[max_id + 2] == lbl[plant_src[1]["doc_id"]]
    assert lbl[max_id + 4] == lbl[max_id + 5]

    # roll the exact index forward with the shard's keepers, then
    # re-gate the SAME shard against the extended index: every doc now
    # resolves to an existing content (idempotent snapshot closure) —
    # keepers re-gated come out as their own canonicals, never dups
    keepers = shard2.join(
        gate_x.filter(F.col("dup_of").isNull()).select("doc_id"),
        "doc_id", "semi",
    )
    p_x2 = str(tmp_path / "content_index_v2")
    dedup.extend_content_index(keepers, p_x, p_x2, "doc_id", "text")
    regate = {
        r["doc_id"]: r["dup_of"]
        for r in dedup.exact_dedup_against(
            shard2, spark.read.parquet(p_x2), "doc_id", "text",
            include_shard_dups=False, unique_index=True,
        ).collect()
    }
    for d, v in xg.items():
        if v is None:
            assert regate[d] is None          # canonical of its content
        else:
            assert regate[d] is not None      # still a known duplicate
