"""Plan-shape pins for the expression-hygiene rule (round-13 sweep).

Catalyst does NOT common-subexpression-eliminate across references to a
free Column object: every Python-side reference embeds (and at runtime
re-evaluates) the whole subtree. The fixes under test let-bind the
expensive array (temp column or single-element ``transform``) so it
appears ONCE in the plan. These pins count tell-tale subtree markers in
the OPTIMIZED plan text — the inlined forms duplicate them (e.g. 32
``md5`` token-hash trees for a 32-lane minhash), so a revert fails loud
without running a single job.
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id int, text string",
    )


def test_stream_minhash_tokenize_once(spark):
    """minhash_signature_expr: ONE md5 token-int tree feeds all lanes.
    The pre-fix form embedded the tokenize+md5 array into each of the
    num_hashes lanes (num_hashes x the row's only expensive work)."""
    from prague_spark.streaming.dedup import minhash_signature_expr

    df = _docs(spark).select(
        minhash_signature_expr(F.col("text"), num_hashes=32).alias("sig")
    )
    plan = _plan(df)
    assert plan.count("md5") == 1, plan.count("md5")
    assert plan.count("split(") == 1, plan.count("split(")
    # the lanes are still there (plan toString truncates wide field
    # lists with "... N more fields", so pin a floor, not the exact 32)
    assert plan.count("array_min") >= 16


def test_winnow_lower_staged_before_gram_lambda(spark):
    """_winnow_stage: lower(text) is staged as the _wtxt column (one
    evaluation per row), not inlined into the per-gram lambda (one
    evaluation per GRAM per row — O(len^2) character copies). The
    double reference (length(_wtxt) + the lambda body) keeps
    CollapseProject from folding the stage away."""
    from prague_spark.pipeline.text import winnow_fingerprint

    out = winnow_fingerprint(_docs(spark), "text")
    plan = _plan(out)
    assert "_wtxt" in plan, "lower(text) staging was inlined away"
    assert plan.count("lower(") == 1
    # the staging columns don't leak into the result
    assert set(out.columns) == {"doc_id", "text", "winnow_fp",
                                "winnow_fp_size"}


def test_ivf_cell_argmax_single_dot_tree(spark):
    """assign_ivf_cells: the K-centroid dot array appears ONCE; the
    argmax (array_position + array_max = two references) runs over the
    let-bound array, not two inlined copies of the K-dot tree."""
    import numpy as np

    from prague_spark.pipeline.similarity import assign_ivf_cells

    K, dim = 8, 4
    cents = np.arange(K * dim, dtype=float).reshape(K, dim) / 10.0
    df = _docs(spark).withColumn(
        "vec", F.array(*[(F.col("doc_id") + i).cast("double")
                         for i in range(dim)])
    )
    plan = _plan(assign_ivf_cells(df, "vec", cents))
    # _dot is an aggregate(zip_with(...)) INSIDE one transform over the
    # centroid-literal array, so it appears once total (the centroids
    # are array data, not per-centroid subtrees); the pre-fix argmax
    # inlined that whole sims tree twice -> 2 aggregates
    assert plan.count("aggregate(") == 1, plan.count("aggregate(")


def test_pq_code_argmax_single_score_tree(spark):
    """assign_pq_codes: per subvector, the K-code score array appears
    once (K dot-aggregates), not twice via an inlined
    array_position(scores, array_max(scores))."""
    import numpy as np

    from prague_spark.pipeline.similarity import assign_pq_codes

    M, K, dsub = 2, 4, 2
    books = (np.arange(M * K * dsub, dtype=float).reshape(M, K, dsub)
             / 10.0)
    df = _docs(spark).withColumn(
        "vec", F.array(*[(F.col("doc_id") + i).cast("double")
                         for i in range(M * dsub)])
    )
    plan = _plan(assign_pq_codes(df, "vec", books, out="pq_code"))
    # one score-transform (one aggregate subtree) per subvector plus
    # the _norm_safe normalization dot; the pre-fix argmax doubled the
    # per-subvector trees to 2M
    assert plan.count("aggregate(") == M + 1, plan.count("aggregate(")


def test_lang_id_tokenize_once(spark):
    """lang_id: one tokenization feeds every per-language hit count and
    the argmax — the pre-fix form re-split the text once per language
    and embedded the hit array twice more in the argmax."""
    from prague_spark.pipeline.text import lang_id

    plan = _plan(lang_id(_docs(spark), "text"))
    assert plan.count("split(") == 1, plan.count("split(")


def test_quality_score_tokenize_once(spark):
    """quality_score: the staged token temp column holds the single
    regexp-split; the six derived ratios reference it, and the temp is
    dropped from the result."""
    from prague_spark.pipeline.text import quality_score

    out = quality_score(_docs(spark), "text")
    plan = _plan(out)
    assert plan.count("split(") == 1, plan.count("split(")
    assert not any(c.endswith("_toks") for c in out.columns)


def test_gopher_flags_tokenize_once(spark):
    """gopher_quality_flags: one tokenization + one 2-gram window feed
    all five rules (the rules reference them ~12x / 3x)."""
    from prague_spark.pipeline.text import gopher_quality_flags

    out = gopher_quality_flags(_docs(spark), "text")
    plan = _plan(out)
    assert plan.count("split(") == 1, plan.count("split(")
    assert not any(c.endswith(("_toks", "_g2")) for c in out.columns)
