#!/usr/bin/env python
"""A/B: bench-input partition counts at sf0.1 (r13 verdict ask #8).

The bench repartitions its cached inputs to CPUS unconditionally; at
sf0.1 that overshards tiny inputs (32 tasks/stage over <1 MB) and is
why the whole suite ran FASTER on 8 cores than 32. This measures a few
representative entries at several partition counts, at 32 cores, so
the replacement derivation (size-based, CPU-capped) is chosen from
numbers instead of theory.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import functions as F

    import prague_spark as ps
    from prague_spark.pipeline import dedup, text as text_ops
    from prague_spark.pipeline.search import (
        bm25_search, build_postings, corpus_stats_from_docs,
    )

    spark = ps.get_spark("ab_partitions", cpus=CPUS)

    def bench_at(nparts: int):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(nparts).cache()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(nparts).cache()
        li.count(), docs.count()

        def w(fn):
            walls = []
            for _ in range(3):
                t0 = time.monotonic()
                fn()
                walls.append(time.monotonic() - t0)
            return round(min(walls), 3)

        out = {
            "dedup_minhash": w(lambda: dedup.minhash_lsh_candidates(
                dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=32),
                "doc_id", bands=8, rows_per_band=4).count()),
            "dedup_simhash": w(lambda: dedup.simhash(docs, "doc_id", "text")
                               .agg(F.sum("simhash")).collect()),
            "text_bm25": w(lambda: bm25_search(
                build_postings(docs, "doc_id", "text"),
                [(0, "table scan merge"), (1, "window sort hash")], k=10,
                n_docs=corpus_stats_from_docs(docs, "text")[0],
                avgdl=corpus_stats_from_docs(docs, "text")[1]).count()),
            "fit_binomial": w(lambda: ps.fit(
                li.withColumn("flag", F.when(F.col("l_returnflag") == "R",
                                             "ret").otherwise("ok")),
                ["l_quantity", "l_discount", "l_tax"], "flag", "binomial",
                n_sigma=5, lambda_min_ratio=0.1)),
            "text_quality": w(lambda: text_ops.quality_score(docs, "text")
                              .agg(F.avg("q_score")).collect()),
            "dedup_exact": w(lambda: dedup.exact_dedup(
                docs, "text", "doc_id").count()),
        }
        li.unpersist(), docs.unpersist()
        return out

    # warm the JVM once at 32
    bench_at(CPUS)
    for nparts in (32, 16, 8, 4, 2, 1):
        r = bench_at(nparts)
        print(f"parts={nparts:2d}  " + "  ".join(
            f"{k}={v}" for k, v in r.items()), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
