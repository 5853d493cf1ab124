#!/usr/bin/env python
"""A/B: interpreted-HOF band signatures vs one MapInArrow pass, at a
scale where per-row cost dominates planning (the r13 verdict's ask #4
gate: prove the Arrow form wins at ~sf1 volume BEFORE landing it).

Builds an sf1-scale embedding set (10x the sf0.1 fixture = 40k vectors
after the banded entry's perturb-union doubling; plus a 400k variant
for the trend), then times JUST the band-signature projection (the
operator under question) through both forms, and checks BIT-EXACT
equality of every (id, band, bucket) row.

The Arrow form reproduces the HOF's float semantics exactly: the dot is
accumulated left-to-right per element ((acc + v_d * p_d) with each
product and each add rounded once, the aggregate/zip_with order), so
sign decisions — and therefore buckets — are identical bit-for-bit.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BANDS, N_PLANES, SEED = 8, 8, 42


def band_planes(dim: int):
    return [
        np.random.default_rng(SEED + 7919 * k).normal(size=(N_PLANES, dim))
        for k in range(N_BANDS)
    ]


def arrow_sig(df, vec_col, id_col, dim):
    """One MapInArrow pass -> (id, band, bucket) rows, all bands."""
    import pyarrow as pa

    planes = band_planes(dim)

    def fn(it):
        for batch in it:
            ids = batch.column(id_col)
            vs = batch.column(vec_col)
            flat = np.asarray(vs.flatten(), dtype=np.float64)
            V = flat.reshape(-1, dim)
            nb = len(V)
            out_ids, out_band, out_bkt = [], [], []
            for k in range(N_BANDS):
                P = planes[k]
                bucket = np.zeros(nb, dtype=np.int64)
                for i in range(N_PLANES):
                    acc = np.zeros(nb)
                    p = P[i]
                    for d in range(dim):
                        acc += V[:, d] * p[d]
                    bucket += np.where(acc > 0, np.int64(1) << i, 0)
                out_ids.append(ids)
                out_band.append(pa.array(np.full(nb, k, dtype=np.int32)))
                out_bkt.append(pa.array(bucket))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.concat_arrays([a.combine_chunks() if hasattr(a, "combine_chunks") else a for a in out_ids]),
                    pa.concat_arrays(out_band),
                    pa.concat_arrays(out_bkt),
                ],
                names=[id_col, "_band", "_bkt"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        fn, f"{id_col} long, _band int, _bkt long"
    )


def main():
    from pyspark.sql import functions as F

    import prague_spark as ps
    from prague_spark.pipeline.similarity import hyperplane_lsh_buckets

    spark = ps.get_spark("ab_lsh_arrow", cpus=CPUS)
    base = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
        .select("vec_id", "vec")
    )
    for mult, tag in ((10, "sf1"), (100, "sf10")):
        big = base
        for j in range(mult - 1):
            big = big.unionByName(
                base.select(
                    (F.col("vec_id") + (j + 1) * 10_000_000).alias("vec_id"),
                    F.expr(f"transform(vec, x -> x + {0.001 * (j + 1)}d)").alias("vec"),
                )
            )
        big = big.repartition(CPUS).cache()
        n = big.count()

        def hof_form():
            d = big
            for k in range(N_BANDS):
                d = hyperplane_lsh_buckets(
                    d, "vec", n_planes=N_PLANES, seed=SEED + 7919 * k,
                    out=f"_bkt{k}",
                )
            return d.select(
                "vec_id",
                F.posexplode(
                    F.array(*[F.col(f"_bkt{k}") for k in range(N_BANDS)])
                ).alias("_band", "_bkt"),
            )

        def arrow_form():
            return arrow_sig(big, "vec", "vec_id", 64)

        # warmup both (codegen / python worker startup)
        hof_form().write.format("noop").mode("overwrite").save()
        arrow_form().write.format("noop").mode("overwrite").save()
        for name, form in (("hof", hof_form), ("arrow", arrow_form)):
            walls = []
            for _ in range(3):
                t0 = time.monotonic()
                form().write.format("noop").mode("overwrite").save()
                walls.append(round(time.monotonic() - t0, 3))
            print(f"[{tag} n={n}] {name}: {min(walls)}s  {walls}", flush=True)
        if mult == 10:
            a = hof_form().withColumnRenamed("_bkt", "_bkt_h")
            b = arrow_form().withColumnRenamed("_bkt", "_bkt_a")
            j = a.join(b, ["vec_id", "_band"], "full")
            n_tot = j.count()
            n_bad = j.filter(
                F.col("_bkt_h").isNull() | F.col("_bkt_a").isNull()
                | (F.col("_bkt_h") != F.col("_bkt_a"))
            ).count()
            print(f"[{tag}] rows={n_tot} mismatches={n_bad}", flush=True)
        big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
