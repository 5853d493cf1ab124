"""Bucketed-design persistence: the co-location contract (no Exchange on
a bucketed equi-join) and end-to-end fit parity from bucketed tables."""

import pytest
from pyspark.sql import functions as F

from prague_spark.io import read_bucketed_design, write_bucketed_design


@pytest.fixture(scope="module")
def bucketed(spark):
    from prague_spark.ops.synth import random_sparse_problem

    trip, ydf, _ = random_sparse_problem(
        spark, n=500, p=40, nnz_per_row=6, seed=11
    )
    write_bucketed_design(trip, ydf, "t_bdesign", n_buckets=4)
    yield read_bucketed_design(spark, "t_bdesign")
    spark.sql("DROP TABLE IF EXISTS t_bdesign_trip")
    spark.sql("DROP TABLE IF EXISTS t_bdesign_y")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    trip, ydf = bucketed
    joined = trip.join(ydf, "row_id").groupBy("col_id").agg(
        F.sum(F.col("value") * F.col("y")).alias("xty")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the row_id equi-join is co-located: the only Exchange left is the
    # groupBy(col_id) aggregation's own
    assert plan.count("Exchange hashpartitioning(row_id") == 0, plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_fit_sparse_from_bucketed_matches_plain(spark, bucketed):
    import numpy as np

    from prague_spark.ops.sparse import fit_sparse
    from prague_spark.ops.synth import random_sparse_problem

    trip_b, ydf_b = bucketed
    trip, ydf, _ = random_sparse_problem(
        spark, n=500, p=40, nnz_per_row=6, seed=11
    )
    kw = dict(n_cols=40, n_sigma=3, lambda_min_ratio=0.3)
    m_plain = fit_sparse(trip, ydf, "y", "gaussian", **kw)
    m_buck = fit_sparse(trip_b, ydf_b, "y", "gaussian", **kw)
    np.testing.assert_allclose(
        np.asarray(m_buck.betas), np.asarray(m_plain.betas), rtol=1e-9
    )
