"""Replicates the driver's DuckDB-oracle comparison for every query that
declares an oracle: row count, column names, and order-insensitive exact
value equality (the driver hash-matches, so approximate is not enough)."""

import duckdb
import pandas as pd
import pytest

from prague_spark import queries as Q

# slow: runs all 50 registry queries AND their DuckDB oracles — deselect with -m 'not slow' for the
# mid-round loop; the full suite gates commit milestones
pytestmark = pytest.mark.slow

ORACLE_KEYS = sorted(Q.ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in Q.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(name, spark, sf_dir, duck):
    spark_df = Q.QUERIES[name](spark, sf_dir).toPandas()
    duck_df = duck.execute(Q.build_oracles(sf_dir)[name]).fetchdf()

    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs oracle {len(duck_df)}"
    )
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    a, b = _canon(spark_df), _canon(duck_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            import numpy as np

            mism = ~(
                (pd.isna(av) & pd.isna(bv))
                | np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0)
            )
        else:
            mism = av != bv
        n_bad = int(mism.sum())
        assert n_bad == 0, (
            f"{name}.{col}: {n_bad} mismatches; first few: "
            f"{list(zip(av[mism][:5], bv[mism][:5]))}"
        )


SOLVER_KEYS = [k for k in Q.QUERIES if k not in Q.ORACLES]

# Guarded: with full oracle coverage SOLVER_KEYS is empty and an empty
# parametrize would report a permanent (benign but noisy) skip.
if SOLVER_KEYS:

    @pytest.mark.parametrize("name", SOLVER_KEYS)
    def test_rows_only_queries_run(name, spark, sf_dir):
        df = Q.QUERIES[name](spark, sf_dir)
        assert df.count() > 0


def test_every_query_has_an_oracle():
    assert not SOLVER_KEYS, f"queries without oracle SQL: {SOLVER_KEYS}"


def test_registry_is_exactly_fifty():
    """The driver gate checks the FIRST 50 registry positions; hold the
    surface at exactly 50 so nothing silently falls outside the window
    (merges, not appends — see the registry comment block)."""
    assert len(Q.QUERIES) == 50
    assert set(Q.ORACLES) <= set(Q.QUERIES)
