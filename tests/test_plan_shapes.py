"""PLANS.md as CI: every registry query's physical-plan shape is pinned
against the checked-in baseline (tools/plans_expected.json, the
machine-readable twin of PLANS.md). A change that adds a shuffle, a
Python stage, a nested-loop/cartesian join, or widens a parquet read
fails here BEFORE it lands silently in a regenerated PLANS.md.

Intentional plan changes: regenerate both files with
``python tools/gen_plans.py`` and commit the diff — the point is that
plan-shape changes are REVIEWED, not that they never happen.

Shapes are audited at the same fixed scale gen_plans.py uses (sf0.001;
plan shape is scale-independent, but pinning the directory keeps
widest_read and broadcast decisions identical to the baseline run).
"""

from __future__ import annotations

import json
import os

import pytest

from prague_spark import queries as Q
from prague_spark.plan_audit import audit

_BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "plans_expected.json",
)
_PLAN_SF = "/root/testdata/sf0.001"

with open(_BASELINE_PATH) as _f:
    BASELINE = json.load(_f)

_REGEN = "intentional? regenerate with `python tools/gen_plans.py`"


def test_baseline_covers_registry():
    assert sorted(BASELINE) == sorted(Q.QUERIES), (
        f"plans_expected.json out of sync with the registry — {_REGEN}"
    )


@pytest.fixture(autouse=True)
def _uncached(spark):
    """Audit UNCACHED plans: a `.cache()` left behind by an earlier test
    (or a prior registry query) swaps an InMemoryRelation (full-width) in
    for the pruned parquet scan and falsely trips the widest_read pin
    under full-suite order."""
    spark.catalog.clearCache()
    yield


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_plan_shape_pinned(name, spark):
    exp = BASELINE[name]
    a = audit(Q.QUERIES[name](spark, _PLAN_SF))
    # nested-loop/cartesian joins may never EXCEED the baseline — the
    # only baselined occurrences are deliberate: dedup_embedding's exact
    # all-pairs brute-force path (the documented quadratic baseline the
    # LSH path exists to replace) and the 1-row scalar crossJoin inside
    # the LSH contract oracle
    assert a.nested_loops <= exp["nested_loops"], (
        f"{name}: {a.nested_loops} BroadcastNestedLoopJoin(s), baseline "
        f"{exp['nested_loops']} — a new nested-loop join appeared"
    )
    assert a.cartesians <= exp["cartesians"], (
        f"{name}: {a.cartesians} CartesianProduct(s), baseline "
        f"{exp['cartesians']} — a new cartesian appeared"
    )
    # pinned counters: shuffles and python stages exactly (an improvement
    # must regenerate the baseline too, or PLANS.md goes stale), read
    # width at most (pruning may only improve)
    assert a.shuffles == exp["shuffles"], (
        f"{name}: shuffles {a.shuffles} != baseline {exp['shuffles']} — {_REGEN}"
    )
    assert a.py_stages == exp["py_stages"], (
        f"{name}: py_stages {a.py_stages} != baseline {exp['py_stages']} — {_REGEN}"
    )
    assert a.widest_read <= exp["widest_read"], (
        f"{name}: widest parquet read {a.widest_read} > baseline "
        f"{exp['widest_read']} (lost column pruning) — {_REGEN}"
    )
