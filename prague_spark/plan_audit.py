"""Physical-plan scale audit — the ``.explain()`` you can assert on.

Every operator in this engine documents its shuffle/broadcast/codegen
shape; this module makes that shape programmatic so users (and CI) can
audit THEIR compositions the same way ``tools/gen_plans.py`` audits the
query registry: count the exchanges before the job runs at 100 TB, not
after it falls over.

Typical uses::

    from prague_spark.plan_audit import audit, assert_scale_shape

    a = audit(df)                # PlanAudit(shuffles=1, broadcasts=2, ...)
    assert_scale_shape(df, max_shuffles=2, forbid_nested_loop=True)

The counters are string-level over the executed plan (AQE's initial
physical plan), which is exactly what ``df.explain()`` prints — cheap,
driver-side, no job runs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_PY_STAGES = (
    "ArrowEvalPython", "MapInArrow", "MapInPandas",
    "FlatMapGroupsInPandas", "BatchEvalPython",
)


@dataclass(frozen=True)
class PlanAudit:
    """Scale-relevant counts of a DataFrame's physical plan."""

    shuffles: int          # shuffle Exchanges (excl. broadcast)
    broadcasts: int        # BroadcastExchanges
    codegen_spans: int     # distinct WholeStageCodegen regions
    py_stages: int         # Arrow/Pandas/row-Python stages
    nested_loops: int      # BroadcastNestedLoopJoin occurrences
    cartesians: int        # CartesianProduct occurrences
    widest_read: int       # max column count across parquet ReadSchemas
    scans: int             # FileScan/BatchScan leaves
    py_row_stages: int = 0  # row-pickled BatchEvalPython stages ONLY —
    # the form guide §4 forbids at scale; Arrow-batched stages
    # (MapInArrow/ArrowEvalPython) count in py_stages but not here


def audit(df: DataFrame) -> PlanAudit:
    """Inspect ``df``'s physical plan without running it."""
    # ReadSchema strings are TRUNCATED at spark.sql.maxMetadataStringLength
    # (default 100 chars) — a cut-off schema makes widest_read misparse
    # (e.g. two truncated scans bleed together under re.S). Raise it for
    # the explain call, restore after.
    conf = df.sparkSession.conf
    key = "spark.sql.maxMetadataStringLength"
    prev = conf.get(key, None)
    conf.set(key, "10000")
    try:
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        full = qe.toString()
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)
    phys = full[full.find("== Physical Plan ==") :]
    widest = 0
    for m in re.finditer(r"ReadSchema: struct<(.*?)>(?=\s)", phys, re.S):
        widest = max(widest, len(re.split(r",(?=\w+:)", m.group(1))))
    return PlanAudit(
        shuffles=plan.count("Exchange") - plan.count("BroadcastExchange"),
        broadcasts=plan.count("BroadcastExchange"),
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", plan))),
        py_stages=sum(plan.count(p) for p in _PY_STAGES),
        nested_loops=plan.count("BroadcastNestedLoopJoin"),
        cartesians=plan.count("CartesianProduct"),
        widest_read=widest,
        scans=plan.count("FileScan") + plan.count("BatchScan"),
        py_row_stages=plan.count("BatchEvalPython"),
    )


def assert_scale_shape(
    df: DataFrame,
    max_shuffles: int | None = None,
    max_py_stages: int | None = None,
    max_read_width: int | None = None,
    forbid_nested_loop: bool = True,
    forbid_cartesian: bool = True,
    max_py_row_stages: int | None = None,
) -> PlanAudit:
    """Raise ``AssertionError`` (with the offending counts) when the plan
    violates the declared scale budget; returns the audit otherwise.
    Put this in tests next to the correctness assertions — a query that
    silently picks up a second shuffle or a nested-loop join fails CI
    before it fails the cluster."""
    a = audit(df)
    problems = []
    if max_shuffles is not None and a.shuffles > max_shuffles:
        problems.append(f"shuffles {a.shuffles} > {max_shuffles}")
    if max_py_stages is not None and a.py_stages > max_py_stages:
        problems.append(f"py_stages {a.py_stages} > {max_py_stages}")
    if max_py_row_stages is not None and a.py_row_stages > max_py_row_stages:
        problems.append(
            f"py_row_stages {a.py_row_stages} > {max_py_row_stages}"
        )
    if max_read_width is not None and a.widest_read > max_read_width:
        problems.append(f"widest_read {a.widest_read} > {max_read_width}")
    if forbid_nested_loop and a.nested_loops:
        problems.append(f"{a.nested_loops} BroadcastNestedLoopJoin(s)")
    if forbid_cartesian and a.cartesians:
        problems.append(f"{a.cartesians} CartesianProduct(s)")
    if problems:
        raise AssertionError(
            "plan violates scale budget: " + "; ".join(problems)
        )
    return a
