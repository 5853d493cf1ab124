"""Generate PLANS.md: physical-plan audit of every registry query
(thin wrapper over prague_spark.plan_audit — the public API users run
on their own compositions)."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import prague_spark as ps
from prague_spark import queries as Q
from prague_spark.plan_audit import audit

spark = ps.get_spark("plans", cpus=8)
spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
SF = "/root/testdata/sf0.001"

rows = []
expected = {}
for name in sorted(Q.QUERIES):
    try:
        # uncached plans only — a prior query's .cache() would swap an
        # InMemoryRelation in for the pruned scan (mirrors the per-test
        # clearCache in tests/test_plan_shapes.py)
        spark.catalog.clearCache()
        a = audit(Q.QUERIES[name](spark, SF))
        rows.append(
            (name, a.shuffles, a.broadcasts, a.codegen_spans,
             a.py_stages, a.widest_read)
        )
        expected[name] = {
            "shuffles": a.shuffles, "broadcasts": a.broadcasts,
            "codegen_spans": a.codegen_spans, "py_stages": a.py_stages,
            "widest_read": a.widest_read, "nested_loops": a.nested_loops,
            "cartesians": a.cartesians,
        }
    except Exception as e:
        rows.append((name, "-", "-", "-", "-", f"err: {str(e)[:40]}"))

with open(REPO / "PLANS.md", "w") as f:
    f.write("""# PLANS — physical-plan audit of the query registry

Generated against sf0.001 (`python tools/gen_plans.py`; plan *shape* is
scale-independent). Columns: shuffle Exchanges (excl. broadcast),
BroadcastExchanges, WholeStageCodegen spans, Arrow/Pandas python stages,
and the widest parquet ReadSchema the query touches (column-pruning
check — lineitem has 16 columns, documents 3, events 6).

The same counters are a public API — ``prague_spark.plan_audit.audit``
/ ``assert_scale_shape`` — so user compositions can enforce their own
shuffle/py-stage/nested-loop budgets in CI.

Driver-side fit/CV queries show the *final output* plan; their data-plane
passes (Gram / gradient / Hessian aggregations) are, for small p*m, ONE
whole-stage-codegen SQL aggregate per solver evaluation (SparkGlmDesign's
JVM route — no Python workers in the scan) and, for wide designs,
mapInArrow partial aggregations over a cached projection — by
construction one scan each either way.

| query | shuffles | broadcasts | codegen spans | py stages | widest read |
|---|---|---|---|---|---|
""")
    for r in rows:
        f.write("| " + " | ".join(str(x) for x in r) + " |\n")

# machine-readable twin of the table: the CI baseline
# (tests/test_plan_shapes.py fails on any drift from it)
import json

with open(REPO / "tools" / "plans_expected.json", "w") as f:
    json.dump(expected, f, indent=1, sort_keys=True)
print("done", len(rows))
