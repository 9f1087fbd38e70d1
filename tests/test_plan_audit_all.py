"""Whole-contract plan audit: every queries() entry, two invariants.

1. No per-row Python UDFs anywhere (`BatchEvalPython`): the engine's
   vectorized-only rule enforced by CI instead of by grep — Arrow-batched
   nodes (`ArrowEvalPython`, `MapInPandas`, `FlatMapGroupsInPandas`) are
   the allowed Python surfaces.
2. No `CartesianProduct`: every cross join in the contract broadcasts a
   tiny side (query vector, centroids, rate tables) and must therefore
   plan as `BroadcastNestedLoopJoin`; a CartesianProduct means a
   broadcast hint got lost.

Plans are built at sf0.001 (some queries do bounded driver-side work —
k-means fit, WAND phase 1 — so construction executes small jobs; the
audited artifact is the final plan, never a full execution).
"""

from __future__ import annotations

import importlib.util
import os

SF_DIR = "/root/testdata/sf0.001"


def _entry_module():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry_mod_audit", os.path.join(root, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_every_driver_query_plan_is_clean(spark):
    from parser_indexer_py_spark.plans.explain_audit import plan_string

    bad: dict = {}
    for name, fn in sorted(_entry_module().queries().items()):
        df = fn(spark, SF_DIR)
        p = plan_string(df)
        if "BatchEvalPython" in p:
            bad.setdefault(name, []).append("per-row PythonUDF")
        if "CartesianProduct" in p:
            bad.setdefault(name, []).append("CartesianProduct")
    assert not bad, f"plan violations: {bad}"
