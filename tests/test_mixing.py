"""Temperature mixture sampling (operators/mixing.py).

Gates: hand-computed rates on a 2-group toy (T=2: 100/25 rows ->
rates 0.5/1.0), exact kept-set equality against a Python md5 twin,
T=1 identity, and partitioning-invariance (hash gating must keep the
same rows under any repartition — the property sample() lacks).
"""

from __future__ import annotations

import hashlib


def _keep(i: int, rate: float, salt: str = "mix") -> bool:
    v = int(hashlib.md5(f"{salt}#{i}".encode()).hexdigest()[:15], 16)
    return v / float(1 << 60) < rate


def _toy(spark):
    rows = [(i, "a" if i < 100 else "b") for i in range(125)]
    return spark.createDataFrame(rows, "doc_id long, grp string")


def test_rates_hand_computed(spark):
    from parser_indexer_py_spark.operators.mixing import temperature_rates

    got = {
        r["grp"]: (r["n"], r["rate"])
        for r in temperature_rates(_toy(spark), "grp", 2.0).collect()
    }
    # w = (10, 5); p = (2/3, 1/3); s = min(150, 75) = 75
    # a: 2/3*75/100 = 0.5   b: 1/3*75/25 = 1.0
    assert got == {"a": (100, 0.5), "b": (25, 1.0)}


def test_kept_set_matches_md5_twin(spark):
    from parser_indexer_py_spark.operators.mixing import temperature_mix

    kept = sorted(
        r["doc_id"]
        for r in temperature_mix(_toy(spark), "grp", 2.0).collect()
    )
    want = sorted(
        i
        for i in range(125)
        if _keep(i, 0.5 if i < 100 else 1.0)
    )
    assert kept == want
    assert len([i for i in kept if i >= 100]) == 25  # group b all kept


def test_t1_is_identity(spark):
    from parser_indexer_py_spark.operators.mixing import (
        temperature_mix,
        temperature_rates,
    )

    rates = {
        r["grp"]: r["rate"]
        for r in temperature_rates(_toy(spark), "grp", 1.0).collect()
    }
    assert rates == {"a": 1.0, "b": 1.0}
    assert temperature_mix(_toy(spark), "grp", 1.0).count() == 125


def test_partitioning_invariance(spark):
    from parser_indexer_py_spark.operators.mixing import temperature_mix

    base = sorted(
        r["doc_id"]
        for r in temperature_mix(_toy(spark), "grp", 2.0).collect()
    )
    repart = sorted(
        r["doc_id"]
        for r in temperature_mix(
            _toy(spark).repartition(7), "grp", 2.0
        ).collect()
    )
    assert base == repart


def test_mix_plan_shape(spark):
    """The keep gate is a broadcast join + scan-side predicate: the big
    side must NOT shuffle (exchanges only under the tiny rate aggregate),
    and the join must be broadcast."""
    from parser_indexer_py_spark.operators.mixing import temperature_mix
    from parser_indexer_py_spark.plans.explain_audit import (
        assert_broadcast_join,
        plan_string,
    )

    df = temperature_mix(_toy(spark), "grp", 2.0)
    assert_broadcast_join(df)
    # no SortMergeJoin anywhere — the corpus side never shuffles for
    # the join itself
    assert "SortMergeJoin" not in plan_string(df)
