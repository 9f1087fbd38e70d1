"""Physical-plan assertions: make "the filter pushed down" and "the join
went broadcast" testable facts instead of hopes.

Used by tests/test_plans.py and by bench sanity checks; grep-level checks on
``explain('formatted')`` output are stable across Spark 3.5/4.x.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    p = plan_string(df)
    assert "PushedFilters" in p, f"no PushedFilters section:\n{p}"
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed; pushed lines: {pushed}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    p = plan_string(df)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, (
        f"no broadcast join in plan:\n{p}"
    )


def assert_take_ordered(df: DataFrame) -> None:
    """orderBy().limit(k) must compile to TakeOrderedAndProject — a
    distributed heap top-k, NOT a global sort."""
    p = plan_string(df)
    assert "TakeOrderedAndProject" in p, f"top-k compiled to a sort:\n{p}"


def assert_column_pruned(df: DataFrame, absent_column: str) -> None:
    """Match the IDENTIFIER boundary in ReadSchema (``<col:`` / ``,col:``):
    raw substring matching would misfire when the name is a substring of a
    kept column (e.g. 'price' inside 'l_extendedprice')."""
    import re

    p = plan_string(df)
    scans = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scans, f"no ReadSchema in plan:\n{p}"
    pat = re.compile(rf"[<,]{re.escape(absent_column)}:")
    assert all(not pat.search(ln) for ln in scans), (
        f"column {absent_column!r} not pruned from scan: {scans}"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT Exchange (shuffle) operators in the physical
    plan — the 'how many shuffles does this cost' fact the scale notes
    claim. AQE's formatted output prints the same Exchange under both
    '== Initial Plan ==' and '== Final Plan ==', so nodes are deduped by
    their Arguments line (two genuinely identical shuffles in one plan
    would collapse too — acceptable for an upper-bound assertion)."""
    lines = plan_string(df).splitlines()
    args = set()
    for i, ln in enumerate(lines):
        t = ln.strip()
        if t.startswith("(") and t.endswith(" Exchange"):
            for fw in lines[i + 1 : i + 6]:
                if fw.strip().startswith("Arguments:"):
                    import re

                    args.add(
                        re.sub(r"\[plan_id=\d+\]", "", fw.strip())
                    )
                    break
            else:
                args.add(t)
    return len(args)


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    got = count_exchanges(df)
    assert got <= n, (
        f"plan has {got} shuffles, claimed <= {n}:\n{plan_string(df)}"
    )


def assert_partial_aggregate(df: DataFrame) -> None:
    """The groupBy must compile to a two-phase hash aggregate
    (partial_* before the shuffle, final after) — the map-side combine
    that keeps the shuffle one-row-per-(partition, key)."""
    p = plan_string(df)
    assert "partial_" in p, f"no partial aggregation phase:\n{p}"
